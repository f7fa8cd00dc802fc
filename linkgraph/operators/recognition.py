"""Graph recognition predicates: tree / forest / Eulerian.

Reference semantics: ``nx.is_tree`` / ``nx.is_forest``
(networkx/algorithms/tree/recognition.py:74,147) and
``nx.is_eulerian`` / ``nx.has_eulerian_path``
(networkx/algorithms/euler.py:17,328). The reference walks the
dict-of-dicts; here every predicate reduces to scalar aggregates over
the edge table plus one connected-components (or SCC) pass — no
traversal:

  tree    <=> connected and  m == n - 1
  forest  <=> m == n - n_components  (acyclic)
  eulerian (undirected) <=> connected and every degree even
  eulerian (directed)   <=> strongly connected and in == out degree
  eulerian path: the 0-or-2-odd-vertices (undirected) / at-most-one
  unit imbalance each way + weak connectivity (directed) relaxations.

Connectivity is over the FULL vertex set — isolated vertices make
every Eulerian predicate False, exactly as the reference documents.
Multigraph rows count as parallel edges; a self-loop contributes 2 to
undirected degree (both matching nx).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..graph import LinkGraph
from .components import connected_components


def _n_components(graph: LinkGraph) -> int:
    return (
        connected_components(graph).agg(F.countDistinct("component")).first()[0]
    )


def is_forest(graph: LinkGraph) -> bool:
    """No undirected cycles: m == n - #components (recognition.py:215
    reduces directed input to the underlying undirected graph of each
    weak component — the same formula)."""
    n, m = graph.vertices.count(), graph.edges.count()
    if n == 0:
        raise ValueError("null graph has no forest classification")
    return m == n - _n_components(graph)


def is_tree(graph: LinkGraph) -> bool:
    """Connected and m == n - 1 (recognition.py:141-143)."""
    n, m = graph.vertices.count(), graph.edges.count()
    if n == 0:
        raise ValueError("null graph has no tree classification")
    return m == n - 1 and _n_components(graph) == 1


def _inout_degrees(graph: LinkGraph):
    return (
        graph.edges.select(
            F.col("src").alias("id"), F.lit(1).alias("o"), F.lit(0).alias("i")
        )
        .unionByName(
            graph.edges.select(
                F.col("dst").alias("id"), F.lit(0).alias("o"), F.lit(1).alias("i")
            )
        )
        .groupBy("id")
        .agg(F.sum("o").alias("outd"), F.sum("i").alias("ind"))
    )


def _undirected_degrees(graph: LinkGraph):
    ends = graph.edges.select(F.col("src").alias("id")).unionByName(
        graph.edges.select(F.col("dst").alias("id"))
    )
    return ends.groupBy("id").agg(F.count(F.lit(1)).alias("d"))


def is_eulerian(graph: LinkGraph) -> bool:
    """Closed Euler circuit exists (euler.py:17)."""
    if graph.directed:
        from .strongly_connected import strongly_connected_components

        deg = _inout_degrees(graph)
        if deg.where(F.col("outd") != F.col("ind")).limit(1).count() > 0:
            return False
        return (
            strongly_connected_components(graph)
            .agg(F.countDistinct("component"))
            .first()[0]
            == 1
        )
    deg = _undirected_degrees(graph)
    if deg.where(F.col("d") % 2 != 0).limit(1).count() > 0:
        return False
    return _n_components(graph) == 1


def has_eulerian_path(graph: LinkGraph) -> bool:
    """Open-or-closed Euler path exists (euler.py:328)."""
    if is_eulerian(graph):
        return True
    if graph.directed:
        imb = (
            _inout_degrees(graph)
            .select(
                F.sum(
                    F.when(F.col("outd") - F.col("ind") == 1, 1).otherwise(0)
                ).alias("plus"),
                F.sum(
                    F.when(F.col("ind") - F.col("outd") == 1, 1).otherwise(0)
                ).alias("minus"),
                F.sum(
                    F.when(F.abs(F.col("outd") - F.col("ind")) > 1, 1).otherwise(0)
                ).alias("bad"),
            )
            .first()
        )
        if imb["bad"] > 0 or imb["plus"] > 1 or imb["minus"] > 1:
            return False
        return _n_components(graph) == 1  # weak connectivity, full graph
    n_odd = _undirected_degrees(graph).where(F.col("d") % 2 != 0).count()
    if n_odd != 2:  # n_odd == 0 was the is_eulerian branch
        return False
    return _n_components(graph) == 1
