"""Degree views and whole-graph scalar aggregates.

Parity targets: ``DegreeView`` (networkx/classes/reportviews.py:478,
self-loop counts twice per :522-529; in/out views :569,:546),
``degree_histogram`` (networkx/classes/function.py:141), ``density``
(function.py:106), ``isolates`` (networkx/algorithms/isolate.py),
``selfloop_edges`` / ``number_of_selfloops`` (function.py:1258,1361).

All are single groupBy aggregations (map-side partial agg for free)
or anti-joins; nothing iterative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def out_degrees(g: LinkGraph, weighted: bool = False) -> DataFrame:
    """(id, degree DOUBLE) including zero rows for sink vertices."""
    return g.out_degrees(weighted=weighted)


def in_degrees(g: LinkGraph, weighted: bool = False) -> DataFrame:
    return g.reverse().out_degrees(weighted=weighted)


def degrees(g: LinkGraph, weighted: bool = False) -> DataFrame:
    """Undirected-view degree; a self-loop counts twice
    (reportviews.py:522-529). For directed graphs this is in+out."""
    we = g.weighted_edges()
    val = F.col("weight") if weighted else F.lit(1.0)
    ends = we.select(F.col("src").alias("id"), val.alias("d")).unionByName(
        we.select(F.col("dst").alias("id"), val.alias("d"))
    )
    agg = ends.groupBy("id").agg(F.sum("d").alias("degree"))
    return (
        g.vertices.select("id")
        .join(agg, "id", "left")
        .select("id", F.coalesce("degree", F.lit(0.0)).alias("degree"))
    )


def degree_histogram(g: LinkGraph) -> DataFrame:
    """(degree BIGINT, num_nodes BIGINT) — function.py:141."""
    return (
        degrees(g)
        .select(F.col("degree").cast("long").alias("degree"))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("num_nodes"))
    )


def density(g: LinkGraph) -> float:
    """m/(n(n-1)) directed, 2m/(n(n-1)) undirected (function.py:106)."""
    n = g.vertices.count()
    if n <= 1:
        return 0.0
    m = g.edges.count()
    d = m / (n * (n - 1))
    return d if g.directed else 2.0 * d


def isolates(g: LinkGraph) -> DataFrame:
    """Vertices with no incident edges (networkx/algorithms/isolate.py)."""
    ends = g.edges.select(F.col("src").alias("id")).unionByName(
        g.edges.select(F.col("dst").alias("id"))
    )
    return g.vertices.select("id").join(ends, "id", "left_anti")


def selfloop_edges(g: LinkGraph) -> DataFrame:
    return g.edges.where(F.col("src") == F.col("dst"))


def number_of_selfloops(g: LinkGraph) -> int:
    return selfloop_edges(g).count()


def is_regular(graph: LinkGraph) -> bool:
    """function.py ``is_regular``: every node has the same degree
    (directed: same in-degree AND same out-degree). One degree
    aggregate + countDistinct."""
    if graph.num_vertices() == 0:
        raise ValueError("regularity is undefined for the null graph")
    if graph.directed:
        for side in ("src", "dst"):
            d = (
                graph.vertices.select("id")
                .join(
                    graph.edges.groupBy(F.col(side).alias("id")).agg(
                        F.count(F.lit(1)).alias("d")
                    ),
                    "id",
                    "left",
                )
                .select(F.coalesce("d", F.lit(0)).alias("d"))
            )
            if d.agg(F.countDistinct("d")).first()[0] != 1:
                return False
        return True
    sym = graph.symmetrized_edges().select("src", "dst").distinct()
    d = (
        graph.vertices.select("id")
        .join(
            sym.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("d")),
            "id",
            "left",
        )
        .select(F.coalesce("d", F.lit(0)).alias("d"))
    )
    return d.agg(F.countDistinct("d")).first()[0] == 1


def is_k_regular(graph: LinkGraph, k: int) -> bool:
    """function.py ``is_k_regular`` (undirected): every degree == k."""
    if graph.directed:
        raise ValueError("is_k_regular is defined for undirected graphs")
    sym = graph.symmetrized_edges().select("src", "dst").distinct()
    d = (
        graph.vertices.select("id")
        .join(
            sym.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("d")),
            "id",
            "left",
        )
        .select(F.coalesce("d", F.lit(0)).alias("d"))
    )
    bad = d.where(F.col("d") != k).limit(1).count()
    return bad == 0
