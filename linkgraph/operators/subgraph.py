"""Subgraph views — lazy, join-based, never copying.

Parity: ``subgraph``/``induced_subgraph`` (networkx/classes/graph.py
:1794, function.py:343,366), ``edge_subgraph`` (graph.py:1878,
function.py:412), ``subgraph_view(filter_node, filter_edge)``
(graphviews.py:136, filters.py:21-95), ``restricted_view``
(function.py:471).  The reference wraps dicts in FilterAtlas views;
here every form is an unmaterialized DataFrame lineage — semi/anti
joins that Catalyst pushes into the scans, broadcast when the node
list is small.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def _node_df(g: LinkGraph, nodes) -> DataFrame:
    if isinstance(nodes, DataFrame):
        return nodes.select(F.col(nodes.columns[0]).alias("id")).distinct()
    return g.spark.createDataFrame(
        [(int(n),) for n in nodes], "id long"
    ).distinct()


def induced_subgraph(g: LinkGraph, nodes: Iterable | DataFrame) -> LinkGraph:
    """Subgraph on a node set: both endpoints must survive."""
    keep = _node_df(g, nodes)
    e = (
        g.edges.join(
            F.broadcast(keep.withColumnRenamed("id", "src")), "src", "left_semi"
        ).join(
            F.broadcast(keep.withColumnRenamed("id", "dst")), "dst", "left_semi"
        )
    )
    v = g.vertices.join(keep, "id", "left_semi")
    return replace(g, vertices=v, edges=e)


def edge_subgraph(g: LinkGraph, edge_pairs: Iterable | DataFrame) -> LinkGraph:
    """Subgraph of the given edges + their incident nodes
    (graph.py:1878)."""
    if isinstance(edge_pairs, DataFrame):
        keys = edge_pairs.select(
            F.col(edge_pairs.columns[0]).alias("src"),
            F.col(edge_pairs.columns[1]).alias("dst"),
        ).distinct()
    else:
        keys = g.spark.createDataFrame(
            [(int(a), int(b)) for a, b in edge_pairs], "src long, dst long"
        ).distinct()
    e = g.edges.join(keys, ["src", "dst"], "left_semi")
    ends = e.select(F.col("src").alias("id")).unionByName(
        e.select(F.col("dst").alias("id"))
    ).distinct()
    return replace(g, vertices=g.vertices.join(ends, "id", "left_semi"), edges=e)


def subgraph_view(
    g: LinkGraph,
    filter_node: Column | None = None,
    filter_edge: Column | None = None,
) -> LinkGraph:
    """Predicate-filtered lazy view (graphviews.py:136). ``filter_node``
    is a Column over the vertices table; edges keep only rows whose
    both endpoints survive the node filter AND satisfy filter_edge."""
    v = g.vertices.filter(filter_node) if filter_node is not None else g.vertices
    e = g.edges.filter(filter_edge) if filter_edge is not None else g.edges
    if filter_node is not None:
        keep = v.select("id")
        e = e.join(keep.withColumnRenamed("id", "src"), "src", "left_semi").join(
            keep.withColumnRenamed("id", "dst"), "dst", "left_semi"
        )
    return replace(g, vertices=v, edges=e)


def restricted_view(
    g: LinkGraph, hide_nodes: Iterable | DataFrame = (), hide_edges: Iterable = ()
) -> LinkGraph:
    """Hide node/edge sets (function.py:471) — anti-joins."""
    v, e = g.vertices, g.edges
    hn = _node_df(g, hide_nodes)
    if hide_nodes is not None:
        v = v.join(hn, "id", "left_anti")
        e = e.join(hn.withColumnRenamed("id", "src"), "src", "left_anti").join(
            hn.withColumnRenamed("id", "dst"), "dst", "left_anti"
        )
    if hide_edges:
        he = g.spark.createDataFrame(
            [(int(a), int(b)) for a, b in hide_edges], "src long, dst long"
        )
        e = e.join(he, ["src", "dst"], "left_anti")
    return replace(g, vertices=v, edges=e)
