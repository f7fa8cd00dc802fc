"""Graph minors: quotient (block) graphs.

Reference semantics — ``quotient_graph``
(networkx/algorithms/minors/contraction.py:60-250): given a partition
of the nodes, the quotient has one node per block and an edge between
two blocks iff some member edge crosses them (default
``edge_relation``); the engine's aggregated form also carries the
cross-edge count/weight sum, which the reference exposes through
``edge_data``/multigraph variants.

The web-scale instance is host/domain contraction: collapse a
url-level link graph to a host graph. One projection join per
endpoint + one groupBy — no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def quotient_graph(
    graph: LinkGraph,
    partition: DataFrame,
    self_loops: bool = False,
) -> LinkGraph:
    """Contract ``graph`` along ``partition(id, block)``.

    Returns a LinkGraph whose vertices are the distinct blocks and
    whose edges are (block_src, block_dst, weight = Σ member edge
    weights). Member edges with an endpoint absent from ``partition``
    are dropped (semi-join semantics, matching every other operator's
    handling of out-of-vertex-set endpoints). ``self_loops=False``
    (the reference default) drops intra-block edges.
    """
    p = partition.select(F.col("id"), F.col("block"))
    e = (
        graph.weighted_edges()
        .join(
            p.select(F.col("id").alias("src"), F.col("block").alias("bsrc")),
            "src",
        )
        .join(
            p.select(F.col("id").alias("dst"), F.col("block").alias("bdst")),
            "dst",
        )
    )
    if not self_loops:
        e = e.where(F.col("bsrc") != F.col("bdst"))
    edges = (
        e.groupBy(F.col("bsrc").alias("src"), F.col("bdst").alias("dst"))
        .agg(F.sum("weight").alias("weight"))
    )
    vertices = p.select(F.col("block").alias("id")).distinct()
    return LinkGraph(vertices=vertices, edges=edges, directed=graph.directed)


def host_graph(pages_graph: LinkGraph) -> LinkGraph:
    """Domain-level quotient of a url-level graph: block =
    ``parse_url(url, 'HOST')`` over the vertex table's url column —
    the canonical Common-Crawl rollup."""
    part = pages_graph.vertices.select(
        "id", F.parse_url(F.col("url"), F.lit("HOST")).alias("block")
    )
    return quotient_graph(pages_graph, part)


def moral_graph_edges(graph: LinkGraph) -> DataFrame:
    """(src, dst) canonical undirected edge set of the moralized
    digraph (reference networkx/algorithms/moral.py ``moral_graph``):
    every directed edge undirected PLUS an edge between every pair of
    parents sharing a child ("marrying" the parents). One self-join
    of the edge table on the child + a canonical union-distinct."""
    e = graph.edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    married = (
        e.alias("x")
        .join(e.alias("y"), F.col("x.dst") == F.col("y.dst"))
        .where(F.col("x.src") < F.col("y.src"))
        .select(F.col("x.src").alias("src"), F.col("y.src").alias("dst"))
    )
    canon = e.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    )
    return canon.unionByName(married).distinct()
