"""Node and edge boundaries between vertex sets.

Parity targets: ``edge_boundary`` / ``node_boundary``
(networkx/algorithms/boundary.py:25,122). Both are pure semi/anti
join compositions — no iteration, one shuffle each, broadcastable
when the node sets are small (Catalyst picks it from the set size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def _ids(nbunch: DataFrame) -> DataFrame:
    return nbunch.select("id").distinct()


def edge_boundary(
    graph: LinkGraph, nbunch1: DataFrame, nbunch2: DataFrame | None = None
) -> DataFrame:
    """Edges with one endpoint in ``nbunch1`` and the other outside it
    (or in ``nbunch2`` when given) — networkx/algorithms/boundary.py:25.

    Directed graphs report only S→T edges (reference iterates
    ``G.edges(nbunch1)`` = out-edges); undirected graphs report each
    boundary edge once, oriented from the nbunch1 endpoint.
    """
    s = _ids(nbunch1)
    e = graph.edges.select("src", "dst")
    if not graph.directed:
        e = e.unionByName(
            e.where(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        ).distinct()
    out = e.join(s.withColumnRenamed("id", "src"), "src", "left_semi")
    if nbunch2 is None:
        out = out.join(s.withColumnRenamed("id", "dst"), "dst", "left_anti")
    else:
        t = _ids(nbunch2)
        out = out.join(t.withColumnRenamed("id", "dst"), "dst", "left_semi")
    if not graph.directed:
        # each undirected boundary edge once: drop the T→S duplicate
        # when both endpoints qualify on both sides (only possible if
        # nbunch1/nbunch2 overlap — reference keeps one per edge)
        out = out.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        ).distinct()
        # re-orient from the nbunch1 endpoint for a stable output shape
        out = (
            out.join(s.withColumnRenamed("id", "a"), "a", "left_semi")
            .select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .unionByName(
                out.join(s.withColumnRenamed("id", "a"), "a", "left_anti").select(
                    F.col("b").alias("src"), F.col("a").alias("dst")
                )
            )
        )
    return out


def node_boundary(
    graph: LinkGraph, nbunch1: DataFrame, nbunch2: DataFrame | None = None
) -> DataFrame:
    """Nodes outside ``nbunch1`` adjacent to some node in it,
    restricted to ``nbunch2`` when given
    (networkx/algorithms/boundary.py:122). Directed graphs follow
    successors only (reference uses ``G[v]``)."""
    s = _ids(nbunch1)
    e = graph.edges.select("src", "dst")
    if not graph.directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    nbrs = (
        e.join(s.withColumnRenamed("id", "src"), "src", "left_semi")
        .select(F.col("dst").alias("id"))
        .distinct()
        .join(s, "id", "left_anti")
    )
    if nbunch2 is not None:
        nbrs = nbrs.join(_ids(nbunch2), "id", "left_semi")
    return nbrs
