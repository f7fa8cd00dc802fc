"""Bipartite projections.

Reference semantics — networkx/algorithms/bipartite/projection.py:

* ``projected_graph`` (:12-100): given a bipartite graph and one node
  set U, connect u1, u2 in U iff they share a neighbor on the other
  side.
* ``weighted_projected_graph`` (:120-200): edge weight = number of
  shared neighbors (``ratio=False``); ``ratio=True`` divides by the
  size of the opposite node set.

Physical plan: the projection is ONE self-equi-join of the membership
table on the opposite-side key (u1 < u2 to emit each pair once) plus a
groupBy count — the same wedge shape as common_neighbors. Skew lives
in popular opposite-side keys (a hub document shared by many); AQE
skew-join splitting covers it, and the canonical mitigation at 100 TB
(drop opposite-side keys with degree above a cap before the join) is a
single pre-filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def weighted_projected_graph(
    membership: DataFrame,
    u_col: str,
    v_col: str,
    ratio: bool = False,
) -> DataFrame:
    """Project a bipartite membership table (u side = ``u_col``,
    opposite side = ``v_col``) onto the u side:
    (u1 BIGINT, u2 BIGINT, weight DOUBLE) with u1 < u2.

    ``ratio=True`` scales by 1/|distinct v| (projection.py:185).
    """
    m = membership.select(
        F.col(u_col).alias("u"), F.col(v_col).alias("v")
    ).distinct()
    a = m.select(F.col("u").alias("u1"), "v")
    b = m.select(F.col("u").alias("u2"), "v")
    pairs = (
        a.join(b, "v")
        .where(F.col("u1") < F.col("u2"))
        .groupBy("u1", "u2")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )
    if ratio:
        nv = m.select("v").distinct().count()
        pairs = pairs.withColumn("weight", F.col("weight") / F.lit(float(nv)))
    return pairs


def projected_graph(membership: DataFrame, u_col: str, v_col: str) -> DataFrame:
    """Unweighted projection (projection.py:12): (u1, u2), u1 < u2."""
    return weighted_projected_graph(membership, u_col, v_col).select("u1", "u2")


def bipartite_color(graph: "LinkGraph") -> DataFrame:
    """(id BIGINT, color INT ∈ {0,1}) — a proper 2-coloring attempt by
    BFS parity from one root (min id) per connected component
    (networkx/algorithms/bipartite/basic.py ``color``; the reference's
    queue BFS assigns 1/0 alternating — any proper 2-coloring is
    equivalent up to a per-component swap, tests compare partition
    structure). If the graph is NOT bipartite the returned coloring
    has at least one monochromatic edge — callers check via
    ``is_bipartite``.

    Plan: one connected_components pass (pointer-jumping / CSR gather),
    one min-per-component aggregate for the roots, one multi-source
    BFS (O(diameter) frontier joins) — all existing substrates, no new
    shuffle shapes."""
    from .components import connected_components
    from .traversal import bfs_layers

    comp = connected_components(graph)
    roots = comp.groupBy("component").agg(F.min("id").alias("id")).select("id")
    layers = bfs_layers(graph, roots, directed=False)
    return layers.select(
        "id", (F.col("layer") % 2).cast("int").alias("color")
    )


def is_bipartite(graph: "LinkGraph") -> bool:
    """True iff the graph admits a proper 2-coloring
    (networkx/algorithms/bipartite/basic.py:9 ``is_bipartite``) —
    BFS-parity coloring plus one conflict scan (edges whose endpoints
    share a color; self-loops conflict by definition)."""
    color = bipartite_color(graph).persist()
    try:
        e = graph.edges.select("src", "dst")
        conflicts = (
            e.join(
                color.select(F.col("id").alias("src"), F.col("color").alias("cs")),
                "src",
            )
            .join(
                color.select(F.col("id").alias("dst"), F.col("color").alias("cd")),
                "dst",
            )
            .where(F.col("cs") == F.col("cd"))
            .limit(1)
            .count()
        )
        return conflicts == 0
    finally:
        color.unpersist()


def bipartite_sets(graph: "LinkGraph") -> DataFrame:
    """(id, color) for a CONNECTED bipartite graph — the reference's
    ``bipartite_sets`` raises on disconnected or non-bipartite input
    (basic.py:59 via is_connected check); mirrored here."""
    from .components import connected_components

    ncomp = (
        connected_components(graph).agg(F.countDistinct("component")).first()[0]
    )
    if ncomp != 1:
        raise ValueError(
            "bipartite_sets requires a connected graph "
            "(reference parity: bipartite/basic.py sets())"
        )
    if not is_bipartite(graph):
        raise ValueError("graph is not bipartite")
    return bipartite_color(graph)
