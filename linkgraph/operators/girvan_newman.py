"""Girvan–Newman divisive community detection.

Reference: ``nx.community.girvan_newman``
(networkx/algorithms/community/centrality.py:10): repeatedly remove
the highest-edge-betweenness edge, recomputing betweenness after every
removal, until the number of connected components increases; each
increase yields one level of the dendrogram.

Distributed shape: the removal loop is inherently sequential (that is
the algorithm's definition — betweenness must be recomputed on the
edge-deleted graph), so the driver iterates; each iteration is one
batched multi-source Brandes sweep (`edge_betweenness_centrality` —
O(diameter) jobs for ALL sources at once) + one top-1 + one CC pass.
Cost per level is O(#removals-to-split) sweeps; at web scale the
standard practice is sampled sources (``k``), which plugs straight
through. Tie-break: highest betweenness, then smallest (src, dst) —
deterministic where the reference's dict-order ``max`` is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from .centrality import edge_betweenness_centrality
from .components import connected_components


def girvan_newman_level(
    graph: LinkGraph,
    levels: int = 1,
    k: int | None = None,
    max_removals: int = 1000,
) -> DataFrame:
    """(id, community) — the partition after ``levels`` component-count
    increases (community = min member id). ``k`` samples Brandes
    sources for the at-scale approximation (None = exact)."""
    ep = (
        graph.edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .where(F.col("src") < F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    verts = graph.vertices.select("id")

    def comps(e: DataFrame) -> DataFrame:
        g = LinkGraph(
            vertices=verts,
            edges=e.withColumn("weight", F.lit(1.0)),
            directed=False,
        )
        return connected_components(g)

    cc = comps(ep).persist()
    n_comp = cc.agg(F.countDistinct("component")).first()[0]
    target = n_comp + levels
    for _ in range(max_removals):
        if n_comp >= target:
            break
        g = LinkGraph(
            vertices=verts,
            edges=ep.withColumn("weight", F.lit(1.0)),
            directed=False,
        )
        eb = edge_betweenness_centrality(g, k=k, normalized=False)
        top = (
            eb.orderBy(F.col("betweenness").desc(), F.col("src"), F.col("dst"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        ep = ep.where(
            ~((F.col("src") == top[0]["src"]) & (F.col("dst") == top[0]["dst"]))
        ).localCheckpoint(eager=True)
        cc.unpersist()
        cc = comps(ep).persist()
        n_comp = cc.agg(F.countDistinct("component")).first()[0]
    return cc
