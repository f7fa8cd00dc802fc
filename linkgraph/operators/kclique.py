"""Clique-percolation communities (Palla et al. 2005) for k ≤ 3.

Reference: networkx/algorithms/community/kclique.py
``k_clique_communities`` — communities are the connected components
of the clique-percolation graph (k-cliques adjacent when they share
k−1 nodes), each community reported as the union of its cliques'
nodes; communities may OVERLAP (a node can appear in several).

k = 3 is the distributed-feasible instance: the cliques are the
triangle table (operators/triangles.py all_triangles — oriented wedge
join, O(m^1.5)), and two triangles are adjacent iff they share an
edge. The percolation components are computed WITHOUT materializing
the triangle-adjacency graph (which has Σ per-edge-triangle-count²
edges and explodes on dense corpora): min-label propagation runs over
the bipartite triangle↔edge incidence instead — each round is one
groupBy(edge) min + one groupBy(triangle) min, both map-side partial
aggregated, state O(3·#triangles). Rounds = percolation-graph
diameter, the same adaptive isEmpty loop as connected_components.

k = 2 degenerates to connected components over non-isolated nodes
(edges sharing one endpoint percolate), delegated to
``connected_components``. k ≥ 4 needs distributed k-clique
enumeration and is out of scope ([wontfix], documented).

Community labels are deterministic: the lexicographically smallest
member triangle (a, b, c). Output is the flat overlapping-membership
table (ca, cb, cc, id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.loop import stable_checkpoint
from .triangles import all_triangles


def k_clique_communities(
    graph: LinkGraph, k: int = 3, max_rounds: int = 64
) -> DataFrame:
    if k == 2:
        from .components import connected_components

        deg = graph.symmetrized_edges().select(F.col("src").alias("id")).distinct()
        cc = connected_components(graph)
        return (
            cc.join(deg, "id", "left_semi")
            .select(F.col("component").alias("community"), "id")
        )
    if k != 3:
        raise ValueError(
            "k_clique_communities: only k=2 and k=3 are supported "
            "(k>=4 requires distributed k-clique enumeration, wontfix)"
        )

    tri = all_triangles(graph).select(
        F.struct("a", "b", "c").alias("t")
    ).persist()
    tedge = tri.select(
        "t",
        F.explode(
            F.array(
                F.struct(F.col("t.a").alias("u"), F.col("t.b").alias("v")),
                F.struct(F.col("t.a").alias("u"), F.col("t.c").alias("v")),
                F.struct(F.col("t.b").alias("u"), F.col("t.c").alias("v")),
            )
        ).alias("e"),
    ).persist()

    # stable_checkpoint: lbl is referenced twice per round (gather +
    # current), so carried-over origin stats would square per round
    # (see plans/loop.py stable_checkpoint).
    lbl = stable_checkpoint(tri.select("t", F.col("t").alias("l")))
    for _round in range(max_rounds):
        edge_min = (
            tedge.join(lbl, "t")
            .groupBy("e")
            .agg(F.min("l").alias("_el"))
        )
        new = stable_checkpoint(
            tedge.join(edge_min, "e")
            .groupBy("t")
            .agg(F.min("_el").alias("_nl"))
            .join(lbl, "t")
            .select("t", F.least("_nl", "l").alias("l"))
        )
        moved = (
            new.join(lbl.select("t", F.col("l").alias("_o")), "t")
            .where(F.col("l") != F.col("_o"))
        )
        lbl = new
        if moved.isEmpty():
            break
    else:
        raise RuntimeError(
            f"k_clique_communities did not converge in {max_rounds} rounds"
        )
    members = tri.select(
        "t", F.explode(F.array("t.a", "t.b", "t.c")).alias("id")
    )
    return (
        members.join(lbl, "t")
        .select(
            F.col("l.a").alias("ca"),
            F.col("l.b").alias("cb"),
            F.col("l.c").alias("cc"),
            "id",
        )
        .distinct()
    )
