"""Minimum spanning forest via distributed Borůvka.

Reference: networkx/algorithms/tree/mst.py (``minimum_spanning_tree``
:592, ``minimum_spanning_edges``:338 — Kruskal by default). Kruskal's
sorted sequential scan doesn't distribute; the classic superstep form
is Borůvka (1926): every component picks its lightest outgoing edge,
all picked edges join the forest, touching components merge, repeat —
components at least halve per round, so O(log n) rounds.

Edge order is the TOTAL order (weight, a, b) over canonical
undirected edges (a = min endpoint, b = max endpoint, parallel edges
pre-coalesced to their min weight): with a total order Borůvka is
deterministic and returns exactly the Kruskal-under-that-order MSF.
Documented divergence: on ties the reference's Kruskal breaks by
input insertion order instead — both outputs are valid MSFs; with
distinct weights (the tested/oracled case) they are identical,
because the MSF is then unique.

Physical plan per round: one broadcast-or-shuffle join of component
labels onto the (persisted, never re-shuffled) canonical edge table,
one min(struct) groupBy for the per-component pick (map-side partial
agg), then a component-graph contraction done with min-edge hooking:
each picked edge is a parent pointer, the only cycles are mutual
picks (2-cycles, since the pick order is total) broken toward the
smaller id, and the resulting forest is collapsed by pointer
doubling. All state tables are O(#components), which at least halves
every round — at 100 TB the heavy table (edges) is touched once per
round by an equi-join that AQE can skew-split, and everything else
shrinks geometrically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def _canonical_edges(graph: LinkGraph) -> DataFrame:
    """(a, b, w): undirected canonical pairs a < b, parallel edges
    coalesced to min weight (the reference keeps the lightest parallel
    edge for MST purposes); self-loops dropped (never in a forest)."""
    we = graph.weighted_edges()
    return (
        we.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            "weight",
        )
        .groupBy("a", "b")
        .agg(F.min("weight").alias("w"))
    )


def minimum_spanning_forest(
    graph: LinkGraph, max_rounds: int = 64
) -> DataFrame:
    """(a, b, w) — the edges of the minimum spanning forest (one tree
    per connected component, n − #components edges total)."""
    ew = _canonical_edges(graph).persist()
    comp = graph.vertices.select(
        "id", F.col("id").alias("c")
    ).localCheckpoint()
    forest: DataFrame | None = None

    for _round in range(max_rounds):
        x = (
            ew.join(comp.select(F.col("id").alias("a"), F.col("c").alias("ca")), "a")
            .join(comp.select(F.col("id").alias("b"), F.col("c").alias("cb")), "b")
            .where(F.col("ca") != F.col("cb"))
            .localCheckpoint(eager=True)
        )
        if x.isEmpty():
            break
        # per-component lightest outgoing edge under the (w, a, b)
        # total order; min(struct) is lexicographic
        cand = x.select(
            F.col("ca").alias("c"),
            F.struct("w", "a", "b", F.col("cb").alias("other")).alias("e"),
        ).unionByName(
            x.select(
                F.col("cb").alias("c"),
                F.struct("w", "a", "b", F.col("ca").alias("other")).alias("e"),
            )
        )
        sel = (
            cand.groupBy("c")
            .agg(F.min("e").alias("e"))
            .select("c", "e.w", "e.a", "e.b", F.col("e.other").alias("m"))
            .localCheckpoint(eager=True)
        )
        picked = sel.select("a", "b", "w").distinct()
        forest = picked if forest is None else forest.unionByName(picked)
        forest = forest.localCheckpoint()

        # min-edge hooking: parent(c) = m(c), except the smaller side
        # of a mutual pick roots itself (the only cycles are 2-cycles)
        mm = sel.select("c", "m").join(
            sel.select(F.col("c").alias("m"), F.col("m").alias("_mm")), "m"
        )
        parent = mm.select(
            "c",
            F.when(
                (F.col("_mm") == F.col("c")) & (F.col("c") < F.col("m")),
                F.col("c"),
            )
            .otherwise(F.col("m"))
            .alias("p"),
        ).localCheckpoint(eager=True)
        # pointer doubling to the roots
        while True:
            jumped = (
                parent.join(
                    parent.select(F.col("c").alias("p"), F.col("p").alias("_gp")),
                    "p",
                    "left",
                )
                .select("c", F.coalesce("_gp", "p").alias("p"))
                .localCheckpoint(eager=True)
            )
            moved = (
                jumped.join(parent.select("c", F.col("p").alias("_o")), "c")
                .where(F.col("p") != F.col("_o"))
            )
            parent = jumped
            if moved.isEmpty():
                break
        comp = (
            comp.join(parent.select(F.col("c"), F.col("p")), "c", "left")
            .select("id", F.coalesce("p", "c").alias("c"))
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(
            f"minimum_spanning_forest did not finish in {max_rounds} rounds"
        )
    ew.unpersist()
    if forest is None:
        return graph.spark.createDataFrame([], "a long, b long, w double")
    return forest


def minimum_spanning_tree(graph: LinkGraph, **kwargs) -> LinkGraph:
    """Reference mst.py:592 facade: the forest edges as a LinkGraph
    over the same vertex set (for connected input, the unique MST when
    weights are distinct)."""
    f = minimum_spanning_forest(graph, **kwargs)
    return LinkGraph(
        vertices=graph.vertices,
        edges=f.select(
            F.col("a").alias("src"), F.col("b").alias("dst"),
            F.col("w").alias("weight"),
        ),
        directed=False,
    )
