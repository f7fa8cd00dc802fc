"""Reaching centrality — the Mones/Vicsek/Vicsek hierarchy measure.

Reference: networkx/algorithms/centrality/reaching.py
``local_reaching_centrality`` / ``global_reaching_centrality``
(unweighted directed form): lrc(v) = (#nodes reachable from v) /
(n - 1); GRC = Σ_v (max_lrc − lrc(v)) / (n − 1).

Physical strategy: one :func:`~linkgraph.operators.dag.transitive_closure`
pass (path doubling, O(log depth) rounds) shared by every vertex,
then two hash aggregates. The closure is O(n·reach) rows — on graphs
with a giant reachable core prefer the sampled distance operators;
this exact form is the reference's own contract. Weighted mode is
[wontfix] (the reference's weighted variant averages per-path edge
weights, a sequential path enumeration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from .dag import transitive_closure


def local_reaching_centrality(graph: LinkGraph) -> DataFrame:
    """(id, lrc DOUBLE) for every vertex (0.0 when nothing is
    reachable). Directed unweighted semantics (reaching.py:99: the
    proportion of other nodes reachable from v)."""
    n = graph.num_vertices()
    if n < 2:
        raise ValueError("local_reaching_centrality needs >= 2 nodes")
    closure = transitive_closure(graph)
    # (u, u) closure rows (self-loops / cycles) are not "other nodes
    # reachable" — reaching.py counts len(paths) - 1 over OTHER nodes
    counts = (
        closure.where(F.col("src") != F.col("dst"))
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("_reach"))
    )
    return (
        graph.vertices.select("id")
        .join(counts, "id", "left")
        .select(
            "id",
            (F.coalesce("_reach", F.lit(0)) / F.lit(float(n - 1))).alias("lrc"),
        )
    )


def global_reaching_centrality(graph: LinkGraph) -> DataFrame:
    """One row (grc DOUBLE) — reaching.py:9: the average gap to the
    maximum local reaching centrality. The max rides the plan as a
    broadcast one-row aggregate (no driver round-trip)."""
    n = graph.num_vertices()
    lrc = local_reaching_centrality(graph)
    mx = lrc.agg(F.max("lrc").alias("_mx"))
    return lrc.crossJoin(F.broadcast(mx)).agg(
        (F.sum(F.col("_mx") - F.col("lrc")) / F.lit(float(n - 1))).alias("grc")
    )
