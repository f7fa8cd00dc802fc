"""Maximal independent set — Luby's algorithm with deterministic
hashed priorities (networkx/algorithms/mis.py:16
``maximal_independent_set``; Luby 1986).

The reference grows one MIS sequentially from a random seed node; a
distributed engine runs Luby rounds: every undecided vertex with a
priority smaller than all its undecided neighbors joins the MIS, its
neighbors leave the game, repeat — O(log n) expected rounds, each
round two shuffles (a neighbor-min gather and a removal anti-join).

Priorities are an arithmetic hash of (id, seed) with id as
tie-breaker, so runs are reproducible and a SQL oracle replays the
same set exactly (the same device as walks.py — every operand stays
nonnegative and inside int64 under ANSI mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph

_MIX_MOD = 1_048_573
_A = 1_103_515_245
_P = 2_147_483_647


def _priority(col, seed: int):
    return F.pmod(F.lit(_A) * F.pmod(col, F.lit(_MIX_MOD)) + F.lit(seed), F.lit(_P))


def maximal_independent_set(
    graph: LinkGraph,
    seed: int = 0,
    max_rounds: int = 64,
) -> DataFrame:
    """(id BIGINT, in_mis BOOLEAN) for every vertex. Self-loops are
    ignored (a self-looped vertex can still enter the set), matching
    the reference's neighbor semantics. Raises RuntimeError if
    ``max_rounds`` is exhausted with undecided vertices left —
    mirroring strongly_connected's refusal to return silently
    incomplete labelings."""
    spark = graph.spark
    num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    verts = graph.vertices.select("id")
    sym = (
        graph.symmetrized_edges()
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .join(verts.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(verts.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .distinct()
    )

    undecided = (
        verts.select("id", _priority(F.col("id"), seed).alias("p"))
        .repartition(num_partitions, "id")
        .localCheckpoint(eager=True)
    )
    mis_parts: list[DataFrame] = []
    for _ in range(max_rounds):
        if undecided.limit(1).count() == 0:
            break
        live = (
            sym.join(undecided.withColumnRenamed("id", "src").select("src"), "src", "left_semi")
            .join(
                undecided.select(
                    F.col("id").alias("dst"), F.col("p").alias("p_dst")
                ),
                "dst",
            )
        )
        nbr_min = live.groupBy("src").agg(
            F.min(F.struct("p_dst", "dst")).alias("m")
        )
        winners = (
            undecided.join(nbr_min.withColumnRenamed("src", "id"), "id", "left")
            .where(
                F.col("m").isNull()
                | (F.struct(F.col("p"), F.col("id")) < F.col("m"))
            )
            .select("id")
            .localCheckpoint(eager=True)
        )
        mis_parts.append(winners)
        removed = winners.unionByName(
            sym.join(winners.withColumnRenamed("id", "src"), "src", "left_semi")
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        undecided = undecided.join(removed, "id", "left_anti").localCheckpoint(
            eager=True
        )
    else:
        if undecided.limit(1).count() > 0:
            raise RuntimeError(
                f"maximal_independent_set: undecided vertices remain after "
                f"max_rounds={max_rounds}; raise max_rounds"
            )

    mis = mis_parts[0] if mis_parts else spark.createDataFrame([], "id long")
    for part in mis_parts[1:]:
        mis = mis.unionByName(part)
    return verts.join(
        mis.select("id", F.lit(True).alias("in_mis")), "id", "left"
    ).select("id", F.coalesce("in_mis", F.lit(False)).alias("in_mis"))


def dominating_set(
    graph: LinkGraph,
    seed: int = 0,
    max_rounds: int = 64,
) -> DataFrame:
    """(id BIGINT, in_set BOOLEAN) — a dominating set: every vertex is
    in the set or adjacent to a member (reference:
    networkx/algorithms/dominating.py:14 ``dominating_set``; the
    reference grows one greedily from an arbitrary start, a distributed
    engine uses the standard fact that any MAXIMAL independent set is
    dominating — maximality means no vertex outside the set could be
    added, i.e. every outsider has a neighbor inside)."""
    return maximal_independent_set(graph, seed=seed, max_rounds=max_rounds).select(
        "id", F.col("in_mis").alias("in_set")
    )
