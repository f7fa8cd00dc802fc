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
from ._local import member_maps, run_local_kernel

_MIX_MOD = 1_048_573
_A = 1_103_515_245
_P = 2_147_483_647

# Size gate for the single-task numpy kernel: same cost-model physical
# choice as pagerank.py LOCAL_PR_MAX_EDGES — each Luby round costs two
# shuffles plus three eager materializations, a ~1-2 s scheduling
# floor per round at toy scale that dwarfs the vectorized sweep.
LOCAL_MIS_MAX_EDGES = 2_000_000


def _priority(col, seed: int):
    return F.pmod(F.lit(_A) * F.pmod(col, F.lit(_MIX_MOD)) + F.lit(seed), F.lit(_P))


def _local_mis(
    statics: DataFrame,
    edges: DataFrame,
    seed: int,
    max_rounds: int,
) -> DataFrame:
    """Single-task Luby: the exact distributed semantics — priority
    (_A·(id mod _MIX_MOD) + seed) mod _P with id as tie-breaker, a
    vertex joins when (p, id) precedes every undecided neighbor's
    (p, id), winners' neighborhoods leave the game — vectorized with
    ``np.minimum.at`` scatter-mins over (priority, position) keys
    packed into one int64 (positions order exactly as ids: the member
    array is sorted)."""
    rounds = int(max_rounds)
    sd = int(seed)

    def kernel(ids, stat, es, ed, ew):
        import numpy as np

        nv = len(ids)
        si, di, ms, md = member_maps(ids, es, ed)
        keep = ms & md & (es != ed)
        # symmetrize: Luby neighborhoods are undirected
        gs = np.concatenate([si[keep], di[keep]]).astype(np.int64)
        gd = np.concatenate([di[keep], si[keep]]).astype(np.int64)
        pri = (_A * (ids % _MIX_MOD) + sd) % _P
        # lexicographic (p, id) == packed p*nv + position (ids sorted)
        key = pri * np.int64(max(nv, 1)) + np.arange(nv, dtype=np.int64)
        sentinel = np.iinfo(np.int64).max
        und = np.ones(nv, dtype=bool)
        in_mis = np.zeros(nv, dtype=bool)
        exhausted = False
        for _ in range(rounds):
            if not und.any():
                break
            live = und[gs] & und[gd]
            nbr_min = np.full(nv, sentinel, dtype=np.int64)
            np.minimum.at(nbr_min, gs[live], key[gd[live]])
            winners = und & (key < nbr_min)
            in_mis |= winners
            removed = winners.copy()
            wins_at_src = winners[gs]
            removed[gd[wins_at_src]] = True
            und &= ~removed
        else:
            exhausted = und.any()
        return {
            "id": ids,
            "in_mis": in_mis,
            "exhausted": np.full(nv, exhausted, dtype=bool),
        }

    return run_local_kernel(
        edges, statics, [], kernel, "id long, in_mis boolean, exhausted boolean"
    )


def maximal_independent_set(
    graph: LinkGraph,
    seed: int = 0,
    max_rounds: int = 64,
    local_max_edges: int = LOCAL_MIS_MAX_EDGES,
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

    # single-task numpy kernel below the size gate (the kernel
    # symmetrizes and member-filters internally, so it takes the raw
    # edge table)
    if local_max_edges:
        ep = graph.edges.select(
            "src", "dst", F.lit(1.0).alias("weight")
        ).persist()
        if ep.count() <= local_max_edges:
            try:
                res = _local_mis(verts, ep, seed, max_rounds).persist()
                meta = res.select("exhausted").first()
                if meta is not None and meta["exhausted"]:
                    res.unpersist()
                    raise RuntimeError(
                        f"maximal_independent_set: undecided vertices remain "
                        f"after max_rounds={max_rounds}; raise max_rounds"
                    )
                return res.select("id", "in_mis")
            finally:
                ep.unpersist()
        ep.unpersist()

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
