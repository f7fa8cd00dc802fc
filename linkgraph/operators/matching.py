"""Maximal matching and the derived 2-approximate vertex cover —
distributed greedy over locally-minimal edges.

Reference semantics (networkx/algorithms/matching.py:19
``maximal_matching`` and approximation/vertex_cover.py:13
``min_weighted_vertex_cover`` for the matching-based 2-approximation):
the reference greedily scans edges in iteration order, taking any edge
whose endpoints are both free. A distributed engine replaces the scan
order with deterministic hashed edge priorities and runs
locally-minimal rounds (Israeli–Itai style): every undecided edge
whose priority is the minimum among ALL undecided edges sharing either
endpoint enters the matching; both endpoints (and their incident
edges) leave the game; repeat. Expected O(log n) rounds — each round
is one endpoint-min gather (one shuffle) plus two anti-joins.

Priorities are the same SQL-replayable arithmetic mix used by
independent_set.py / walks.py (every operand bounded well inside int64
under ANSI mode), so a DuckDB oracle replays the exact matching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph

_MIX_MOD = 1_048_573  # prime < 2^20: products stay < 2^63 in ANSI mode
_A = 1_103_515_245
_P = 2_147_483_647


def _edge_priority(src, dst, seed: int):
    h = F.pmod(F.pmod(src, F.lit(_MIX_MOD)) * 1009 + F.pmod(dst, F.lit(_MIX_MOD)), F.lit(_MIX_MOD))
    return F.pmod(F.lit(_A) * h + F.lit(seed), F.lit(_P))


def maximal_matching(
    graph: LinkGraph,
    seed: int = 0,
    max_rounds: int = 64,
) -> DataFrame:
    """(src BIGINT, dst BIGINT) — a maximal matching over the
    canonical simple undirected edge set (src < dst, self-loops
    dropped: a self-loop cannot be matched, matching.py:41's edge
    iteration never pairs a vertex with itself).

    Maximality invariant (asserted by tests): no two output edges
    share an endpoint, and every input edge has at least one matched
    endpoint. Raises RuntimeError if ``max_rounds`` is exhausted with
    undecided edges left — never returns a silently non-maximal set.
    """
    spark = graph.spark
    num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    verts = graph.vertices.select("id")
    live = (
        graph.undirected_edges()
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .join(verts.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(verts.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .select(
            "src",
            "dst",
            F.struct(
                _edge_priority(F.col("src"), F.col("dst"), seed).alias("p"),
                F.col("src").alias("s"),
                F.col("dst").alias("d"),
            ).alias("ck"),
        )
        .repartition(num_partitions, "src")
        .localCheckpoint(eager=True)
    )

    matched_parts: list[DataFrame] = []
    for _ in range(max_rounds):
        if live.limit(1).count() == 0:
            break
        incident = live.select(F.col("src").alias("v"), "ck").unionByName(
            live.select(F.col("dst").alias("v"), "ck")
        )
        vmin = incident.groupBy("v").agg(F.min("ck").alias("mck"))
        winners = (
            live.join(vmin.withColumnRenamed("v", "src").withColumnRenamed("mck", "ms"), "src")
            .join(vmin.withColumnRenamed("v", "dst").withColumnRenamed("mck", "md"), "dst")
            .where((F.col("ck") == F.col("ms")) & (F.col("ck") == F.col("md")))
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        matched_parts.append(winners)
        mverts = (
            winners.select(F.col("src").alias("id"))
            .unionByName(winners.select(F.col("dst").alias("id")))
            .distinct()
        )
        live = (
            live.join(mverts.withColumnRenamed("id", "src"), "src", "left_anti")
            .join(mverts.withColumnRenamed("id", "dst"), "dst", "left_anti")
            .localCheckpoint(eager=True)
        )
    else:
        if live.limit(1).count() > 0:
            raise RuntimeError(
                f"maximal_matching: undecided edges remain after "
                f"max_rounds={max_rounds}; raise max_rounds"
            )

    if not matched_parts:
        return spark.createDataFrame([], "src long, dst long")
    out = matched_parts[0]
    for part in matched_parts[1:]:
        out = out.unionByName(part)
    return out


def vertex_cover_approx(
    graph: LinkGraph,
    seed: int = 0,
    max_rounds: int = 64,
) -> DataFrame:
    """(id BIGINT, in_cover BOOLEAN) for every vertex — the classic
    2-approximate vertex cover: both endpoints of a maximal matching
    (approximation/vertex_cover.py:13 with unit weights degenerates to
    exactly this set). Self-looped vertices are NOT force-included
    (parity: the reference ignores self-loops too)."""
    m = maximal_matching(graph, seed=seed, max_rounds=max_rounds)
    cover = (
        m.select(F.col("src").alias("id"))
        .unionByName(m.select(F.col("dst").alias("id")))
        .distinct()
    )
    return graph.vertices.select("id").join(
        cover.withColumn("in_cover", F.lit(True)), "id", "left"
    ).select("id", F.coalesce("in_cover", F.lit(False)).alias("in_cover"))
