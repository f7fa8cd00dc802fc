"""Deterministic distributed random walks — the DeepWalk/node2vec
corpus-generation primitive over a web link graph.

The reference ecosystem generates walk corpora with a driver-side
Python loop over ``G.neighbors`` (e.g. networkx-based DeepWalk
implementations iterate node-by-node); at web scale the walk table IS
the big data. Distributed form: the graph is compiled once into a
sorted CSR row per vertex (one shuffle), and every step of EVERY walk
advances together with one state⋈CSR join — O(walk_length) jobs total,
independent of the number of walks.

Determinism: the neighbor choice is a pure arithmetic mix of
(current node, walk id, step, seed) reduced mod out-degree — an
LCG-style hash chosen because it is expressible verbatim in any SQL
engine (the DuckDB oracle replays the exact walks). The pre-mod by
``_MIX_MOD`` bounds every product well inside int64 (Spark 4 runs
ANSI mode: bigint overflow raises, not wraps). For cryptographic-
quality mixing swap in xxhash64 — same plan shape, no oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph

_MIX_MOD = 1_048_573  # prime < 2^20: products stay < 2^63 in ANSI mode
_A = 1_103_515_245
_B = 2_654_435_761
_C = 12_345


def _choice(cur, walk, step: int, seed: int):
    mix = (
        F.lit(_A) * F.pmod(cur, F.lit(_MIX_MOD))
        + F.lit(_B) * F.pmod(walk, F.lit(_MIX_MOD))
        + F.lit(_C * step + seed)
    )
    return mix


def random_walks(
    graph: LinkGraph,
    walk_length: int,
    walks_per_node: int = 1,
    seed: int = 0,
    starts: DataFrame | None = None,
    directed: bool | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """(walk BIGINT, step INT, node BIGINT) — truncated deterministic
    random walks, one row per visited position.

    ``walk = start_id * walks_per_node + replica``; step 0 is the
    start vertex; a walk ends early at a dead end (no out-neighbors),
    matching DeepWalk's truncation. ``starts`` (a DataFrame with an
    ``id`` column) restricts the start set; default is every vertex.

    CSR rows are ``sort_array(collect_set(dst))`` so the k-th neighbor
    is the k-th in ascending dst order — the same ordering a SQL
    oracle reproduces with ``row_number() OVER (ORDER BY dst)``.
    Hub rows materialize their full neighbor array; at extreme hub
    degrees chunk the row as ``build_adjacency`` does and pick the
    chunk by ``choice / chunk_size`` first.
    """
    spark = graph.spark
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if directed is None:
        directed = graph.directed

    base = graph.weighted_edges() if directed else graph.symmetrized_edges()
    verts = graph.vertices.select("id")
    csr = (
        base.select("src", "dst")
        .join(verts.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .groupBy("src")
        .agg(F.sort_array(F.collect_set("dst")).alias("nbrs"))
        .repartition(num_partitions, "src")
        .persist()
    )
    csr.count()

    if starts is None:
        starts = verts
    start0 = starts.select(F.col("id")).join(verts, "id", "left_semi")
    state = start0.select(
        F.explode(
            F.sequence(
                F.col("id") * walks_per_node,
                F.col("id") * walks_per_node + (walks_per_node - 1),
            )
        ).alias("walk"),
        F.col("id").alias("node"),
    )
    out = state.select("walk", F.lit(0).alias("step"), "node").localCheckpoint(
        eager=True
    )
    frontier = out
    try:
        for step in range(1, walk_length + 1):
            nxt = (
                frontier.join(csr.withColumnRenamed("src", "node"), "node")
                .select(
                    "walk",
                    F.lit(step).alias("step"),
                    F.element_at(
                        "nbrs",
                        (
                            F.pmod(
                                _choice(F.col("node"), F.col("walk"), step, seed),
                                F.size("nbrs"),
                            )
                            + 1
                        ).cast("int"),
                    ).alias("node"),
                )
                .localCheckpoint(eager=True)
            )
            if nxt.limit(1).count() == 0:
                break
            out = out.unionByName(nxt)
            frontier = nxt
        return out.select("walk", "step", "node")
    finally:
        csr.unpersist()


def node2vec_walks(
    graph: LinkGraph,
    walk_length: int,
    w_return: int = 1,
    w_common: int = 1,
    w_explore: int = 1,
    walks_per_node: int = 1,
    seed: int = 0,
    starts: DataFrame | None = None,
    directed: bool | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """(walk BIGINT, step INT, node BIGINT) — node2vec 2nd-order biased
    walks (Grover & Leskovec 2016). The three integer weights are the
    node2vec bias numerators after clearing denominators: a candidate
    next-hop gets ``w_return`` if it IS the previous node (node2vec's
    1/p), ``w_common`` if it is a neighbor of the previous node
    (node2vec's 1), else ``w_explore`` (node2vec's 1/q). E.g. p=4, q=2
    → (w_return, w_common, w_explore) = (1, 4, 2). Integer weights keep
    the sampler exactly replayable in SQL — no float cumulative sums.

    Deterministic weighted choice per (walk, step): candidates are the
    current node's neighbors in ascending id order; pick the first
    whose cumulative weight exceeds ``hash(cur, walk, step, seed) mod
    total_weight``. Step 1 has no previous node and is uniform
    (weight 1 per candidate), matching the reference's first-step
    semantics.

    Scale note: each step is one frontier⋈CSR explode plus one
    (prev, cand) membership semi-join against the edge set — the
    distributed replacement for node2vec's per-node alias tables,
    which need O(sum degree²) precomputed state and do not shard.
    """
    spark = graph.spark
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if directed is None:
        directed = graph.directed
    for name, w in (("w_return", w_return), ("w_common", w_common), ("w_explore", w_explore)):
        if not isinstance(w, int) or w < 0:
            raise ValueError(f"{name} must be a nonnegative int, got {w!r}")
    if w_return + w_common + w_explore == 0:
        raise ValueError("at least one bias weight must be positive")

    base = graph.weighted_edges() if directed else graph.symmetrized_edges()
    verts = graph.vertices.select("id")
    edges = (
        base.select("src", "dst")
        .join(verts.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .distinct()
        .repartition(num_partitions, "src")
        .persist()
    )
    csr = (
        edges.groupBy("src")
        .agg(F.sort_array(F.collect_set("dst")).alias("nbrs"))
        .repartition(num_partitions, "src")
        .persist()
    )
    csr.count()

    if starts is None:
        starts = verts
    start0 = starts.select(F.col("id")).join(verts, "id", "left_semi")
    state = start0.select(
        F.explode(
            F.sequence(
                F.col("id") * walks_per_node,
                F.col("id") * walks_per_node + (walks_per_node - 1),
            )
        ).alias("walk"),
        F.lit(None).cast("long").alias("prev"),
        F.col("id").alias("node"),
    )
    out = state.select("walk", F.lit(0).alias("step"), "node").localCheckpoint(
        eager=True
    )
    frontier = state.localCheckpoint(eager=True)
    try:
        for step in range(1, walk_length + 1):
            cand = (
                frontier.join(csr.withColumnRenamed("src", "node"), "node")
                .select("walk", "prev", "node", F.explode("nbrs").alias("cand"))
            )
            # membership probe: is cand a neighbor of prev?
            is_common = (
                cand.join(
                    edges.select(
                        F.col("src").alias("prev"), F.col("dst").alias("cand")
                    ),
                    ["prev", "cand"],
                    "left_semi",
                )
                .select("walk", "cand", F.lit(True).alias("common"))
            )
            weighted = cand.join(is_common, ["walk", "cand"], "left").select(
                "walk",
                "prev",
                "node",
                "cand",
                F.when(F.col("prev").isNull(), F.lit(1))
                .when(F.col("cand") == F.col("prev"), F.lit(w_return))
                .when(F.col("common"), F.lit(w_common))
                .otherwise(F.lit(w_explore))
                .alias("w"),
            )
            from pyspark.sql.window import Window as _W

            wcum = (
                _W.partitionBy("walk")
                .orderBy("cand")
                .rowsBetween(_W.unboundedPreceding, 0)
            )
            wtot = _W.partitionBy("walk").rowsBetween(
                _W.unboundedPreceding, _W.unboundedFollowing
            )
            scored = weighted.select(
                "walk",
                "node",
                "cand",
                F.sum("w").over(wcum).alias("cum"),
                F.sum("w").over(wtot).alias("tot"),
            )
            nxt = (
                scored.where(F.col("tot") > 0)
                .where(
                    F.col("cum")
                    > F.pmod(
                        _choice(F.col("node"), F.col("walk"), step, seed),
                        F.col("tot"),
                    )
                )
                .groupBy("walk")
                .agg(
                    F.min("cand").alias("node"),
                    # all rows of a walk group carry the same current
                    # node; min is just the deterministic pick
                    F.min("node").alias("prev"),
                )
                .select("walk", "prev", "node")
                .localCheckpoint(eager=True)
            )
            if nxt.limit(1).count() == 0:
                break
            out = out.unionByName(nxt.select("walk", F.lit(step).alias("step"), "node"))
            frontier = nxt
        return out.select("walk", "step", "node")
    finally:
        csr.unpersist()
        edges.unpersist()


def skipgram_pairs(
    walks: DataFrame, window: int = 2, keep_self: bool = False
) -> DataFrame:
    """(center, context, offset) — word2vec-style training pairs from
    a walk table (walk, step, node): for every walk position, each
    neighbor within ``offset`` ∈ [-window, window] \\ {0} becomes one
    (center, context) row. The standard DeepWalk/node2vec corpus step
    (Perozzi et al. 2014 §4.2 feed walks to skip-gram).

    One equi-join of the walk table with itself on ``walk`` plus a
    bounded BETWEEN on step — Spark plans it as a hash join on walk
    with the range predicate as a post-filter; output is
    O(total_steps · 2·window). No windows/UDFs, whole-stage codegen."""
    a = walks.select(
        F.col("walk"), F.col("step").alias("s_a"), F.col("node").alias("center")
    )
    b = walks.select(
        F.col("walk"), F.col("step").alias("s_b"), F.col("node").alias("context")
    )
    out = (
        a.join(b, "walk")
        .where(
            (F.col("s_b") >= F.col("s_a") - window)
            & (F.col("s_b") <= F.col("s_a") + window)
            & (F.col("s_b") != F.col("s_a"))
        )
        .select(
            "center",
            "context",
            (F.col("s_b") - F.col("s_a")).cast("long").alias("offset"),
        )
    )
    if not keep_self:
        out = out.where(F.col("center") != F.col("context"))
    return out
