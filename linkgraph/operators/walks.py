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
