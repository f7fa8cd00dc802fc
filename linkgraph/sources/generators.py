"""Distributed deterministic graph generators.

The reference ships driver-side generators (`networkx/generators/
random_graphs.py:32 gnp_random_graph`, :140 gnm_random_graph,
barabasi_albert_graph :656) that materialize every edge in one Python
process — unusable above ~10^7 edges. These produce the same graph
FAMILIES as DataFrame programs over ``spark.range``: deterministic in
(n, m, seed) alone, independent of partitioning and cluster size,
zero driver-side state — so a 10^11-edge test graph costs one range
scan. Used by the scaling tools; `corpus.zipf_pages` is the
page-shaped sibling.

Distribution notes (documented divergences from the reference's exact
samplers): ``gnm_edges`` draws m edges i.i.d. uniform over ordered
pairs (with replacement — duplicate/parallel edges possible at rate
~m/n², self-loops at rate 1/n; both negligible for sparse graphs and
harmless to the engine's multigraph semantics). ``ba_edges`` uses the
hash-sequence trick: target of edge j is either a uniform earlier
node or the endpoint of a uniform earlier EDGE (50/50) — the classic
linear-time preferential-attachment equivalence (Batagelj–Brandes),
approximated here by sampling edge endpoints through a second hash
rather than a sequential pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_P = 2_147_483_647  # 2^31 - 1, for hash -> uniform


def _u(*cols) -> "F.Column":
    """Deterministic uniform in [0, 1) from hashed columns."""
    return (F.pmod(F.xxhash64(*cols), F.lit(_P))) / float(_P)


def gnm_edges(
    spark: SparkSession,
    n: int,
    m: int,
    seed: int = 0,
    partitions: int = 32,
) -> DataFrame:
    """(src, dst, weight) — m i.i.d. uniform edges over n nodes."""
    e = spark.range(0, m, 1, partitions)
    s = F.lit(seed)
    return e.select(
        F.pmod(F.xxhash64(s, F.col("id"), F.lit(0)), F.lit(n)).alias("src"),
        F.pmod(F.xxhash64(s, F.col("id"), F.lit(1)), F.lit(n)).alias("dst"),
        F.lit(1.0).alias("weight"),
    )


def ba_edges(
    spark: SparkSession,
    n: int,
    k: int = 4,
    seed: int = 0,
    partitions: int = 32,
) -> DataFrame:
    """(src, dst, weight) — preferential-attachment-family graph:
    node i (i >= k) emits k edges; each target is, 50/50, a uniform
    earlier node or the src of a uniform earlier edge (edge-endpoint
    sampling ≈ degree-proportional sampling). Hub in-degree follows
    the BA power law in expectation."""
    s = F.lit(seed)
    base = spark.range(k, n, 1, partitions).select(
        F.col("id").alias("src"),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j"),
    )
    # uniform earlier node
    uni = F.pmod(F.xxhash64(s, "src", "j", F.lit(0)), F.col("src"))
    # endpoint of a uniform earlier emitted edge (e_idx < (src-k)*k),
    # whose src was k + e_idx / k
    e_idx = F.pmod(
        F.xxhash64(s, "src", "j", F.lit(1)),
        F.greatest((F.col("src") - k) * k, F.lit(1)),
    )
    via_edge = F.lit(k) + (e_idx / k).cast("long")
    coin = F.pmod(F.xxhash64(s, "src", "j", F.lit(2)), F.lit(2)) == 0
    dst = F.when(coin | (F.col("src") == k), uni).otherwise(via_edge)
    return base.select(
        "src", dst.alias("dst"), F.lit(1.0).alias("weight")
    ).where(F.col("src") != F.col("dst"))
