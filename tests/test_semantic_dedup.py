"""SemDeDup (within-cell cosine near-dup survivorship) vs a
brute-force Python check of the same contract. ids 0-3 are the
deterministic k-means init centroids (lowest ids), one per group, so
each tight group lands in one cell."""

import math

import pytest

from linkgraph.functions.similarity import semantic_dedup, semantic_near_pairs

VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.0, 1.0, 0.0, 0.0]),
    (2, [0.0, 0.0, 1.0, 0.0]),
    (3, [0.0, 0.0, 0.0, 1.0]),
    (4, [0.99, 0.1, 0.0, 0.0]),   # near 0
    (5, [0.98, 0.15, 0.05, 0.0]), # near 0
    (6, [0.05, 0.99, 0.05, 0.0]), # near 1
]


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    return d / (
        math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
    )


def _df(spark):
    return spark.createDataFrame(VECS, "vec_id LONG, embedding ARRAY<FLOAT>")


def test_semantic_near_pairs(spark):
    got = {
        (r["id_a"], r["id_b"])
        for r in semantic_near_pairs(
            _df(spark), threshold=0.9, n_centroids=4, kmeans_iters=2
        ).collect()
    }
    v = dict((i, [float(x) for x in vec]) for i, vec in VECS)
    for a, b in got:  # every returned pair really is >= threshold
        assert _cos(v[a], v[b]) >= 0.9 - 1e-6
    assert got == {(0, 4), (0, 5), (4, 5), (1, 6)}


def test_semantic_dedup_survivors(spark):
    out = {
        r["vec_id"]: (r["cluster"], r["is_survivor"])
        for r in semantic_dedup(
            _df(spark), threshold=0.9, n_centroids=4, kmeans_iters=2
        ).collect()
    }
    assert len(out) == len(VECS)
    assert out[0] == (0, True)
    assert out[4] == (0, False) and out[5] == (0, False)
    assert out[1] == (1, True) and out[6] == (1, False)
    assert out[2] == (2, True) and out[3] == (3, True)


def test_np_assignment_lane_matches_exact_lane(spark):
    """The Arrow+BLAS scale lane (_assign_np) and the exact HOF lane
    (_with_nearest) must produce identical cell assignments on the
    same centroids — the gate NP_ASSIGN_MIN_TERMS switches between
    them silently, so divergence would corrupt SemDeDup clusters."""
    from pyspark.sql import functions as F

    from linkgraph.functions.similarity import (
        _assign_np,
        _cents_relation,
        _with_nearest,
        kmeans_fit,
    )

    emb = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda i: (F.xxhash64(F.col("id"), i) % 100).cast("double") / 100.0,
        ).alias("embedding"),
    )
    cents = kmeans_fit(emb, n_centroids=7, iters=2)
    base = emb.select("vec_id", "embedding")
    exact = {
        (r["vec_id"], r["cluster"])
        for r in _with_nearest(
            base,
            _cents_relation(spark, cents),
            F.transform(F.col("embedding"), lambda x: x.cast("double")),
        ).collect()
    }
    fast = {
        (r["vec_id"], r["cluster"])
        for r in _assign_np(base, cents, "embedding").collect()
    }
    assert exact == fast
