"""Distributed generator invariants: determinism, cardinality, range,
and skew shape (no nx parity — different samplers by design)."""

import pyspark.sql.functions as F

from linkgraph.sources.generators import ba_edges, gnm_edges


def test_gnm_deterministic_and_uniform(spark):
    a = gnm_edges(spark, 1000, 5000, seed=7)
    b = gnm_edges(spark, 1000, 5000, seed=7, partitions=3)
    assert a.count() == 5000
    # identical across partitionings
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    r = a.agg(
        F.min("src"), F.max("src"), F.min("dst"), F.max("dst"),
        F.countDistinct("src").alias("ds"),
    ).first()
    assert r[0] >= 0 and r[1] < 1000 and r[2] >= 0 and r[3] < 1000
    assert r["ds"] > 900  # near-uniform src coverage
    assert gnm_edges(spark, 1000, 5000, seed=8).exceptAll(a).count() > 0


def test_ba_skew_shape(spark):
    e = ba_edges(spark, 2000, k=4, seed=1)
    assert e.count() > 0
    deg = e.groupBy("dst").count()
    top = deg.agg(F.max("count")).first()[0]
    med = deg.approxQuantile("count", [0.5], 0.0)[0]
    assert top > 8 * med  # heavy-tailed in-degree (hubs exist)
    assert e.agg(F.max("dst")).first()[0] < 2000
    assert e.where(F.col("dst") >= F.col("src")).count() == 0  # targets are earlier nodes


def test_skipgram_pairs(spark):
    from pyspark.sql import functions as F

    from linkgraph.operators.walks import skipgram_pairs

    walks = spark.createDataFrame(
        [(0, 0, 10), (0, 1, 11), (0, 2, 12), (0, 3, 10), (1, 0, 20), (1, 1, 21)],
        "walk LONG, step INT, node LONG",
    )
    got = {
        (r["center"], r["context"], r["offset"])
        for r in skipgram_pairs(walks, window=2).collect()
    }
    # brute force
    seqs = {0: [10, 11, 12, 10], 1: [20, 21]}
    want = set()
    for seq in seqs.values():
        for i, c in enumerate(seq):
            for j in range(max(0, i - 2), min(len(seq), i + 3)):
                if j != i and seq[j] != c:
                    want.add((c, seq[j], j - i))
    assert got == want
    # keep_self keeps the repeated-node pair (10 at steps 0 and 3... out of window 2? offset 3 > 2 -> none); use window=3
    got3 = {
        (r["center"], r["context"])
        for r in skipgram_pairs(walks, window=3, keep_self=True).collect()
    }
    assert (10, 10) in got3
