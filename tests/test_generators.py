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
