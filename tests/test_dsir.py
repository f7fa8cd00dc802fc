"""DSIR hashed n-gram importance log-weights vs an independent
pure-Python reimplementation (same md5 bucketing)."""

import hashlib
import math

import pytest

from linkgraph.functions.pipeline import dsir_logweights

RAW = [
    (0, "the cat sat on the mat"),
    (1, "stock market prices rose sharply today"),
    (2, "the dog sat on the log"),
    (3, "quarterly earnings beat market expectations again"),
    (4, ""),
]
TARGET = [
    (100, "the cat and the dog sat together"),
    (101, "a cat sat near the mat"),
]
B = 64


def _buckets(text):
    toks = text.split()
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [
        int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B for g in grams
    ]


def _expected():
    rawb = {i: _buckets(t) for i, t in RAW}
    tgtb = [b for _, t in TARGET for b in _buckets(t)]
    allraw = [b for bs in rawb.values() for b in bs]
    rtot, ttot = len(allraw), len(tgtb)
    rc = {b: allraw.count(b) for b in set(allraw)}
    tc = {b: tgtb.count(b) for b in set(tgtb)}
    out = {}
    for i, bs in rawb.items():
        if not bs:
            continue
        lw = sum(
            math.log(tc.get(b, 0) + 1) - math.log(ttot + B)
            - (math.log(rc.get(b, 0) + 1) - math.log(rtot + B))
            for b in bs
        )
        out[i] = (len(bs), lw)
    return out


def test_dsir_logweights_vs_python(spark):
    raw = spark.createDataFrame(RAW, "doc_id LONG, text STRING")
    tgt = spark.createDataFrame(TARGET, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (r["n_grams"], r["log_weight"])
        for r in dsir_logweights(raw, tgt, n_buckets=B).collect()
    }
    want = _expected()
    assert set(got) == set(want)  # empty doc 4 omitted
    for i, (n, lw) in want.items():
        assert got[i][0] == n
        assert got[i][1] == pytest.approx(lw, abs=1e-9)
    # docs sharing target vocabulary score higher than off-domain docs
    assert got[0][1] / got[0][0] > got[1][1] / got[1][0]
