"""TF-IDF vectors + inverted-index cosine top-k
(linkgraph/functions/tfidf.py) vs a dense numpy reference."""

import math

import numpy as np
import pytest

from linkgraph.functions.tfidf import tfidf_topk, tfidf_vectors

CORPUS = [
    (0, "spark join shuffle join"),
    (1, "spark scan filter"),
    (2, "join shuffle shuffle plan"),
    (3, "filter scan scan spark"),
    (4, "plan"),
]


def _docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def _ref(max_df=None):
    texts = {i: t.split() for i, t in CORPUS}
    vocab = sorted({w for t in texts.values() for w in t})
    n = len(texts)
    df = {w: sum(w in t for t in texts.values()) for w in vocab}
    if max_df is not None:
        vocab = [w for w in vocab if df[w] <= max_df]
    vecs = {}
    for i, t in texts.items():
        vecs[i] = np.array(
            [t.count(w) * math.log(n / df[w]) for w in vocab]
        )
    return vecs


def test_vectors_hand_checked(spark):
    got = {(r["id"], r["tok"]): r["w"]
           for r in tfidf_vectors(_docs(spark)).collect()}
    # "join" appears twice in doc 0; df(join)=2, N=5
    assert got[(0, "join")] == pytest.approx(2 * math.log(5 / 2), abs=1e-12)
    assert got[(4, "plan")] == pytest.approx(math.log(5 / 2), abs=1e-12)


@pytest.mark.parametrize("max_df", [None, 2])
def test_topk_matches_dense_reference(spark, max_df):
    vecs = _ref(max_df)
    rows = tfidf_topk(_docs(spark), k=3, max_df=max_df).collect()
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append((r["rnk"], r["neighbor_id"]))
    for q, items in got.items():
        # re-rank the reference the same way: (rounded sim desc, id asc)
        sims = []
        for o in vecs:
            if o == q:
                continue
            na, nb = np.linalg.norm(vecs[q]), np.linalg.norm(vecs[o])
            d = float(vecs[q] @ vecs[o])
            if d == 0.0:
                continue  # engine only meets docs sharing a kept token
            sims.append((round(d / (na * nb) + 1e-12, 6), o))
        sims.sort(key=lambda t: (-t[0], t[1]))
        want = [(i + 1, o) for i, (_, o) in enumerate(sims[:3])]
        assert sorted(items) == want, (q, sorted(items), want)


def test_zero_overlap_pairs_absent(spark):
    docs = spark.createDataFrame(
        [(0, "aa bb"), (1, "cc dd"), (2, "aa cc")], "doc_id long, text string"
    )
    rows = tfidf_topk(docs, k=5).collect()
    pairs = {(r["query_id"], r["neighbor_id"]) for r in rows}
    assert (0, 1) not in pairs and (1, 0) not in pairs
    assert (0, 2) in pairs and (2, 0) in pairs
