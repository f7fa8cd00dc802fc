"""Unit tests for the curation-pipeline ops added in round 2:
benchmark decontamination, deterministic hash split, stratified
sampling. Semantics are checked against hand-computed expectations
(no reference analog — these are the training-data operators the
engine adds beyond the reference)."""

import math

import pyspark.sql.functions as F

from linkgraph.functions.pipeline import (
    decontaminate,
    hash_split,
    stratified_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_decontaminate_flags_shared_ngrams(spark):
    train = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog", "en"),
            (2, "completely unrelated text with no overlap here at all", "en"),
            (3, "short doc", "en"),
        ],
    )
    bench = _docs(spark, [(100, "quick brown fox jumps over me", "en")])
    got = {r["doc_id"]: (r["n_hits"], r["contaminated"])
           for r in decontaminate(train, bench, n=5).collect()}
    # doc 1 shares the 5-gram "quick brown fox jumps over"
    assert got[1] == (1, True)
    assert got[2] == (0, False)
    assert got[3] == (0, False)  # < 5 tokens -> no n-grams, never flagged


def test_hash_split_deterministic_and_complete(spark):
    docs = _docs(spark, [(i, f"text {i}", "en") for i in range(400)])
    a = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    assert a == b  # bit-for-bit deterministic
    assert set(a) == set(range(400))
    frac_train = sum(1 for v in a.values() if v == "train") / 400
    assert 0.84 <= frac_train <= 0.96  # md5-uniform around 0.9
    assert set(a.values()) <= {"train", "val", "test"}
    # custom weights respected
    c = {r["doc_id"]: r["split"]
         for r in hash_split(docs, weights=(("a", 1.0), ("b", 0.0))).collect()}
    assert set(c.values()) == {"a"}


def test_stratified_sample_quota_per_group(spark):
    rows = [(i, f"text {i}", "en" if i % 3 else "de") for i in range(90)]
    docs = _docs(spark, rows)
    got = stratified_sample(docs, 0.2, by="lang").collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    n_en = sum(1 for i in range(90) if i % 3)
    n_de = 90 - n_en
    assert len(by_lang["en"]) == math.ceil(0.2 * n_en)
    assert len(by_lang["de"]) == math.ceil(0.2 * n_de)
    again = stratified_sample(docs, 0.2, by="lang").collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in got}


def test_lsh_xxhash64_scale_lane(spark):
    from linkgraph.functions.dedup import (
        lsh_band_table,
        minhash_candidate_pairs,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta", "en"),
        (2, "alpha beta gamma delta epsilon zeta", "en"),  # exact dup of 1
        (3, "totally different words in this one here", "en"),
    ]
    docs = _docs(spark, rows)
    bt = lsh_band_table(docs, hasher="xxhash64")
    assert dict(bt.dtypes)["key"] == "bigint"  # BIGINT keys, not hex strings
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_candidate_pairs(docs, hasher="xxhash64").collect()
    }
    assert (1, 2) in pairs  # identical docs always collide in every band
    # md5 lane unchanged (oracle parity lane)
    assert dict(lsh_band_table(docs).dtypes)["key"] == "string"


def test_repetition_features(spark):
    from linkgraph.functions.textops import repetition_features

    rows = [
        (1, "a a a a", "en"),                 # all dup, all adjacent, one bigram
        (2, "w x y z", "en"),                 # no repetition
        (3, "a b a b a b", "en"),             # alternating
        (4, "solo", "en"),                    # 1 token: pairwise signals 0
    ]
    docs = _docs(spark, rows)
    got = {r["doc_id"]: r for r in repetition_features(docs).collect()}
    assert got[1]["dup_token_frac"] == 0.75
    assert got[1]["adjacent_dup_frac"] == 1.0
    assert got[1]["top_bigram_share"] == 1.0
    assert got[2]["dup_token_frac"] == 0.0
    assert got[2]["adjacent_dup_frac"] == 0.0
    assert abs(got[2]["top_bigram_share"] - 1 / 3) < 1e-8
    assert abs(got[3]["top_bigram_share"] - 3 / 5) < 1e-8  # 'a b' x3 of 5
    assert got[3]["adjacent_dup_frac"] == 0.0
    assert got[4]["dup_token_frac"] == 0.0
    assert got[4]["adjacent_dup_frac"] == 0.0
    assert got[4]["top_bigram_share"] == 0.0


def test_chunk_documents(spark):
    import pytest as _pytest

    from linkgraph.functions.pipeline import chunk_documents

    toks = [f"t{i}" for i in range(25)]
    docs = _docs(spark, [(1, " ".join(toks), "en"), (2, "a b c", "en")])
    got = {(r["doc_id"], r["chunk_id"]): r
           for r in chunk_documents(docs, size=10, overlap=2).collect()}
    # doc 1: 25 tokens, stride 8 -> chunks at 0,8,16 (ceil((25-10)/8)+1 = 3)
    assert {k for k in got if k[0] == 1} == {(1, 0), (1, 1), (1, 2)}
    assert got[(1, 0)]["chunk_text"].split() == toks[0:10]
    assert got[(1, 1)]["chunk_text"].split() == toks[8:18]
    assert got[(1, 2)]["chunk_text"].split() == toks[16:25]
    assert got[(1, 2)]["n_chunk_tokens"] == 9
    # short doc: exactly one chunk, whole text
    assert {k for k in got if k[0] == 2} == {(2, 0)}
    assert got[(2, 0)]["chunk_text"] == "a b c"
    # overlap coverage: every token index appears in some chunk
    covered = set()
    for k, r in got.items():
        if k[0] == 1:
            covered.update(r["chunk_text"].split())
    assert covered == set(toks)
    with _pytest.raises(ValueError):
        chunk_documents(docs, size=10, overlap=10)


def test_embedding_quantization(spark):
    import math

    from linkgraph.functions.similarity import (
        quantize_embeddings,
        quantized_cosine_topk,
    )

    vecs = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, -2.0]),
        (5, [0.0, 0.0, 0.0]),  # zero vector
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = quantize_embeddings(df)
    rows = {r["vec_id"]: r for r in q.collect()}
    # dequantization error bounded by scale/2 per dim
    for vid, orig in vecs:
        r = rows[vid]
        for qi, xi in zip(r["qvec"], orig):
            assert abs(qi * r["scale"] - xi) <= r["scale"] / 2 + 1e-12
    assert rows[5]["scale"] == 0.0 and all(v == 0 for v in rows[5]["qvec"])
    # quantized top-1 neighbor of vec 1 is vec 2 (closest direction)
    topk = quantized_cosine_topk(q, q.where("vec_id = 1"), k=2)
    got = [r["neighbor_id"] for r in topk.orderBy("rank").collect()]
    assert got[0] == 2


def test_duplicated_span_stats(spark):
    from linkgraph.functions.dedup import duplicated_span_stats

    # spans of 2 tokens, stride 2: doc 1 = [a b][c d], doc 2 = [a b][x y],
    # doc 3 = [c d] -> "a b" dup (docs 1,2), "c d" dup (docs 1,3)
    docs = _docs(
        spark,
        [(1, "a b c d", "en"), (2, "a b x y", "en"), (3, "c d", "en")],
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
        for r in duplicated_span_stats(docs, n=2, stride=2).collect()
    }
    assert got == {1: (2, 2), 2: (2, 1), 3: (1, 1)}


def test_drop_duplicated_spans_keeps_first_occurrence(spark):
    from linkgraph.functions.dedup import drop_duplicated_spans

    docs = _docs(
        spark,
        [(1, "a b c d", "en"), (2, "a b x y", "en"), (3, "c d", "en")],
    )
    got = {
        r["doc_id"]: r["text"]
        for r in drop_duplicated_spans(docs, n=2, stride=2).collect()
    }
    # "a b" kept only in doc 1 (min (doc_id, k)); "c d" kept only in doc 1.
    # doc 3 loses its only span -> absent from output.
    assert got == {1: "a b c d", 2: "x y"}


def test_semantic_decontaminate(spark):
    from linkgraph.functions.pipeline import semantic_decontaminate

    corpus = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0]),
            (2, [0.97, 0.24, 0.0]),
        ],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0])], "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    out = {
        r["vec_id"]: (r["max_benchmark_sim"], r["contaminated"])
        for r in semantic_decontaminate(corpus, bench, threshold=0.95).collect()
    }
    assert out[0] == (1.0, True)
    assert out[1][1] is False and out[1][0] == 0.0
    assert out[2][1] is True  # cos ~0.971
