"""textops / dedup / similarity unit tests (engine-side semantics;
cross-engine oracle parity is covered by tools/check_oracle.py and the
driver's CORRECTNESS gate)."""

import pytest
from pyspark.sql import functions as F

from linkgraph.functions import dedup as ddp
from linkgraph.functions import similarity as sim
from linkgraph.functions import textops as tx


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tokens_and_quality(spark):
    df = docs_df(spark, [(1, "  Hello   world 42 "), (2, "")])
    out = df.select(
        "doc_id",
        tx.token_count(F.col("text")).alias("n"),
        tx.quality_features(F.col("text"))["digit_ratio"].alias("dr"),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["n"] == 3
    assert by_id[2]["n"] == 0
    assert by_id[1]["dr"] == pytest.approx(2 / 19)


def test_lang_id(spark):
    df = docs_df(
        spark,
        [
            (1, "the cat and the dog of a house"),
            (2, "der hund und die katze ist gut"),
            (3, "le chien et la maison des les fleurs"),
            (4, "xyz qqq zzz"),
        ],
    )
    out = {r["doc_id"]: r["l"] for r in df.select("doc_id", tx.lang_id(F.col("text")).alias("l")).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_fingerprint_order_insensitive(spark):
    df = docs_df(spark, [(1, "b a c a"), (2, "a b c"), (3, "a b d")])
    fp = {r["doc_id"]: r["f"] for r in df.select("doc_id", tx.fingerprint(F.col("text")).alias("f")).collect()}
    assert fp[1] == fp[2] != fp[3]


def test_exact_dedup(spark):
    df = docs_df(spark, [(1, "same text"), (2, "same text"), (3, "other")])
    groups = {r["keep_id"]: r["n_dups"] for r in ddp.exact_dedup_groups(df).collect()}
    assert groups == {1: 1, 3: 0}
    assert sorted(r["doc_id"] for r in ddp.exact_dedup(df).collect()) == [1, 3]


def test_minhash_near_dup(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different words nothing shared here at all whatsoever ok fine"
    df = docs_df(spark, [(1, base), (2, near), (3, far), (4, base)])
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ddp.near_dup_pairs(df, threshold=0.5).collect()
    }
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0
    assert (1, 2) in pairs and 0.5 <= pairs[(1, 2)] < 1.0
    assert not any(3 in p for p in pairs)


def test_simhash_near_dup(spark):
    base = " ".join(f"word{i}" for i in range(40))
    near = base.replace("word7 ", "word7x ")
    far = " ".join(f"other{i}" for i in range(40))
    df = docs_df(spark, [(1, base), (2, near), (3, far), (4, base)])
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in ddp.simhash_near_dup_pairs(df, max_hamming=8).collect()
    }
    assert pairs.get((1, 4)) == 0
    assert (1, 2) in pairs and pairs[(1, 2)] <= 8
    assert (1, 3) not in pairs and (2, 3) not in pairs


def emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_cosine_topk_exact(spark):
    df = emb_df(spark, [[1, 0, 0], [0.9, 0.1, 0], [0, 1, 0], [-1, 0, 0]])
    top = sim.cosine_topk(df, df.where(F.col("vec_id") == 0), k=2)
    rows = sorted(
        (r["rank"], r["neighbor_id"]) for r in top.collect()
    )
    assert rows == [(1, 1), (2, 2)]


def test_lsh_topk_self_consistent(spark):
    import math

    vecs = [
        [math.sin(i * 7 + j) for j in range(16)] for i in range(50)
    ]
    df = emb_df(spark, vecs)
    q = df.where(F.col("vec_id") < 3)
    exact = sim.cosine_topk(df, q, k=5, round_to=None)
    approx = sim.lsh_topk(df, q, dim=16, k=5, bits=6)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    # LSH with hamming-1 probing should recover a solid fraction of
    # the exact top-5 and never return self-pairs
    assert len(a & e) >= len(e) // 2
    assert all(q != n for q, n in a)


def test_near_dup_clusters_transitive(spark):
    # 1≈2 and 2≈4 (and 1≈4 exact) chain into one cluster; 3 is a
    # singleton; survivor = min doc_id of the cluster.
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different words nothing shared here at all whatsoever ok fine"
    df = docs_df(spark, [(1, base), (2, near), (3, far), (4, base)])
    rows = {
        r["doc_id"]: (r["cluster"], r["is_survivor"])
        for r in ddp.near_dup_clusters(df, threshold=0.5).collect()
    }
    assert rows == {
        1: (1, True),
        2: (1, False),
        3: (3, True),
        4: (1, False),
    }


def test_training_mix_composition(spark):
    from linkgraph.functions.pipeline import training_mix

    base = "the quick brown fox jumps over the lazy dog again and again today"
    df = docs_df(
        spark,
        [
            (1, base),                              # kept: en, survivor
            (2, base.replace("today", "tomorrow")), # near-dup of 1 -> dropped
            (3, "1234 5678 90 12 345 678 90 123 456 789"),  # digits -> dropped
            (4, "too short"),                       # < 10 tokens -> dropped
        ],
    )
    kept = training_mix(df, min_tokens=10, dedup_threshold=0.5).collect()
    assert [r["doc_id"] for r in kept] == [1]
    assert kept[0]["pred_lang"] == "en"


# ---------------------------------------------------------- pack_sequences
def test_pack_sequences_prefix_sum(spark):
    from linkgraph.functions.pipeline import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * (3 + i % 7))) for i in range(200)],
        "doc_id long, text string",
    )
    out = pack_sequences(docs, budget=16).orderBy("id").collect()
    run = 0
    for r in out:
        assert r["start_offset"] == run
        assert r["pack_id"] == run // 16
        assert r["pack_offset"] == run % 16
        run += r["n_tokens"]
    assert len(out) == 200


def test_pack_sequences_blank_docs_zero_tokens(spark):
    from linkgraph.functions.pipeline import pack_sequences

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "   "), (3, "d e")], "doc_id long, text string"
    )
    rows = {r["id"]: r for r in pack_sequences(docs, budget=4).collect()}
    assert rows[2]["n_tokens"] == 0
    assert rows[3]["start_offset"] == 3
    assert rows[3]["pack_id"] == 0 and rows[3]["pack_offset"] == 3
