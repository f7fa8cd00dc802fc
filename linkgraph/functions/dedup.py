"""Deduplication operators for corpus pipelines.

Exact (hash-groupBy), fingerprint (token-set), MinHash+LSH banded
near-dup, SimHash radius, and n-gram Jaccard verification. All
hashing is md5 (engine-portable; the scale path may swap to xxhash64
JVM-side without changing shapes). No Python UDFs anywhere.

Scale notes (100 TB): exact/fingerprint dedup is one shuffle on the
hash key — partial aggregation makes the map side emit one row per
distinct hash per partition. LSH banding turns the quadratic
candidate problem into a per-band shuffle join on ``(band, key)``;
band keys are high-entropy md5s, so the shuffle is skew-free by
construction except for pathological all-identical corpora, which AQE
skew-join splitting absorbs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import hamming64, minhash_bands, simhash_table, tokens


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(text_hash, keep_id, n_dups): one row per distinct text;
    keep_id = min id of the group (deterministic survivor)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col).alias("id"))
        .groupBy("text_hash")
        .agg(F.min("id").alias("keep_id"), (F.count(F.lit(1)) - 1).alias("n_dups"))
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The deduplicated corpus: keep the min-id row per distinct text."""
    keep = exact_dedup_groups(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def fingerprint_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Token-set fingerprint groups — catches reorderings/repeats."""
    from .textops import fingerprint

    return (
        df.select(fingerprint(F.col(text_col)).alias("fp"), F.col(id_col).alias("id"))
        .groupBy("fp")
        .agg(F.min("id").alias("keep_id"), (F.count(F.lit(1)) - 1).alias("n_dups"))
    )


def lsh_band_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bands: int = 4,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    hasher: str = "md5",
) -> DataFrame:
    """(id, band, key) — one row per (doc, band); join key for LSH.
    ``hasher="xxhash64"`` selects the BIGINT-key scale lane (see
    textops.minhash_signature)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(
            minhash_bands(F.col(text_col), num_bands, rows_per_band, shingle_n, hasher)
        ).alias("b"),
    ).select("id", F.col("b.band").alias("band"), F.col("b.key").alias("key"))


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bands: int = 4,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    hasher: str = "md5",
) -> DataFrame:
    """(id_a, id_b) with id_a < id_b: docs sharing ≥1 LSH band."""
    bt = lsh_band_table(
        df, text_col, id_col, num_bands, rows_per_band, shingle_n, hasher
    )
    a = bt.select("band", "key", F.col("id").alias("id_a"))
    b = bt.select("band", "key", F.col("id").alias("id_b"))
    return (
        a.join(b, ["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact token-set Jaccard for candidate pairs:
    (id_a, id_b, jaccard DOUBLE). Verification stage after LSH."""
    sets = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(tokens(F.col(text_col))).alias("toks"),
    )
    return (
        pairs.join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("toks", "ta"), "id_a")
        .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("toks", "tb"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("ta", "tb"))
                / F.greatest(F.size(F.array_union("ta", "tb")), F.lit(1))
            ).cast("double").alias("jaccard"),
        )
    )


def near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    **lsh_kwargs,
) -> DataFrame:
    """LSH candidates verified by exact Jaccard ≥ threshold."""
    cand = minhash_candidate_pairs(df, text_col, id_col, **lsh_kwargs)
    return jaccard_pairs(df, cand, text_col, id_col).where(
        F.col("jaccard") >= threshold
    )


def hash64_near_pairs(
    hashes: DataFrame,
    max_hamming: int = 3,
    id_col: str = "id",
    hash_col: str = "h",
) -> DataFrame:
    """Generic 64-bit-fingerprint near-dup pairs: (id_a, id_b,
    hamming) for any (id, hash BIGINT) table — text simhashes, image
    perceptual hashes, anything 64-bit. Blocking: candidate pairs
    must share one of the 4 16-bit quadrants (any pair within
    hamming ≤3 shares ≥1 exact quadrant — pigeonhole), so the join is
    an equi-join, never a cross join."""
    sh = hashes.select(F.col(id_col).alias("id"), F.col(hash_col).alias("sh"))
    quads = sh.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.shiftright(F.col("sh"), q * 16).bitwiseAND(F.lit(0xFFFF)).alias("v"),
                    )
                    for q in range(4)
                ]
            )
        ).alias("b"),
    ).select("id", "sh", F.col("b.q").alias("q"), F.col("b.v").alias("v"))
    a = quads.select("q", "v", F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = quads.select("q", "v", F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        a.join(b, ["q", "v"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming64(F.col("sh_a"), F.col("sh_b")).alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash near-dups: (id_a, id_b, hamming) — the text
    instantiation of :func:`hash64_near_pairs`."""
    # simhash_table hashes each token once (vs 64× in the Column form)
    sh = (
        simhash_table(df, text_col, id_col, out_col="sh")
        .withColumnRenamed(id_col, "id")
    )
    return hash64_near_pairs(sh, max_hamming, id_col="id", hash_col="sh")


def span_hash_table(
    df: DataFrame,
    n: int = 4,
    stride: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, k, span_text, h): md5 of each ``n``-token span starting at
    token offset ``k*stride`` (non-overlapping when stride == n).

    This is the substring-dedup shape of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"),
    approximated at fixed span granularity so it stays a hash-groupBy
    over one corpus scan instead of a suffix array. Empty docs emit
    one empty span (md5 of "") — deterministic across engines.

    Scale: one scan, explode fan-out = ~tokens/stride rows per doc,
    hash keys are high-entropy md5 → the downstream groupBy/join on
    ``h`` is skew-free by construction.
    """
    t = df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("toks"))
    nspan = F.greatest(
        F.lit(1), F.ceil(F.size("toks") / F.lit(float(stride))).cast("int")
    )
    return (
        t.select("id", "toks", F.explode(F.sequence(F.lit(0), nspan - 1)).alias("k"))
        .select(
            "id",
            "k",
            F.array_join(
                F.slice("toks", F.col("k") * stride + 1, n), " "
            ).alias("span_text"),
        )
        .withColumn("h", F.md5("span_text"))
    )


def duplicated_span_stats(
    df: DataFrame,
    n: int = 4,
    stride: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc duplicated-span quality signal:
    (doc_id, n_spans, n_dup_spans, dup_frac) where a span is
    "duplicated" when its hash occurs >1 time corpus-wide.

    High dup_frac docs are boilerplate/templated — the standard
    pretraining-corpus filter signal. Two shuffles total: groupBy(h)
    for corpus counts (map-side partial agg), then groupBy(id)."""
    sh = span_hash_table(df, n, stride, text_col, id_col)
    counts = sh.groupBy("h").agg(F.count(F.lit(1)).alias("_c"))
    return (
        sh.join(counts, "h")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("_c") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_spans"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_spans",
            "n_dup_spans",
            (F.col("n_dup_spans") / F.col("n_spans")).cast("double").alias("dup_frac"),
        )
    )


def drop_duplicated_spans(
    df: DataFrame,
    n: int = 4,
    stride: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The span-deduplicated corpus: (doc_id, text) where every span
    whose hash repeats corpus-wide is removed EXCEPT its globally
    first occurrence (min (doc_id, k) — deterministic), and each doc's
    surviving spans are re-joined in original order. Lee et al. 2022
    remove-all-but-one policy at span granularity."""
    sh = span_hash_table(df, n, stride, text_col, id_col)
    first = sh.groupBy("h").agg(
        F.min(F.struct("id", "k")).alias("_first"),
        F.count(F.lit(1)).alias("_c"),
    )
    kept = sh.join(first, "h").where(
        (F.col("_c") == 1)
        | ((F.col("id") == F.col("_first.id")) & (F.col("k") == F.col("_first.k")))
    )
    return (
        kept.groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("k", "span_text"))),
                    lambda s: s.span_text,
                ),
                " ",
            ).alias(text_col)
        )
        .select(F.col("id").alias(id_col), text_col)
    )


def near_dup_clusters(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    **lsh_kwargs,
) -> DataFrame:
    """(doc_id, cluster BIGINT, is_survivor BOOLEAN) — transitive
    near-duplicate clusters: LSH-verified pairs (``near_dup_pairs``)
    become an undirected edge table, connected components over it
    assign each doc the cluster's minimum doc_id, and that minimum is
    the deterministic survivor. Docs with no near-dup are their own
    singleton cluster (and survivor).

    This is the canonical web-scale dedup shape (the reference's
    per-group iteration is a driver loop): candidate generation never
    leaves the banded equi-join, and the transitive closure is the
    pointer-jumping CC operator — O(log n) rounds — rather than a
    quadratic group-merge. Downstream keeps ``is_survivor`` rows.
    """
    from ..graph import LinkGraph
    from ..operators.components import connected_components

    pairs = near_dup_pairs(df, threshold, text_col, id_col, **lsh_kwargs)
    verts = df.select(F.col(id_col).cast("long").alias("id")).distinct()
    edges = pairs.select(
        F.col("id_a").cast("long").alias("src"),
        F.col("id_b").cast("long").alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    g = LinkGraph(verts, edges, directed=False)
    labels = connected_components(g)
    return labels.select(
        F.col("id").alias(id_col),
        F.col("component").alias("cluster"),
        (F.col("id") == F.col("component")).alias("is_survivor"),
    )
