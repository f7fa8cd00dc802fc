"""End-to-end training-data curation pipeline — the composition a
100 TB webtext job actually runs: quality features + language-ID +
near-dup survivorship in ONE pass over the corpus.

Each stage is an existing operator (textops.text_stats,
dedup.near_dup_clusters); this module only composes them, so the
physical plan stays: one scan computing all quality/lang columns
JVM-side (whole-stage codegen), the banded LSH equi-join for
candidates, pointer-jumping CC for transitive clusters, and a final
left-semi join — no driver loops, no per-row Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import near_dup_clusters
from .textops import text_stats


def training_mix(
    docs: DataFrame,
    min_tokens: int = 10,
    min_alpha_ratio: float = 0.5,
    max_digit_ratio: float = 0.3,
    langs: Sequence[str] | None = ("de", "en", "es", "fr"),
    dedup_threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    **lsh_kwargs,
) -> DataFrame:
    """(doc_id, pred_lang, n_tokens, n_chars) — documents that survive
    quality gates (token count, alpha ratio, digit ratio), language
    whitelist (``langs=None`` keeps all), and near-duplicate removal
    (cluster survivor only). The kept set is what a tokenizer run
    would consume."""
    stats = text_stats(docs, text_col=text_col, id_col=id_col)
    surv = near_dup_clusters(
        docs, threshold=dedup_threshold, text_col=text_col, id_col=id_col,
        **lsh_kwargs,
    ).where(F.col("is_survivor"))
    kept = (
        stats.join(surv.select(id_col), id_col, "left_semi")
        .where(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("alpha_ratio") >= min_alpha_ratio)
            & (F.col("digit_ratio") <= max_digit_ratio)
        )
    )
    if langs is not None:
        kept = kept.where(F.col("pred_lang").isin(list(langs)))
    return kept.select(id_col, "pred_lang", "n_tokens", "n_chars")


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing — the standard pretraining
    batch-assembly shape: documents are laid out end-to-end in a
    deterministic order (ascending ``id_col``) into one global token
    stream, which is then cut into fixed ``budget``-token sequences;
    a document may straddle a cut (standard GPT-style packing).

    Returns (id, n_tokens, start_offset, pack_id, pack_offset):
      start_offset = exclusive prefix-sum of token counts in id order
      pack_id      = start_offset // budget
      pack_offset  = start_offset %  budget

    Physical plan — a SCALABLE two-pass distributed prefix sum, not a
    global-order window (which would collapse to a single partition):
    range-repartition on id, per-partition running sums via a window
    PARTITIONED by ``spark_partition_id``, plus a tiny per-partition
    total table (#partitions rows) broadcast back for the cross-
    partition offsets. At 10^12 documents both passes stay O(m/P) per
    task; the only driver-visible object is the #partitions-row
    offset dictionary.
    """
    from pyspark.sql.window import Window

    from .textops import token_count

    n = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    base = (
        docs.select(
            F.col(id_col).alias("id"),
            token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        )
        .repartitionByRange(n, "id")
        .withColumn("_pid", F.spark_partition_id())
        # materialized once: the local-cumsum branch and the totals
        # branch must observe the SAME sampled range boundaries
        .localCheckpoint(eager=True)
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = base.withColumn(
        "_local_off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    totals = (
        base.groupBy("_pid")
        .agg(F.sum("n_tokens").alias("_tot"), F.min("id").alias("_min_id"))
    )
    wp = (
        Window.orderBy("_min_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # #partitions rows — the window over it is a deliberate single-task
    # driver-scale step (bounded by the partition count, not the data)
    prefix = totals.withColumn(
        "_base", F.coalesce(F.sum("_tot").over(wp), F.lit(0))
    ).select("_pid", "_base")
    out = (
        local.join(F.broadcast(prefix), "_pid")
        .withColumn("start_offset", F.col("_base") + F.col("_local_off"))
        .select(
            "id",
            "n_tokens",
            "start_offset",
            (F.col("start_offset") / budget).cast("long").alias("pack_id"),
            (F.col("start_offset") % budget).alias("pack_offset"),
        )
    )
    return out


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination — the standard pretraining hygiene
    pass: flag every training document sharing any word ``n``-gram
    with a held-out benchmark/eval set (the 13-gram rule of GPT-3
    appendix C; ``n`` is the knob).

    Returns (doc_id, n_hits, contaminated): n_hits = #distinct
    n-grams of the doc that appear anywhere in the benchmark.

    Physical plan: both sides explode to md5(n-gram) — one scan each,
    all JVM-side — then a **broadcast** equi-join: at 100 TB the
    training side is huge but the benchmark n-gram set is tiny (eval
    suites are MBs), so no shuffle of the corpus ever happens; the
    contaminated flag rides a map-side hash probe.
    """
    from .textops import shingles

    dg = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(shingles(F.col(text_col), n)).alias("g"),
        )
        .select("id", F.md5("g").alias("gh"))
        .distinct()
    )
    bg = (
        benchmark.select(F.explode(shingles(F.col(text_col), n)).alias("g"))
        .select(F.md5("g").alias("gh"))
        .distinct()
    )
    hits = dg.join(F.broadcast(bg), "gh").groupBy("id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def hash_split(
    docs: DataFrame,
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
    salt: str = "split",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment — (doc_id, split).

    split = first bucket whose cumulative weight covers the doc's
    md5(id|salt) position. The comparison is done on the md5 HEX
    PREFIX against precomputed hex thresholds (lowercase hex orders
    lexicographically like the number it encodes), so the assignment
    is reproducible bit-for-bit across engines and runs — no RNG, no
    numeric parsing, stable under repartitioning. One scan, zero
    shuffles, trivially parallel at any scale.
    """
    total = sum(w for _, w in weights)
    cum, thresholds = 0.0, []
    for name, w in weights[:-1]:
        cum += w / total
        # cum >= 1 would format to 9 hex chars and break the 8-char
        # lexicographic compare — None marks "covers everything"
        t = int(cum * 16**8)
        thresholds.append((name, format(t, "08x") if t < 16**8 else None))
    h = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|" + salt))), 1, 8
    )
    expr = F.lit(weights[-1][0])
    for name, hx in reversed(thresholds):
        cond = F.lit(True) if hx is None else (h < hx)
        expr = F.when(cond, name).otherwise(expr)
    return docs.select(F.col(id_col), expr.alias("split"))


def stratified_sample(
    docs: DataFrame,
    frac: float,
    by: str = "lang",
    salt: str = "sample",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sampling: keep ceil(frac * |group|)
    docs per ``by`` group, chosen by md5(id|salt) rank — the
    language/source-balancing step of a training-mix builder.

    Plan: one shuffle on the group key; rank + group count in a
    single window pass. Group cardinality skew (one giant language)
    is the known hazard at scale — for that, pre-aggregate per-group
    counts and turn the rank filter into a per-group threshold join;
    here groups are few and the window form is the clearer plan.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(by).orderBy(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|" + salt)))
    )
    return (
        docs.select(
            F.col(id_col),
            F.col(by),
            F.row_number().over(w).alias("_rn"),
            F.count(F.lit(1)).over(Window.partitionBy(by)).alias("_cnt"),
        )
        .where(F.col("_rn") <= F.ceil(F.lit(frac) * F.col("_cnt")))
        .select(id_col, by)
    )


def chunk_documents(
    docs: DataFrame,
    size: int = 512,
    overlap: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap —
    the long-context preprocessing twin of :func:`pack_sequences`
    (packing joins short docs; chunking splits long ones).

    Returns (doc_id, chunk_id, n_chunk_tokens, chunk_text): chunk k
    covers tokens [k·stride, k·stride + size) with
    stride = size - overlap; the final chunk is the remainder (never
    empty, never duplicated: a doc with <= size tokens yields exactly
    one chunk). One scan, array slicing only — the explode multiplies
    rows by ceil(n/stride), which is the output's inherent size, not
    overhead.
    """
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    from .textops import tokens

    stride = size - overlap
    t = tokens(F.col(text_col))
    n = F.size(t)
    n_chunks = F.when(n <= size, F.lit(1)).otherwise(
        F.ceil((n - F.lit(size)) / F.lit(stride)) + 1
    )
    return (
        docs.select(
            F.col(id_col),
            t.alias("_t"),
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias(
                "chunk_id", "_k"
            ),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.slice(F.col("_t"), F.col("chunk_id") * stride + 1, size).alias(
                "_chunk"
            ),
        )
        .select(
            id_col,
            "chunk_id",
            F.size("_chunk").cast("long").alias("n_chunk_tokens"),
            F.array_join("_chunk", " ").alias("chunk_text"),
        )
    )


def _gram_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int,
) -> DataFrame:
    """(id, bucket) one row per token unigram AND bigram occurrence —
    the DSIR hashed n-gram feature space (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling", §3:
    hashed unigram+bigram bag features). Bucket = first 8 md5 hex
    digits mod ``n_buckets`` (the repo's md5 oracle lane; swap to
    xxhash64 for the scale lane exactly as in dedup.py)."""
    from .textops import tokens

    toks = tokens(F.col(text_col))
    grams = F.concat(
        toks,
        F.zip_with(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    )
    return df.select(
        F.col(id_col).alias("id"), F.explode(grams).alias("gram")
    ).select(
        "id",
        F.pmod(
            F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("long"),
            F.lit(n_buckets),
        ).alias("bucket"),
    )


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """(doc_id, n_grams, log_weight) — per-raw-document DSIR
    importance log-weight log p_target(doc)/p_raw(doc) under hashed
    unigram+bigram bag-of-buckets multinomials with add-1 smoothing
    (Xie et al. 2023 §3; the resampling step is then a weighted
    :func:`stratified_sample`-style draw or a top-k cut on
    ``log_weight``).

    Physical plan: both corpora explode once into (id, bucket); two
    ``n_buckets``-row count aggregates become ONE broadcast log-ratio
    table; every raw doc's score is a broadcast equi-join + one
    partial-agg groupBy(sum). No driver loop, no per-row Python; the
    bucket table is O(n_buckets) regardless of corpus size."""
    raw_b = _gram_buckets(raw, text_col, id_col, n_buckets).persist()
    tgt_b = _gram_buckets(target, text_col, id_col, n_buckets)

    def _dist(b: DataFrame, name: str) -> DataFrame:
        counts = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
        total = counts.agg(F.sum("c").alias("tot"))
        return (
            counts.crossJoin(F.broadcast(total))
            .select(
                "bucket",
                (
                    F.log((F.col("c") + 1.0))
                    - F.log(F.col("tot") + F.lit(float(n_buckets)))
                ).alias(name),
            )
        )

    # all n_buckets rows, including zero-count buckets on either side
    all_buckets = raw.sparkSession.range(n_buckets).select(
        F.col("id").alias("bucket")
    )
    raw_tot = raw_b.count()  # materializes the persist; scalar reused below
    # zero-count buckets still carry smoothed mass log(1/(tot+B)) —
    # two one-row totals as driver scalars make the coalesce exact
    tgt_tot = tgt_b.count()
    import math

    lp_t0 = math.log(1.0) - math.log(tgt_tot + float(n_buckets))
    lp_r0 = math.log(1.0) - math.log(raw_tot + float(n_buckets))
    ratio = (
        all_buckets.join(_dist(tgt_b, "lp_t"), "bucket", "left")
        .join(_dist(raw_b, "lp_r"), "bucket", "left")
        .select(
            "bucket",
            (
                F.coalesce("lp_t", F.lit(lp_t0))
                - F.coalesce("lp_r", F.lit(lp_r0))
            ).alias("log_ratio"),
        )
    )
    out = (
        raw_b.join(F.broadcast(ratio), "bucket")
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("log_ratio").alias("log_weight"),
        )
    )
    return out


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, max_benchmark_sim, contaminated) — embedding-level
    benchmark decontamination: a corpus item is contaminated when its
    cosine similarity to ANY benchmark embedding reaches ``threshold``
    (the semantic complement of the n-gram ``decontaminate``; the
    pair is the standard eval-leakage sweep for pretraining sets).

    Physical plan: benchmark side broadcast (the precondition — eval
    sets are small), corpus scanned once, per-item max over the
    broadcast side; no shuffle at all on the corpus. For
    benchmark sets too large to broadcast, run
    ``similarity.lsh_self_join`` on the union instead."""
    from .similarity import cosine

    b = benchmark.select(
        F.col(id_col).alias("_bid"), F.col(vec_col).alias("_bv")
    )
    scored = (
        corpus.select(F.col(id_col), F.col(vec_col).alias("_cv"))
        .join(F.broadcast(b))
        .groupBy(id_col)
        .agg(F.max(F.round(cosine(F.col("_cv"), F.col("_bv")), 6)).alias(
            "max_benchmark_sim"
        ))
    )
    return scored.select(
        id_col,
        "max_benchmark_sim",
        (F.col("max_benchmark_sim") >= threshold).alias("contaminated"),
    )
