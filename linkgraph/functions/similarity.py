"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and a deterministic
random-hyperplane LSH bucketed variant as the scale path. All math is
JVM-side higher-order functions (zip_with/aggregate) — no Python UDFs.

Scale notes: brute force is queries × corpus — fine when the query
side broadcasts (|Q| small). The LSH path buckets the corpus once
(one narrow scan + write), then probes only matching buckets:
candidate set shrinks by ~2^bits, turning the cross join into an
equi-join on ``bucket``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.greatest(l2_norm(a) * l2_norm(b), F.lit(1e-300))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine:
    (query_id, neighbor_id, score [, rank]). Excludes self-pairs.

    The query side is broadcast (it must be small); scoring is one
    pass over the corpus; top-k is a per-query window on
    (score DESC, neighbor_id ASC) — deterministic under ties when
    ``round_to`` quantizes the score first.
    """
    from pyspark.sql.window import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("score_raw"),
        )
    )
    score = (
        F.round(F.col("score_raw"), round_to) if round_to is not None else F.col("score_raw")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.select("query_id", "neighbor_id", score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane: component j =
    sin(1e4 * (plane * dim + j + 1)) — seedless, reproducible across
    engines and cluster sizes."""
    v = [math.sin(1e4 * (plane * dim + j + 1)) for j in range(dim)]
    n = math.sqrt(sum(x * x for x in v)) or 1.0
    return [x / n for x in v]


def lsh_bucket(vec: Column, dim: int, bits: int = 8) -> Column:
    """Random-hyperplane LSH bucket id (0..2^bits-1) for a vector."""
    acc = F.lit(0)
    for p in range(bits):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, p)])
        acc = acc + F.when(dot(vec, plane) > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return acc


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's
    LSH bucket (plus Hamming-1 neighbor buckets for recall).
    ``round_to`` quantizes scores before ranking so the (score DESC,
    neighbor_id ASC) order is deterministic cross-engine (same device
    as :func:`cosine_topk`; the DuckDB oracle mirrors it)."""
    from pyspark.sql.window import Window

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        lsh_bucket(F.col(vec_col), dim, bits).alias("bucket"),
    )
    probe_buckets = F.array(
        F.col("b0"), *[F.col("b0").bitwiseXOR(F.lit(1 << i)) for i in range(bits)]
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            lsh_bucket(F.col(vec_col), dim, bits).alias("b0"),
        )
        .select("query_id", "qv", F.explode(probe_buckets).alias("bucket"))
    )
    score = cosine(F.col("qv"), F.col("cv"))
    if round_to is not None:
        score = F.round(score, round_to)
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", score.alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _sqdist(vec: Column, cent: Column) -> Column:
    """Squared euclidean distance between two array columns, as a
    sequential left fold (same summation order as the DuckDB oracle's
    list_reduce)."""
    return F.aggregate(
        F.zip_with(
            vec,
            cent,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cents_relation(spark, cents: list[tuple[int, list[float]]]) -> DataFrame:
    """The centroid table as a ONE-ROW broadcastable relation:
    ``cents: array<struct<cid bigint, c array<double>>>`` sorted by
    cid. At 100 TB this is the load-bearing physical choice: K
    centroids ride the plan as broadcast DATA (one small exchange),
    not as K literal expressions — plan size stays O(1) in K, so
    K ~ 10⁴-10⁵ cells (Abbas et al. used 50k) is a few MB of
    broadcast, where the previous literal-expression form exploded
    the analyzed plan at K beyond a few dozen."""
    rows = [(int(cid), [float(x) for x in c]) for cid, c in cents]
    df = spark.createDataFrame(rows, "cid bigint, c array<double>")
    return df.agg(
        F.array_sort(F.collect_list(F.struct("cid", "c"))).alias("cents")
    )


def _cell_dists(vec: Column) -> Column:
    """array<struct<d,cid>> of rounded distances from ``vec`` to every
    centroid in the broadcast ``cents`` column. Distances are rounded
    to 6 decimals and ties break on the lower centroid id (struct
    ordering) — deterministic cross-engine, identical values to the
    pre-round-3 literal-expression form."""
    return F.transform(
        F.col("cents"),
        lambda s: F.struct(
            F.round(_sqdist(vec, s["c"]), 6).alias("d"), s["cid"].alias("cid")
        ),
    )


def _with_nearest(
    df: DataFrame,
    cents_rel: DataFrame,
    vec: Column,
    out: str = "cluster",
) -> DataFrame:
    """Attach argmin-centroid cell ids: crossJoin a BROADCAST one-row
    centroid relation (no shuffle — every task gets the array once),
    then a narrow ``array_min`` projection. No Python, no per-row
    shuffle; the groupBy-free analog of the textbook broadcast-k-means
    assignment. This is the EXACT lane (sequential-fold summation
    order mirrors the DuckDB oracle); Catalyst evaluates the
    higher-order functions interpretively, so per-row cost is
    O(K·dim) slow-scalar — measured ~1e6 mult-adds/s/core. Use
    :func:`_assign_np` (Arrow + BLAS, ~1000× that) when K·dim is
    large; :func:`_auto_assign` picks."""
    return df.crossJoin(F.broadcast(cents_rel)).withColumn(
        out, F.array_min(_cell_dists(vec))["cid"]
    ).drop("cents")


# Above this many distance terms per row (K·dim), interpreted HOF
# evaluation dominates the job and the vectorized Arrow lane wins by
# orders of magnitude. 8 centroids × 64 dims = 512 stays exact-lane
# (all oracle entry queries); SemDeDup-scale K (10³-10⁵) goes BLAS.
NP_ASSIGN_MIN_TERMS = 4096


def _assign_np(
    df: DataFrame,
    cents: list[tuple[int, list[float]]],
    vec_col: str,
    out: str = "cluster",
) -> DataFrame:
    """Vectorized argmin-centroid assignment: ``mapInPandas`` Arrow
    batches, distances as one BLAS matmul per batch
    (‖x‖² − 2·X·Cᵀ + ‖c‖²), rounded to 6 decimals, ties to the lower
    centroid id (argmin over ascending-cid columns). The centroid
    matrix ships once per executor via ``SparkContext.broadcast`` —
    K×dim×8 bytes, a few MB even at the 50k cells Abbas et al. used.

    Scale lane: summation order differs from the exact lane's
    sequential fold, so distances can diverge at ~1e-12 — after
    round(·, 6) assignments agree in practice but are not
    bit-guaranteed; oracle-hashed entry queries stay on the exact
    lane (NP_ASSIGN_MIN_TERMS gate)."""
    import numpy as np

    spark = df.sparkSession
    cids_l = sorted(int(cid) for cid, _ in cents)
    by_id = {int(cid): c for cid, c in cents}
    C = np.asarray([by_id[cid] for cid in cids_l], dtype="float64")
    cids = np.asarray(cids_l, dtype="int64")
    bc = spark.sparkContext.broadcast((cids, C, (C * C).sum(axis=1)))

    from pyspark.sql.types import LongType, StructField, StructType

    in_fields = list(df.schema.fields)
    cols = [f.name for f in in_fields]
    schema = StructType(in_fields + [StructField(out, LongType())])

    def fn(batches):
        import pandas as pd

        cids_b, C_b, cn_b = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(
                [np.asarray(v, dtype="float64") for v in pdf[vec_col]]
            )
            d = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C_b.T) + cn_b[None, :]
            idx = np.round(d, 6).argmin(axis=1)  # first min = lowest cid
            res = pdf[cols].copy()
            res[out] = cids_b[idx]
            yield res

    return df.mapInPandas(fn, schema)


def _auto_assign(
    df: DataFrame,
    cents: list[tuple[int, list[float]]],
    vec_col: str,
    out: str = "cluster",
) -> DataFrame:
    """Pick the assignment lane by K·dim: exact HOF expression under
    NP_ASSIGN_MIN_TERMS (oracle-parity), Arrow+BLAS above it."""
    dim = len(cents[0][1]) if cents else 0
    if len(cents) * dim >= NP_ASSIGN_MIN_TERMS:
        return _assign_np(df, cents, vec_col, out=out)
    rel = _cents_relation(df.sparkSession, cents)
    return _with_nearest(
        df, rel, F.transform(F.col(vec_col), lambda x: x.cast("double")), out=out
    )


def kmeans_fit(
    corpus: DataFrame,
    n_centroids: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic Lloyd's k-means: init = the ``n_centroids``
    lowest-id vectors; each iteration assigns by rounded squared
    distance and recomputes per-dimension means (rounded to 9
    decimals so the centroid table is bit-stable across shuffle
    orders); an emptied cluster keeps its previous centroid.

    The centroid table is O(K * dim) and lives on the driver between
    iterations; each assignment pass broadcasts it as a one-row
    relation (``_cents_relation``) so the per-vector argmin is a
    narrow whole-stage-codegen projection — no shuffle, no Python,
    and plan size independent of K (scales to the 10⁴-10⁵ cells
    SemDeDup needs at 100 TB). Document rule: n_centroids ∝ √corpus.
    """
    spark = corpus.sparkSession
    base = corpus.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).persist()
    init = base.orderBy("id").limit(n_centroids).collect()
    cents = [(r["id"], [float(x) for x in r["v"]]) for r in init]
    for _ in range(iters):
        assigned = _auto_assign(base, cents, "v", out="cid").select("v", "cid")
        means = (
            assigned.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.round(F.avg("x"), 9).alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("c")
            )
            .collect()
        )
        new = {r["cid"]: [float(x) for x in r["c"]] for r in means}
        cents = [(cid, new.get(cid, c)) for cid, c in cents]
    base.unpersist()
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 8,
    kmeans_iters: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """IVF approximate nearest neighbors: partition the corpus into
    ``n_centroids`` Voronoi cells (deterministic k-means above), then
    score each query only against the ``nprobe`` nearest cells —
    (query_id, neighbor_id, score, rank).

    Physical plan: the centroid table broadcasts as a one-row array
    relation (``_cents_relation``), so cell assignment is a narrow
    projection (whole-stage codegen, no shuffle) whose plan size is
    independent of K; the probe is an equi-join on ``cluster``
    (candidate set ~ corpus * nprobe / n_centroids, never queries ×
    corpus); top-k is a per-query window. At 100 TB the assigned
    corpus would be written once, bucketed by ``cluster``, and probed
    with partition pruning.
    """
    from pyspark.sql.window import Window

    cents = kmeans_fit(
        corpus,
        n_centroids=n_centroids,
        iters=kmeans_iters,
        id_col=id_col,
        vec_col=vec_col,
    )
    spark = corpus.sparkSession
    cents_rel = _cents_relation(spark, cents)
    c = _auto_assign(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
        ),
        cents,
        "cv",
    )
    qv_d = F.transform(F.col("qv"), lambda x: x.cast("double"))
    q = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .crossJoin(F.broadcast(cents_rel))
        .select(
            "query_id",
            "qv",
            F.explode(
                F.slice(F.array_sort(_cell_dists(qv_d)), 1, nprobe)
            ).alias("pr"),
        )
        .select("query_id", "qv", F.col("pr.cid").alias("cluster"))
    )
    score = cosine(F.col("qv"), F.col("cv"))
    if round_to is not None:
        score = F.round(score, round_to)
    scored = (
        c.join(F.broadcast(q), "cluster")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", score.alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def lsh_self_join(
    corpus: DataFrame,
    dim: int,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float | None = None,
    round_to: int | None = 6,
) -> DataFrame:
    """Corpus-vs-corpus ANN candidate pairs — the embedding-dedup shape
    a 100 TB pipeline actually runs: (id_a, id_b, score) with
    id_a < id_b, scored only for pairs whose buckets match exactly or
    at Hamming distance 1.

    Physical plan: the corpus is bucketed ONCE (one narrow scan); side
    A carries each vector under its own bucket, side B replicates each
    vector to its bucket + the ``bits`` Hamming-1 probe buckets
    (write amplification = bits+1, NOT corpus²); the join is an
    equi-join on ``bucket``. Every qualifying pair is found exactly
    once from the A-side owner bucket: (a,b) with buckets at distance
    1 matches when B's probe of b lands in a's bucket, and distinct()
    collapses the symmetric double-count of same-bucket pairs.
    Bucket ids are md5-free integer hashes of deterministic
    hyperplanes, so the pair table is reproducible across runs and
    cluster sizes (and DuckDB-oracle-able)."""
    base = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        lsh_bucket(F.col(vec_col), dim, bits).alias("b0"),
    )
    a = base.select("id", "v", F.col("b0").alias("bucket"))
    probe_buckets = F.array(
        F.col("b0"), *[F.col("b0").bitwiseXOR(F.lit(1 << i)) for i in range(bits)]
    )
    b = base.select(
        "id", "v", F.explode(probe_buckets).alias("bucket")
    )
    score = cosine(F.col("va"), F.col("vb"))
    if round_to is not None:
        score = F.round(score, round_to)
    pairs = (
        a.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket")
        .join(
            b.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket"),
            "bucket",
        )
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", score.alias("score"))
        .distinct()
    )
    if threshold is not None:
        pairs = pairs.where(F.col("score") >= threshold)
    return pairs


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, qvec ARRAY<TINYINT>, scale DOUBLE) — symmetric per-
    vector int8 quantization: q_i = round(127 · x_i / max|x|),
    x_i ≈ q_i · scale with scale = max|x| / 127.

    The standard ANN memory/bandwidth lever: a float32 corpus shrinks
    4× (float64 arrays 8×) before shuffling or caching; at 100 TB the
    quantized corpus is the one that fits in executor memory. Pure
    column expressions. Vectors that are all zeros get scale 0 and a
    zero qvec (dequantizes exactly)."""
    v = F.col(vec_col)
    amax = F.aggregate(
        F.transform(v, lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(0.0))
    qvec = F.transform(
        v,
        lambda x: F.when(amax > 0, F.round(x.cast("double") * 127.0 / amax))
        .otherwise(F.lit(0.0))
        .cast("tinyint"),
    )
    return df.select(F.col(id_col), qvec.alias("qvec"), scale.alias("scale"))


def quantized_cosine_topk(
    qcorpus: DataFrame,
    qqueries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact-within-quantization top-k by cosine over int8 vectors:
    (query_id, neighbor_id, score, rank). Same plan shape as
    :func:`cosine_topk` (broadcast queries, one corpus pass, per-query
    window); the integer dot product is the hot loop — scale factors
    cancel in the cosine, so scores depend on the int8 codes only."""
    from pyspark.sql.window import Window

    q = qqueries.select(
        F.col(id_col).alias("query_id"), F.col("qvec").alias("qv")
    )
    c = qcorpus.select(
        F.col(id_col).alias("neighbor_id"), F.col("qvec").alias("cv")
    )
    idot = F.aggregate(
        F.zip_with(
            F.col("qv"), F.col("cv"), lambda a, b: a.cast("long") * b.cast("long")
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    inorm = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(col, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                idot
                / F.greatest(
                    inorm(F.col("qv")) * inorm(F.col("cv")), F.lit(1e-300)
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return scored.select(
        "query_id", "neighbor_id", "score", F.row_number().over(w).alias("rank")
    ).where(F.col("rank") <= k)


def semantic_near_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_centroids: int | None = None,
    kmeans_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """(id_a, id_b, score) — embedding pairs in the SAME k-means cell
    with cosine >= threshold, id_a < id_b. The candidate-generation
    step of SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient
    learning at web-scale through semantic deduplication"): cluster
    first, then compare only within cells, so the join is an equi-join
    on ``cluster`` (candidate volume ~ Σ|cell|², never corpus²).
    Pairs split across cells are missed by construction — the
    method's documented approximation.

    ``n_centroids=None`` applies the scale rule K = ceil(√n): the
    within-cell candidate volume is then ~n·(n/K) = n^1.5 in
    expectation (Abbas et al. used 50k cells at web scale). The
    centroid table broadcasts as a one-row array relation — plan size
    O(1) in K, assignment shuffle-free; the pair join shuffles once
    on ``cluster``."""
    if n_centroids is None:
        n_centroids = max(2, math.isqrt(max(corpus.count(), 1) - 1) + 1)
    cents = kmeans_fit(
        corpus,
        n_centroids=n_centroids,
        iters=kmeans_iters,
        id_col=id_col,
        vec_col=vec_col,
    )
    assigned = _auto_assign(
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")),
        cents,
        "v",
    )
    a = assigned.select(
        "cluster", F.col("id").alias("id_a"), F.col("v").alias("va")
    )
    b = assigned.select(
        "cluster", F.col("id").alias("id_b"), F.col("v").alias("vb")
    )
    score = cosine(F.col("va"), F.col("vb"))
    if round_to is not None:
        score = F.round(score, round_to)
    return (
        a.join(b, "cluster")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", score.alias("score"))
        .where(F.col("score") >= threshold)
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_centroids: int | None = None,
    kmeans_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster, is_survivor) — SemDeDup survivorship:
    :func:`semantic_near_pairs` edges -> connected components ->
    keep the minimum id of every near-dup group (the same transitive
    closure + min-id-survivor contract as ``dedup.near_dup_clusters``,
    so downstream curation composes identically). Abbas et al. keep
    the cluster member FARTHEST from the centroid; min-id is this
    engine's deterministic, oracle-hashable choice (documented
    divergence)."""
    from ..graph import LinkGraph
    from ..operators.components import connected_components

    pairs = semantic_near_pairs(
        corpus, threshold, n_centroids, kmeans_iters, id_col, vec_col
    )
    verts = corpus.select(F.col(id_col).cast("long").alias("id")).distinct()
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
