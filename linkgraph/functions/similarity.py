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


def _sqdist(vec: Column, lit_vec: list[float]) -> Column:
    """Squared euclidean distance to a literal centroid, as a
    sequential left fold (same summation order as the DuckDB oracle's
    list_reduce)."""
    c = F.array(*[F.lit(float(x)) for x in lit_vec])
    return F.aggregate(
        F.zip_with(
            vec,
            c,
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _nearest_centroid(vec: Column, cents: list[tuple[int, list[float]]]) -> Column:
    """Argmin cluster id over literal centroids. Distances are rounded
    to 6 decimals before comparison and ties break on the lower
    centroid id (array_min over (dist, cid) structs) — deterministic
    cross-engine."""
    structs = [
        F.struct(
            F.round(_sqdist(vec, c), 6).alias("d"), F.lit(int(cid)).alias("cid")
        )
        for cid, c in cents
    ]
    return F.array_min(F.array(*structs))["cid"]


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
    iterations (the standard broadcast-k-means shape — the per-vector
    assignment is a pure column expression, no join); everything
    per-row stays JVM-side.
    """
    base = corpus.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).persist()
    init = base.orderBy("id").limit(n_centroids).collect()
    cents = [(r["id"], [float(x) for x in r["v"]]) for r in init]
    for _ in range(iters):
        assigned = base.select(
            "v", _nearest_centroid(F.col("v"), cents).alias("cid")
        )
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

    Physical plan: the centroid table is tiny and rides in the plan as
    literals, so cell assignment is a narrow projection (whole-stage
    codegen, no shuffle); the probe is an equi-join on ``cluster``
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
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _nearest_centroid(
            F.transform(F.col(vec_col), lambda x: x.cast("double")), cents
        ).alias("cluster"),
    )
    qv_d = F.transform(F.col("qv"), lambda x: x.cast("double"))
    probe_structs = F.array(
        *[
            F.struct(
                F.round(_sqdist(qv_d, cv), 6).alias("d"),
                F.lit(int(cid)).alias("cid"),
            )
            for cid, cv in cents
        ]
    )
    q = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .select(
            "query_id",
            "qv",
            F.explode(F.slice(F.array_sort(probe_structs), 1, nprobe)).alias("pr"),
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
    n_centroids: int = 8,
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

    The centroid table rides the plan as literals (broadcast-k-means
    shape, no shuffle for assignment); the pair join shuffles once on
    ``cluster``."""
    cents = kmeans_fit(
        corpus,
        n_centroids=n_centroids,
        iters=kmeans_iters,
        id_col=id_col,
        vec_col=vec_col,
    )
    assigned = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _nearest_centroid(
            F.transform(F.col(vec_col), lambda x: x.cast("double")), cents
        ).alias("cluster"),
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
    n_centroids: int = 8,
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
