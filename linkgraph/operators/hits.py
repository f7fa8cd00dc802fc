"""HITS hubs & authorities as an iterative DataFrame program.

Reference semantics — ``_hits_python``
(networkx/algorithms/link_analysis/hits_alg.py:104-152):

* init: h = 1/n for every node (or nstart normalized by its sum),
* per iteration:  a = Aᵀ·h_last  (authority gather along in-edges),
  then h = A·a (hub gather along out-edges); both vectors are
  normalized by their **max** each iteration (hits_alg.py:131-137),
* convergence: L1 norm Σ|h − h_last| < tol — note: NOT scaled by N,
  unlike pagerank (hits_alg.py:139-141),
* non-convergence after max_iter raises PowerIterationFailedConvergence
  (hits_alg.py:142-143),
* finalize: if ``normalized``, rescale both vectors by their sums
  (hits_alg.py:145-150).

Physical strategy: the SAME persisted salted-CSR adjacency serves both
directions — a is gathered with the forward table (explode out-links,
groupBy dst), h with messages flowing back (join a on dst-side via the
same exploded rows). Each superstep: two shuffles (the two gathers)
plus three one-row broadcast aggregates (two max-norms, one L1 error)
that ride the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph, build_adjacency
from ..plans.loop import PowerIterationFailedConvergence, SuperstepLoop


def hits(
    graph: LinkGraph,
    max_iter: int = 100,
    tol: float = 1.0e-8,
    nstart: dict | None = None,
    normalized: bool = True,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    fixed_iter: int | None = None,
) -> DataFrame:
    """Returns (id BIGINT, hub DOUBLE, authority DOUBLE).

    ``fixed_iter`` runs exactly that many supersteps with no
    convergence action (oracle parity / benchmarking), mirroring the
    pagerank operator's contract.
    """
    spark = graph.spark
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    base = graph.weighted_edges() if graph.directed else graph.symmetrized_edges()
    # parallel edges summed (CSR coalescing), no normalization for HITS
    adj = build_adjacency(
        base, num_partitions=num_partitions, coalesce_parallel=True, normalize=False
    ).persist()
    adj.count()

    nodes = graph.vertices.select("id").repartition(num_partitions, "id").persist()
    n = nodes.count()
    if n == 0:
        adj.unpersist()
        nodes.unpersist()
        return spark.createDataFrame(
            [], "id long, hub double, authority double"
        )

    if nstart is None:
        h = nodes.select("id", F.lit(1.0 / n).alias("hub"))
    else:
        s = float(sum(nstart.values()))
        hv = spark.createDataFrame(
            [(int(k), float(v) / s) for k, v in nstart.items()], "id long, hub double"
        )
        h = nodes.join(hv, "id", "left").select(
            "id", F.coalesce("hub", F.lit(0.0)).alias("hub")
        )

    loop = SuperstepLoop(
        spark,
        "hits",
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
    )
    h = loop.start(h.repartition(num_partitions, "id"))
    a: DataFrame | None = None

    def superstep(h_cur: DataFrame) -> tuple[DataFrame, DataFrame]:
        # messages (src's hub value delivered to each out-neighbor)
        msgs = (
            adj.join(h_cur.withColumnRenamed("id", "src"), "src")
            .select(
                "src",
                F.col("hub"),
                F.explode(F.col("pairs")).alias("z"),
            )
        )
        a_raw = (
            msgs.select(F.col("z.dsts").alias("id"), (F.col("hub") * F.col("z.wts")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("authority"))
        )
        a_full = nodes.join(a_raw, "id", "left").select(
            "id", F.coalesce("authority", F.lit(0.0)).alias("authority")
        )
        amax = a_full.agg(F.max(F.abs(F.col("authority"))).alias("m"))
        a_norm = a_full.crossJoin(F.broadcast(amax)).select(
            "id",
            F.when(F.col("m") > 0, F.col("authority") / F.col("m"))
            .otherwise(F.col("authority"))
            .alias("authority"),
        ).persist()

        # h = A·a : out-edges gather authority of their dst back to src
        h_raw = (
            adj.select(
                "src", F.explode(F.col("pairs")).alias("z")
            )
            .select("src", F.col("z.dsts").alias("id"), F.col("z.wts").alias("w"))
            .join(a_norm, "id")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum(F.col("authority") * F.col("w")).alias("hub"))
        )
        h_full = nodes.join(h_raw, "id", "left").select(
            "id", F.coalesce("hub", F.lit(0.0)).alias("hub")
        )
        hmax = h_full.agg(F.max(F.abs(F.col("hub"))).alias("m"))
        h_norm = h_full.crossJoin(F.broadcast(hmax)).select(
            "id",
            F.when(F.col("m") > 0, F.col("hub") / F.col("m"))
            .otherwise(F.col("hub"))
            .alias("hub"),
        )
        return h_norm, a_norm

    def l1(prev: DataFrame, new: DataFrame) -> dict:
        err = (
            new.join(prev.withColumnRenamed("hub", "hub_prev").select("id", "hub_prev"), "id")
            .agg(F.sum(F.abs(F.col("hub") - F.col("hub_prev"))))
            .first()[0]
        )
        return {"l1_error": err}

    niter = fixed_iter if fixed_iter is not None else max_iter
    converged = fixed_iter is not None
    try:
        for _ in range(niter):
            if a is not None:
                a.unpersist()
            h_new, a = superstep(h)
            if fixed_iter is not None:
                h, _ = loop.advance(h_new, metrics_fn=lambda p, n_: {"rows": n_.count()})
                continue
            h, m = loop.advance(h_new, metrics_fn=l1)
            if m["l1_error"] < tol:
                converged = True
                break
        if not converged:
            raise PowerIterationFailedConvergence(max_iter)

        out = h.join(a, "id")
        if normalized:
            sums = out.agg(
                F.sum("hub").alias("hs"), F.sum("authority").alias("as_")
            )
            out = out.crossJoin(F.broadcast(sums)).select(
                "id",
                F.when(F.col("hs") != 0, F.col("hub") / F.col("hs"))
                .otherwise(F.col("hub"))
                .alias("hub"),
                F.when(F.col("as_") != 0, F.col("authority") / F.col("as_"))
                .otherwise(F.col("authority"))
                .alias("authority"),
            )
        # materialize before unpersisting inputs in finally
        out = out.persist()
        out.count()
        return out
    finally:
        adj.unpersist()
        nodes.unpersist()
        if a is not None:
            a.unpersist()


def salsa(
    graph: LinkGraph,
    max_iter: int = 100,
    tol: float = 1.0e-8,
    fixed_iter: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, hub, authority) — SALSA (Lempel & Moran 2000, the
    degree-normalized HITS used by production link recommenders).
    Not in the reference (networkx ships HITS only) — a §2.10
    same-substrate extension: the update is HITS with each gather
    row-stochastic:

        a(j) = Σ_{i→j} h(i)/outdeg(i),  h(i) = Σ_{i→j} a(j)/indeg(j)

    both vectors L1-normalized per superstep (scores sum to 1, the
    stationary-distribution convention; on a connected support the
    authority fixpoint is proportional to in-degree, which tests
    assert). Convergence = L1 step delta < tol on the authority
    vector; ``fixed_iter`` mirrors the pagerank/hits oracle contract.

    Physical plan: ONE edge table carrying both normalized weights
    (w_out = w/out-strength(src), w_in = w/in-strength(dst)), built
    with two aggregate joins and persisted; each superstep is two
    shuffles (the two gathers) + two one-row broadcast sums. Skew note:
    hub normalization divides mass by out-degree, so hub fan-out
    contributes 1 total regardless of degree — messages stay bounded
    and AQE's skew split covers residual reducer imbalance.
    """
    spark = graph.spark
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    e = (
        (graph.weighted_edges() if graph.directed else graph.symmetrized_edges())
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("w"))
    )
    outs = e.groupBy("src").agg(F.sum("w").alias("os"))
    ins = e.groupBy("dst").agg(F.sum("w").alias("is_"))
    edges = (
        e.join(outs, "src")
        .join(ins, "dst")
        .select(
            "src",
            "dst",
            (F.col("w") / F.col("os")).alias("w_out"),
            (F.col("w") / F.col("is_")).alias("w_in"),
        )
        .repartition(num_partitions, "src")
        .persist()
    )
    edges.count()
    nodes = graph.vertices.select("id").repartition(num_partitions, "id").persist()
    n = nodes.count()
    if n == 0:
        edges.unpersist()
        nodes.unpersist()
        return spark.createDataFrame([], "id long, hub double, authority double")

    h = nodes.select("id", F.lit(1.0 / n).alias("hub")).localCheckpoint(eager=True)
    a_prev: DataFrame | None = None
    iters = fixed_iter if fixed_iter is not None else max_iter
    converged = fixed_iter is not None
    for _ in range(iters):
        a_raw = (
            edges.join(h.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("hub") * F.col("w_out")).alias("authority"))
        )
        a_full = nodes.join(a_raw, "id", "left").select(
            "id", F.coalesce("authority", F.lit(0.0)).alias("authority")
        )
        asum = a_full.agg(F.sum("authority").alias("s"))
        a = (
            a_full.crossJoin(F.broadcast(asum))
            .select("id", (F.col("authority") / F.col("s")).alias("authority"))
            .localCheckpoint(eager=True)
        )
        h_raw = (
            edges.join(a.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum(F.col("authority") * F.col("w_in")).alias("hub"))
        )
        h_full = nodes.join(h_raw, "id", "left").select(
            "id", F.coalesce("hub", F.lit(0.0)).alias("hub")
        )
        hsum = h_full.agg(F.sum("hub").alias("s"))
        h = (
            h_full.crossJoin(F.broadcast(hsum))
            .select("id", (F.col("hub") / F.col("s")).alias("hub"))
            .localCheckpoint(eager=True)
        )
        if fixed_iter is None and a_prev is not None:
            err = (
                a.join(a_prev.withColumnRenamed("authority", "ap"), "id")
                .agg(F.sum(F.abs(F.col("authority") - F.col("ap"))))
                .first()[0]
            )
            if err is not None and err < tol:
                converged = True
                a_prev = a
                break
        a_prev = a
    edges.unpersist()
    nodes.unpersist()
    if not converged:
        raise PowerIterationFailedConvergence(
            f"salsa failed to converge in {max_iter} iterations"
        )
    return h.join(a_prev, "id").select("id", "hub", "authority")
