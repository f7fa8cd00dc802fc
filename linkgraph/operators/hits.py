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
from ._local import member_maps, run_local_kernel

# Size gate for the single-task numpy kernels below (shared by hits
# and salsa): same cost-model physical choice as pagerank.py
# LOCAL_PR_MAX_EDGES — under ~2M edges the two shuffles + three
# one-row aggregates per superstep cost more in scheduling floor than
# the whole vectorized loop. The distributed plans stay the 100 TB
# path, pinned by the *_dist entry twins.
LOCAL_HITS_MAX_EDGES = 2_000_000

_META = (
    "id long, hub double, authority double, "
    "iterations int, l1_error double, converged boolean"
)


def _finish_local(res: DataFrame, error) -> DataFrame:
    """Persist a local-kernel result, lift the constant convergence
    metadata to the driver, raise ``error`` if the loop did not
    converge, and strip the metadata columns."""
    res = res.persist()
    meta = res.select("converged").first()
    if meta is not None and not meta["converged"]:
        res.unpersist()
        raise error
    return res.select("id", "hub", "authority")


def _local_hits(
    statics: DataFrame,
    edges: DataFrame,
    tol: float,
    max_iter: int,
    fixed_iter: int | None,
    normalized: bool,
) -> DataFrame:
    """Single-task HITS: the reference-exact update loop
    (hits_alg.py:104-152 — a = Aᵀh then h = Aa, both max-normalized
    per iteration, UNscaled L1 < tol stop, final sum-rescale when
    ``normalized``) vectorized over numpy arrays inside one Arrow
    task. Parallel edges sum in the gather, identical to the
    coalesced CSR of the distributed plan."""
    fixed = fixed_iter is not None
    niter = int(fixed_iter) if fixed else int(max_iter)
    thresh = float(tol)

    def kernel(ids, stat, es, ed, ew):
        import numpy as np

        nv = len(ids)
        si, di, ms, md = member_maps(ids, es, ed)
        keep = ms & md
        gs = si[keep].astype(np.int64)
        gd = di[keep].astype(np.int64)
        gw = ew[keep]
        h = stat["h0"].copy()
        a = np.zeros(nv)
        iters = 0
        err = float("nan")
        converged = fixed
        for it in range(niter):
            hl = h
            a = np.bincount(gd, weights=hl[gs] * gw, minlength=nv)
            am = np.abs(a).max() if nv else 0.0
            if am > 0:
                a = a / am
            h = np.bincount(gs, weights=a[gd] * gw, minlength=nv)
            hm = np.abs(h).max() if nv else 0.0
            if hm > 0:
                h = h / hm
            iters = it + 1
            if not fixed:
                err = float(np.abs(h - hl).sum())
                if err < thresh:
                    converged = True
                    break
        if normalized:
            hs = h.sum()
            if hs != 0:
                h = h / hs
            as_ = a.sum()
            if as_ != 0:
                a = a / as_
        return {
            "id": ids,
            "hub": h,
            "authority": a,
            "iterations": np.full(nv, iters, dtype=np.int32),
            "l1_error": np.full(nv, err, dtype=np.float64),
            "converged": np.full(nv, converged, dtype=bool),
        }

    return run_local_kernel(edges, statics, ["h0"], kernel, _META)


def _local_salsa(
    statics: DataFrame,
    edges: DataFrame,
    tol: float,
    max_iter: int,
    fixed_iter: int | None,
) -> DataFrame:
    """Single-task SALSA: same update loop as the distributed plan —
    w_out / w_in strengths computed over ALL edges of an endpoint
    (the distributed ``outs``/``ins`` aggregates see the raw edge
    table), gathers over member→member edges only, both vectors
    L1-normalized per superstep, convergence on the authority step
    delta from the second iteration on."""
    fixed = fixed_iter is not None
    niter = int(fixed_iter) if fixed else int(max_iter)
    thresh = float(tol)

    def kernel(ids, stat, es, ed, ew):
        import numpy as np

        nv = len(ids)
        si, di, ms, md = member_maps(ids, es, ed)
        _, sinv = np.unique(es, return_inverse=True)
        w_out = ew / np.bincount(sinv, weights=ew)[sinv]
        _, dinv = np.unique(ed, return_inverse=True)
        w_in = ew / np.bincount(dinv, weights=ew)[dinv]
        keep = ms & md
        gs = si[keep].astype(np.int64)
        gd = di[keep].astype(np.int64)
        gwo = w_out[keep]
        gwi = w_in[keep]
        h = np.full(nv, 1.0 / nv) if nv else np.zeros(0)
        a = np.zeros(nv)
        a_prev = None
        iters = 0
        err = float("nan")
        converged = fixed
        with np.errstate(divide="ignore", invalid="ignore"):
            for it in range(niter):
                a = np.bincount(gd, weights=h[gs] * gwo, minlength=nv)
                a = a / a.sum()
                h = np.bincount(gs, weights=a[gd] * gwi, minlength=nv)
                h = h / h.sum()
                iters = it + 1
                if not fixed and a_prev is not None:
                    err = float(np.abs(a - a_prev).sum())
                    if err < thresh:
                        converged = True
                        a_prev = a
                        break
                a_prev = a
        return {
            "id": ids,
            "hub": h,
            "authority": a,
            "iterations": np.full(nv, iters, dtype=np.int32),
            "l1_error": np.full(nv, err, dtype=np.float64),
            "converged": np.full(nv, converged, dtype=bool),
        }

    return run_local_kernel(edges, statics, [], kernel, _META)


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
    local_max_edges: int = LOCAL_HITS_MAX_EDGES,
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

    nodes = graph.vertices.select("id").repartition(num_partitions, "id").persist()
    n = nodes.count()
    if n == 0:
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

    # single-task numpy kernel below the size gate (never when the
    # caller asked for checkpointing — that contract belongs to the
    # superstep loop)
    if local_max_edges and checkpoint_dir is None:
        ep = base.persist()
        if ep.count() <= local_max_edges:
            try:
                return _finish_local(
                    _local_hits(
                        h.withColumnRenamed("hub", "h0"), ep, tol, max_iter,
                        fixed_iter, normalized,
                    ),
                    PowerIterationFailedConvergence(max_iter),
                )
            finally:
                ep.unpersist()
                nodes.unpersist()
        ep.unpersist()

    # parallel edges summed (CSR coalescing), no normalization for HITS
    adj = build_adjacency(
        base, num_partitions=num_partitions, coalesce_parallel=True, normalize=False
    ).persist()
    adj.count()

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
    local_max_edges: int = LOCAL_HITS_MAX_EDGES,
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

    base = graph.weighted_edges() if graph.directed else graph.symmetrized_edges()

    # single-task numpy kernel below the size gate (parallel-edge
    # coalescing is linear under the strength normalization, so the
    # kernel skips the distributed plan's groupBy(src,dst) pre-pass)
    if local_max_edges:
        ep = base.persist()
        if ep.count() <= local_max_edges:
            nodes0 = graph.vertices.select("id")
            if nodes0.isEmpty():
                ep.unpersist()
                return spark.createDataFrame(
                    [], "id long, hub double, authority double"
                )
            try:
                return _finish_local(
                    _local_salsa(nodes0, ep, tol, max_iter, fixed_iter),
                    PowerIterationFailedConvergence(
                        f"salsa failed to converge in {max_iter} iterations"
                    ),
                )
            finally:
                ep.unpersist()
        ep.unpersist()

    e = base.groupBy("src", "dst").agg(F.sum("weight").alias("w"))
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
