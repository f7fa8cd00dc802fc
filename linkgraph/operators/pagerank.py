"""PageRank as an iterative DataFrame program.

Semantics replicate the reference exactly
(networkx/algorithms/link_analysis/pagerank_alg.py, `_pagerank_python`
at :115-172 / `_pagerank_scipy` at :358-498):

* undirected input converted to directed with both edge directions
  (pagerank_alg.py:128),
* parallel (multigraph) edge weights summed — CSR duplicate
  coalescing (convert_matrix.py:490; noted at pagerank_alg.py:227-229),
* transition weights out-strength-normalized (stochastic_graph,
  networkx/generators/stochastic.py:17-54),
* personalization / nstart / dangling vectors each normalized by
  their own sum; all-zero personalization raises ZeroDivisionError
  (pagerank_alg.py:139-154, 466-487),
* dangling node = zero out-strength; its mass `alpha * sum(x[dangling])`
  is redistributed via dangling weights every iteration
  (pagerank_alg.py:155-161, 488-493),
* update  x = alpha*(x @ W + danglesum*w_dangling) + (1-alpha)*p,
* convergence: L1 norm  sum|x - xlast| < N * tol  — threshold scales
  with node count (pagerank_alg.py:169-170, 495-496),
* non-convergence after max_iter raises
  PowerIterationFailedConvergence (pagerank_alg.py:172, 498).

Physical strategy (Spark-first, not a port): the graph is compiled
once into a degree-annotated, hub-salted CSR-block adjacency
(:func:`linkgraph.graph.build_adjacency`), hash-partitioned by src and
persisted across all supersteps. Each superstep is ONE job: rank rows
shuffle to the adjacency partitioning, contributions explode JVM-side
from the CSR arrays, partial (map-side) aggregation combines before
the dst shuffle, and the dangling-mass scalar rides the same plan as
a broadcast one-row aggregate — the only per-superstep collect is the
L1-error scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph, build_adjacency
from ..plans.loop import PowerIterationFailedConvergence, SuperstepLoop

# Size gate for the single-task numpy kernel, same cost-model-driven
# physical choice as triangles.py LOCAL_TRI_MAX_EDGES / components.py
# LOCAL_CC_MAX_EDGES: below this edge count the per-superstep shuffle +
# scheduling floor (~0.5-1 s/superstep on local[32]) dwarfs the O(m)
# numpy bincount gather (~1 ms per superstep per 10^6 edges), so the
# whole power iteration runs inside ONE Arrow task. The reference's
# own numpy COO path (BASELINE.md: 1.9M edges/s/superstep single-core)
# is the bar this kernel clears at small scale; the salted CSR-block
# superstep plan below remains the 100 TB path and is pinned by the
# *_dist entry twins + tools/scaling_bench.py.
LOCAL_PR_MAX_EDGES = 2_000_000


def _local_pagerank(
    graph: LinkGraph,
    base_edges: DataFrame,
    statics: DataFrame,
    n: int,
    alpha: float,
    tol: float,
    max_iter: int,
    fixed_iter: int | None,
    stats_out: dict | None,
) -> DataFrame:
    """Single-task power iteration: one ``mapInPandas`` task receives
    the (already weight-resolved, direction-resolved) edge rows plus a
    per-vertex statics row (p, dw, x0) via a tagged union, builds the
    normalized transition arrays in numpy and runs the full
    reference-exact update loop (pagerank_alg.py:155-170 semantics:
    out-strength normalization over ALL out-edges, dangling = vertex
    never appearing as src, x = alpha*(x@W + danglesum*dw) + (1-a)*p,
    L1 < N*tol stop) vectorized — ``np.bincount`` is the gather.

    Convergence metadata rides back as extra columns (constant across
    rows; real ids are never NULL) so non-convergence raises
    :class:`PowerIterationFailedConvergence` on the DRIVER, exactly
    like the superstep loop."""
    ev = base_edges.select(
        F.lit(0).alias("tag"),
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
        F.col("weight").cast("double").alias("weight"),
        F.lit(0.0).alias("p"),
        F.lit(0.0).alias("dw"),
        F.lit(0.0).alias("x0"),
    )
    vv = statics.select(
        F.lit(1).alias("tag"),
        F.col("id").cast("long").alias("src"),
        F.lit(0).cast("long").alias("dst"),
        F.lit(0.0).alias("weight"),
        F.col("p").cast("double").alias("p"),
        F.col("dw").cast("double").alias("dw"),
        F.col("x0").cast("double").alias("x0"),
    )
    inp = ev.unionByName(vv).coalesce(1)
    a = float(alpha)
    thresh_tol = float(tol)
    fixed = fixed_iter is not None
    niter = int(fixed_iter) if fixed else int(max_iter)

    def fn(batches):
        import numpy as np
        import pandas as pd

        dfs = list(batches)
        df = pd.concat(dfs, ignore_index=True)
        v = df[df["tag"] == 1]
        e = df[df["tag"] == 0]
        ids_raw = v["src"].to_numpy(dtype="int64")
        order = np.argsort(ids_raw, kind="stable")
        ids = ids_raw[order]
        p = v["p"].to_numpy(dtype="float64")[order]
        dw = v["dw"].to_numpy(dtype="float64")[order]
        x = v["x0"].to_numpy(dtype="float64")[order].copy()
        nv = len(ids)
        es = e["src"].to_numpy(dtype="int64")
        ed = e["dst"].to_numpy(dtype="int64")
        ew = e["weight"].to_numpy(dtype="float64")
        # out-strength normalization over ALL out-edges of a src
        # (build_adjacency normalize=True denominator), even edges
        # whose dst is not a member vertex
        su, sinv = np.unique(es, return_inverse=True)
        outsum = np.bincount(sinv, weights=ew)
        wn = ew / outsum[sinv]
        # membership maps: gather flows only member->member
        si = np.searchsorted(ids, es)
        member_s = (si < nv) & (ids[np.minimum(si, max(nv - 1, 0))] == es)
        di = np.searchsorted(ids, ed)
        member_d = (di < nv) & (ids[np.minimum(di, max(nv - 1, 0))] == ed)
        keep = member_s & member_d
        gs = si[keep].astype(np.int64)
        gd = di[keep].astype(np.int64)
        gw = wn[keep]
        # dangling = member vertex with no out-edge at all (absent
        # from the adjacency src set, pagerank.py distributed path)
        is_src = np.zeros(nv, dtype=bool)
        is_src[si[member_s]] = True
        dang = ~is_src
        iters = 0
        err = float("nan")
        converged = fixed
        for it in range(niter):
            xl = x
            contrib = np.bincount(gd, weights=xl[gs] * gw, minlength=nv)
            dsum = float(xl[dang].sum())
            x = a * (contrib + dsum * dw) + (1.0 - a) * p
            iters = it + 1
            if not fixed:
                err = float(np.abs(x - xl).sum())
                if err < nv * thresh_tol:
                    converged = True
                    break
        yield pd.DataFrame(
            {
                "id": ids,
                "rank": x,
                "iterations": np.full(nv, iters, dtype=np.int32),
                "l1_error": np.full(nv, err, dtype=np.float64),
                "converged": np.full(nv, converged, dtype=bool),
            }
        )

    res = inp.mapInPandas(
        fn, "id long, rank double, iterations int, l1_error double, converged boolean"
    ).persist()
    meta = res.select("iterations", "l1_error", "converged").first()
    base_edges.unpersist()
    if meta is None:
        res.unpersist()
        return graph.spark.createDataFrame([], "id long, rank double")
    if stats_out is not None:
        stats_out["iterations"] = int(meta["iterations"])
        if meta["l1_error"] == meta["l1_error"]:  # not NaN
            stats_out["l1_error"] = float(meta["l1_error"])
    if not meta["converged"]:
        res.unpersist()
        raise PowerIterationFailedConvergence(max_iter)
    return res.select("id", "rank")


def _vector_df(graph: LinkGraph, vec, name: str) -> DataFrame:
    """dict{id: value} | DataFrame(id, value) -> normalized (id, name).

    Normalization by the vector's own sum, ZeroDivisionError on zero
    sum — verbatim pagerank_alg.py:139-154 semantics.
    """
    spark = graph.spark
    if isinstance(vec, dict):
        df = spark.createDataFrame(
            [(int(k), float(v)) for k, v in vec.items()], "id long, value double"
        )
    else:
        df = vec.select(F.col(vec.columns[0]).alias("id"), F.col(vec.columns[1]).alias("value"))
    s = df.agg(F.sum("value")).first()[0]
    if s is None or s == 0:
        raise ZeroDivisionError(f"sum of {name} vector is zero")
    return df.select("id", (F.col("value") / F.lit(float(s))).alias(name))


def pagerank(
    graph: LinkGraph,
    alpha: float = 0.85,
    personalization=None,
    max_iter: int = 100,
    tol: float = 1.0e-6,
    nstart=None,
    weight: bool = True,
    dangling=None,
    fixed_iter: int | None = None,
    num_partitions: int | None = None,
    dst_blocks: int | None = None,
    hub_chunk: int = 65536,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    lineage: bool = False,
    resume: bool = False,
    stats_out: dict | None = None,
    local_max_edges: int = LOCAL_PR_MAX_EDGES,
) -> DataFrame:
    """Returns ranks(id BIGINT, rank DOUBLE), one row per vertex.

    ``stats_out`` (optional dict) is filled in place with
    ``iterations`` / ``l1_error`` (convergence metrics named by the
    baseline target) and ``prep_s`` / ``loop_s`` (one-time adjacency
    compilation vs. steady-state superstep wall time — the baseline's
    edges/sec-per-superstep is loop time, prep amortizes over all
    supersteps and over repeated runs on a persisted graph).

    ``dst_blocks`` (optional, >1) switches the gather to the 2D grid
    layout (:func:`linkgraph.graph.build_adjacency_grid`) — identical
    results (parity-tested to 1e-12), different physical plan; pick
    C ≈ √num_partitions when per-task distinct-dst key space n/C must
    fit the combine hash table (the 10^12-scale regime). A resumed run
    must pass the same ``dst_blocks`` as the original."""
    import time as _time

    _t0 = _time.monotonic()
    spark = graph.spark
    nodes = graph.vertices.select("id")
    n = nodes.count()
    if n == 0:
        return spark.createDataFrame([], "id long, rank double")
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # --- static structures (built once, persisted across supersteps) ---
    # fused build: coalesce parallel edges + collect CSR arrays +
    # out-strength normalization + hub salting in two shuffles total
    base_edges = graph.weighted_edges() if graph.directed else graph.symmetrized_edges()
    if not weight:
        base_edges = base_edges.select("src", "dst", F.lit(1.0).alias("weight"))

    # vectors shared by both physical paths: personalization p
    # (uniform 1/N default), dangling WEIGHTS dw (default p; the
    # dangling-node MASK is path-specific and derived later), and the
    # initial vector x0 — pagerank_alg.py:139-154,466-487 semantics
    if personalization is None:
        p = nodes.select("id", F.lit(1.0 / n).alias("p"))
    else:
        pv = _vector_df(graph, personalization, "p")
        p = nodes.join(pv, "id", "left").select("id", F.coalesce("p", F.lit(0.0)).alias("p"))
    if dangling is None:
        dw = p.select("id", F.col("p").alias("dw"))
    else:
        dv = _vector_df(graph, dangling, "dw")
        dw = nodes.join(dv, "id", "left").select("id", F.coalesce("dw", F.lit(0.0)).alias("dw"))
    if nstart is None:
        x = nodes.select("id", F.lit(1.0 / n).alias("rank"))
    else:
        nv = _vector_df(graph, nstart, "rank")
        x = nodes.join(nv, "id", "left").select(
            "id", F.coalesce("rank", F.lit(0.0)).alias("rank")
        )

    # --- single-task numpy kernel below the size gate (cost-model
    # physical choice, triangles.py / components.py pattern). Never
    # when the caller asked for checkpoint / resume / lineage (that
    # contract belongs to the superstep loop) or the 2D grid layout.
    if (
        local_max_edges
        and checkpoint_dir is None
        and not resume
        and not lineage
        and (dst_blocks is None or dst_blocks <= 1)
    ):
        ep = base_edges.persist()
        if ep.count() <= local_max_edges:
            statics_local = p.join(dw, "id").join(
                x.withColumnRenamed("rank", "x0"), "id"
            )
            if stats_out is not None:
                stats_out["prep_s"] = round(_time.monotonic() - _t0, 3)
            _t_loop = _time.monotonic()
            out = _local_pagerank(
                graph, ep, statics_local, n, alpha, tol, max_iter,
                fixed_iter, stats_out,
            )
            if stats_out is not None:
                stats_out["loop_s"] = round(_time.monotonic() - _t_loop, 3)
            return out
        ep.unpersist()
    # dst_blocks > 1 selects the 2D (grid) layout: per-task distinct
    # dst keys bounded by n/C so map-side combining stays flat as n
    # grows, at the cost of replicating the rank vector C times per
    # superstep (see build_adjacency_grid). Default (None) is the 1D
    # src-hash layout — faster below the cache-pressure crossover.
    grid_c = dst_blocks if dst_blocks and dst_blocks > 1 else None
    if grid_c:
        from ..graph import build_adjacency_grid

        grid_r = max(1, num_partitions // grid_c)
        adj = build_adjacency_grid(
            base_edges,
            num_partitions=num_partitions,
            dst_blocks=grid_c,
            row_blocks=grid_r,
            hub_chunk=hub_chunk,
            coalesce_parallel=True,
            normalize=True,
        ).persist()
        blocks_df = spark.createDataFrame(
            [(i,) for i in range(grid_c)], "dblock int"
        )
    else:
        adj = build_adjacency(
            base_edges,
            num_partitions=num_partitions,
            hub_chunk=hub_chunk,
            coalesce_parallel=True,
            normalize=True,
        ).persist()

    # dangling-node MASK (zero out-strength = absent from the
    # adjacency srcs); the p / dw vectors were built above the gate
    dangling_nodes = nodes.join(
        adj.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
    )
    is_dangling = dangling_nodes.select("id", F.lit(1.0).alias("is_dangling"))
    static = (
        p.join(dw, "id")
        .join(is_dangling, "id", "left")
        .select("id", "p", "dw", F.coalesce("is_dangling", F.lit(0.0)).alias("is_dangling"))
        .repartition(num_partitions, "id")
        .persist()
    )
    static.count()  # materialize once

    if resume and checkpoint_dir:
        # mid-algorithm restart (north rule: "resumable from
        # checkpoint"): reload the newest Parquet snapshot + iteration
        # counter; static structures (adjacency, p/dw vectors) are
        # deterministic functions of the input graph, so the resumed
        # trajectory is identical to an uninterrupted run. max_iter
        # still counts TOTAL iterations across both runs.
        loop, x_resumed = SuperstepLoop.resume(
            spark,
            "pagerank",
            checkpoint_dir,
            checkpoint_every=checkpoint_every,
            lineage=lineage,
        )
        if x_resumed is not None:
            x = x_resumed
        else:
            x = loop.start(x.repartition(num_partitions, "id"))
    else:
        loop = SuperstepLoop(
            spark,
            "pagerank",
            checkpoint_dir=checkpoint_dir,
            checkpoint_every=checkpoint_every,
            lineage=lineage,
        )
        x = loop.start(x.repartition(num_partitions, "id"))

    threshold = n * tol
    niter = fixed_iter if fixed_iter is not None else max_iter
    # graphs without dangling nodes skip the per-superstep dangle
    # aggregate entirely (one cheap check against the persisted static)
    has_dangling = static.where(F.col("is_dangling") == 1.0).limit(1).count() > 0
    # deferred (lazy-composed) supersteps run as one deep multi-stage
    # job; AQE re-plans the remainder of such a plan after every
    # shuffle stage, and that per-stage re-optimization dominates the
    # loop (measured ~1.5x slower WITH AQE on a 10-superstep chain).
    # The superstep join is a fixed repetitive shape with pre-sized
    # partitions, so AQE has nothing to win here; convergence mode
    # (eager, one job per superstep) keeps the session setting.
    use_defer = fixed_iter is not None and not has_dangling
    aqe_prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    if use_defer:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    if stats_out is not None:
        stats_out["prep_s"] = round(_time.monotonic() - _t0, 3)
    _t_loop = _time.monotonic()
    try:
        for it in range(loop.iteration, niter):
            if grid_c:
                # 2D gather: ranks replicated once per column block and
                # shuffled to the grid layout by pid; the persisted
                # adjacency's hash(pid) partitioning satisfies the join
                # (pid is a join key), so the edges never move.
                x2 = (
                    x.select(F.col("id").alias("src"), "rank")
                    .crossJoin(F.broadcast(blocks_df))
                    .withColumn(
                        "pid",
                        (
                            F.col("dblock") * grid_r
                            + F.pmod(F.xxhash64("src"), F.lit(grid_r))
                        ).cast("int"),
                    )
                )
                gather_src = adj.join(x2, ["pid", "src", "dblock"])
            else:
                gather_src = adj.join(x.withColumnRenamed("id", "src"), "src")
            contribs = (
                gather_src.select(
                    F.col("rank"),
                    F.explode(F.col("pairs")).alias("z"),
                )
                .select(
                    F.col("z.dsts").alias("id"),
                    (F.col("rank") * F.col("z.wts")).alias("c"),
                )
                .groupBy("id")
                .agg(F.sum("c").alias("gathered"))
            )
            joined = static.join(contribs, "id", "left")
            if has_dangling:
                # danglesum as a broadcast one-row aggregate — rides the
                # plan, no separate driver action (pagerank_alg.py:161)
                danglesum = (
                    x.join(
                        static.where(F.col("is_dangling") == 1.0).select("id"),
                        "id",
                        "left_semi",
                    )
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("danglesum"))
                )
                xnew = joined.crossJoin(F.broadcast(danglesum)).select(
                    "id",
                    (
                        alpha * (F.coalesce(F.col("gathered"), F.lit(0.0))
                                 + F.col("danglesum") * F.col("dw"))
                        + (1.0 - alpha) * F.col("p")
                    ).alias("rank"),
                )
            else:
                xnew = joined.select(
                    "id",
                    (
                        alpha * F.coalesce(F.col("gathered"), F.lit(0.0))
                        + (1.0 - alpha) * F.col("p")
                    ).alias("rank"),
                )

            if fixed_iter is not None:
                # fixed-iteration mode (oracle parity / benchmarking):
                # no L1 action. Without dangling nodes x is referenced
                # exactly once per superstep, so supersteps compose
                # lazily (defer) and run as ONE multi-stage job per
                # checkpoint_every block — no per-superstep driver
                # round-trip. With dangling nodes x is referenced twice
                # (gather + danglesum) → defer would double the plan
                # per iteration, so every step materializes.
                defer = (
                    use_defer
                    and (it + 1) % checkpoint_every != 0
                    and (it + 1) != niter
                )
                x, _ = loop.advance(
                    xnew,
                    metrics_fn=None if defer else (lambda prev, new: {"rows": new.count()}),
                    defer=defer,
                )
                continue

            def l1_err(prev: DataFrame, new: DataFrame) -> dict:
                err = (
                    new.join(prev.withColumnRenamed("rank", "rank_prev"), "id")
                    .agg(F.sum(F.abs(F.col("rank") - F.col("rank_prev"))))
                    .first()[0]
                )
                return {"l1_error": err}

            x, m = loop.advance(xnew, metrics_fn=l1_err)
            if stats_out is not None:
                stats_out["iterations"] = it + 1
                stats_out["l1_error"] = m["l1_error"]
            if m["l1_error"] < threshold:
                return x
        if fixed_iter is not None:
            return x
        raise PowerIterationFailedConvergence(max_iter)
    finally:
        if stats_out is not None:
            stats_out["loop_s"] = round(_time.monotonic() - _t_loop, 3)
        spark.conf.set("spark.sql.adaptive.enabled", aqe_prev)
        adj.unpersist()
        static.unpersist()


def trustrank(
    graph: LinkGraph,
    trusted: "DataFrame | list[int]",
    alpha: float = 0.85,
    **pagerank_kwargs,
) -> DataFrame:
    """(id, rank) — TrustRank (Gyöngyi, Garcia-Molina & Pedersen,
    VLDB 2004): PageRank with teleportation restricted to a trusted
    seed set, so trust mass decays along links away from the seeds.
    Not in the reference — the canonical web-spam companion of the
    north rule's PageRank, and exactly the personalization vector this
    operator already supports: personalization = uniform over the
    seeds, dangling mass redistributed to the seeds too (the paper's
    behavior: leaked mass returns to trusted pages). Everything else
    (salted CSR gather, N·tol convergence, checkpoint/resume) is
    inherited verbatim."""
    spark = graph.spark
    if isinstance(trusted, list):
        seeds = spark.createDataFrame(
            [(int(s),) for s in trusted], "id long"
        )
    else:
        seeds = trusted.select(F.col(trusted.columns[0]).alias("id"))
    pers = seeds.join(graph.vertices.select("id"), "id", "left_semi").select(
        "id", F.lit(1.0).alias("value")
    )
    return pagerank(
        graph,
        alpha=alpha,
        personalization=pers,
        dangling=pers,
        **pagerank_kwargs,
    )


def spam_mass(
    graph: LinkGraph,
    trusted: "DataFrame | list[int]",
    alpha: float = 0.85,
    **pagerank_kwargs,
) -> DataFrame:
    """(id, rank, trust_rank, spam_mass) — relative spam mass
    (Gyöngyi, Berkhin, Garcia-Molina & Pedersen, "Link Spam Detection
    Based on Mass Estimation", VLDB 2006): the fraction of a page's
    PageRank that does NOT flow through the trusted core,

        spam_mass(v) = (PR(v) - TrustRank(v)) / PR(v).

    Near 1 → almost all rank arrives via untrusted paths (spam-farm
    signature); near 0 or negative → rank is backed by the trusted
    seed set. Not in the reference — the canonical companion of
    TrustRank above. One extra join over the two rank vectors; both
    runs share the identical gather substrate (and both accept
    ``fixed_iter``/``tol`` through ``pagerank_kwargs``).
    """
    pr = pagerank(graph, alpha=alpha, **pagerank_kwargs).withColumnRenamed(
        "rank", "_pr"
    )
    tr = trustrank(graph, trusted, alpha=alpha, **pagerank_kwargs).withColumnRenamed(
        "rank", "_tr"
    )
    return pr.join(tr, "id").select(
        "id",
        F.col("_pr").alias("rank"),
        F.col("_tr").alias("trust_rank"),
        ((F.col("_pr") - F.col("_tr")) / F.col("_pr")).alias("spam_mass"),
    )
