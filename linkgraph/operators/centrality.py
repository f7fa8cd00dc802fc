"""Eigenvector centrality as a power-iteration DataFrame program.

Reference semantics — ``eigenvector_centrality``
(networkx/algorithms/centrality/eigenvector.py:18-145):

* init: x = nstart or all-ones, normalized by its sum,
* per iteration: x_new = x_last + A^T x_last (each node adds its value
  times the edge weight to every successor — eigenvector.py:125-128),
  then x_new is normalized by its EUCLIDEAN norm (``math.hypot``,
  eigenvector.py:131; a zero norm falls back to 1),
* convergence: L1 norm sum(|x - x_last|) < n * tol (the same N-scaled
  rule as pagerank, eigenvector.py:134-137),
* non-convergence raises PowerIterationFailedConvergence.

Physical strategy: identical to the pagerank gather — one persisted
salted-CSR adjacency (parallel edges coalesced, NO out-strength
normalization), one shuffle per superstep (explode pairs, groupBy dst
with map-side partial aggregation), the 2-norm and L1 error riding the
plan as one-row broadcast aggregates.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph, build_adjacency
from ..plans.loop import PowerIterationFailedConvergence, SuperstepLoop
from ._local import member_maps, run_local_kernel

# Size gate for the single-task eigenvector/Katz kernels: same
# cost-model physical choice as pagerank.py LOCAL_PR_MAX_EDGES.
LOCAL_CENTRALITY_MAX_EDGES = 2_000_000


def _local_power_iteration(
    statics: DataFrame,
    edges: DataFrame,
    update: str,
    n: int,
    tol: float,
    max_iter: int,
    fixed_iter: int | None,
    alpha: float = 0.0,
    beta: float = 0.0,
    normalized: bool = True,
) -> DataFrame:
    """Single-task power iteration shared by eigenvector
    (``update='eigen'``: x = L2-normalize(x + A^T x), reference
    eigenvector.py:60) and Katz (``update='katz'``:
    x = alpha*A^T x + beta, katz.py:12, final L2 rescale when
    ``normalized``). Convergence: L1 step delta < n*tol for both.
    Statics column x0 carries the initial vector."""
    fixed = fixed_iter is not None
    niter = int(fixed_iter) if fixed else int(max_iter)
    thresh = float(n) * float(tol)
    a_, b_ = float(alpha), float(beta)

    def kernel(ids, stat, es, ed, ew):
        import numpy as np

        nv = len(ids)
        si, di, ms, md = member_maps(ids, es, ed)
        keep = ms & md
        gs = si[keep].astype(np.int64)
        gd = di[keep].astype(np.int64)
        gw = ew[keep]
        x = stat["x0"].copy()
        iters = 0
        err = float("nan")
        converged = fixed
        for it in range(niter):
            xl = x
            gathered = np.bincount(gd, weights=xl[gs] * gw, minlength=nv)
            if update == "eigen":
                raw = xl + gathered
                nrm = float(np.sqrt((raw * raw).sum()))
                x = raw / (nrm if nrm > 0 else 1.0)
            else:
                x = a_ * gathered + b_
            iters = it + 1
            if not fixed:
                err = float(np.abs(x - xl).sum())
                if err < thresh:
                    converged = True
                    break
        if update == "katz" and normalized:
            nrm = float(np.sqrt((x * x).sum()))
            x = x / (nrm if nrm > 0 else 1.0)
        return {
            "id": ids,
            "centrality": x,
            "iterations": np.full(nv, iters, dtype=np.int32),
            "l1_error": np.full(nv, err, dtype=np.float64),
            "converged": np.full(nv, converged, dtype=bool),
        }

    return run_local_kernel(
        edges,
        statics,
        ["x0"],
        kernel,
        "id long, centrality double, iterations int, l1_error double, converged boolean",
    )


LOCAL_BRANDES_MAX_WORK = 100_000_000  # |E| x |sources| dense-state bound


def _local_brandes(
    statics: DataFrame,
    edges: DataFrame,
    edge_mode: bool,
    max_rounds: int,
    n_groups: int = 16,
) -> DataFrame:
    """Size-gated Brandes (node or edge mode, weighted or unit
    weights — the caller resolves the weight column): the exact
    distributed phases — min-plus relaxation to shortest distances,
    tight-edge DAG, max-plus DAG depths, depth-ascending sigma,
    depth-descending delta (betweenness.py:13-123, :190 and the
    ``weight=`` Dijkstra variant :110) — vectorized per source with
    1D segment ``reduceat`` sweeps (measured ~10x the 2D/scatter
    forms). Sources are hash-split into ``n_groups`` groups, each
    group's (edges + statics) replica landing in its own Arrow task,
    so the per-source loop parallelizes across cores; the caller
    sums the per-group partial credits (associative) and applies the
    _rescale factors and the undirected canonical-key merge,
    identical to the superstep path. Output: partial (src, dst,
    value, err) rows — node mode uses src as the vertex id."""
    rounds = int(max_rounds)
    spark = statics.sparkSession
    ng = max(1, int(n_groups))
    grps = spark.range(ng).select(F.col("id").cast("int").alias("grp"))
    ev = edges.crossJoin(grps).select(
        "grp",
        F.lit(0).alias("tag"),
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
        F.col("weight").cast("double").alias("weight"),
        F.lit(0.0).alias("is_src"),
    )
    vv = statics.crossJoin(grps).select(
        "grp",
        F.lit(1).alias("tag"),
        F.col("id").cast("long").alias("src"),
        F.lit(0).cast("long").alias("dst"),
        F.lit(0.0).alias("weight"),
        (
            F.col("is_src")
            * (F.pmod(F.col("id"), F.lit(ng)) == F.col("grp")).cast("double")
        ).alias("is_src"),
    )
    inp = ev.unionByName(vv).repartition(ng, "grp")

    def fn(batches):
        import numpy as np
        import pandas as pd

        dfs = list(batches)
        if not dfs:
            return
        df = pd.concat(dfs, ignore_index=True)
        for _, gdf in df.groupby("grp"):
            v = gdf[gdf["tag"] == 1]
            e = gdf[gdf["tag"] == 0]
            ids_raw = v["src"].to_numpy(dtype="int64")
            order = np.argsort(ids_raw, kind="stable")
            ids = ids_raw[order]
            is_src = v["is_src"].to_numpy(dtype="float64")[order]
            es = e["src"].to_numpy(dtype="int64")
            ed = e["dst"].to_numpy(dtype="int64")
            ew = e["weight"].to_numpy(dtype="float64")
            nv = len(ids)
            si, di, ms, md = member_maps(ids, es, ed)
            keep = ms & md & (es != ed)
            gs0 = si[keep].astype(np.int64)
            gd0 = di[keep].astype(np.int64)
            gw0 = ew[keep]
            # coalesce parallel edges to the min weight (the
            # distributed prep's groupBy(src,dst).min(w) / distinct())
            packed = gs0 * np.int64(max(nv, 1)) + gd0
            order2 = np.lexsort((gw0, packed))
            firstm = np.ones(len(order2), dtype=bool)
            firstm[1:] = packed[order2][1:] != packed[order2][:-1]
            sel = order2[firstm]
            gs, gd, gw = gs0[sel], gd0[sel], gw0[sel]
            ne = len(gs)
            srcpos = np.nonzero(is_src > 0)[0]
            if len(srcpos) == 0 or nv == 0 or ne == 0:
                if edge_mode and ne:
                    yield pd.DataFrame({
                        "src": ids[gs], "dst": ids[gd],
                        "value": np.zeros(ne),
                        "err": np.zeros(ne, np.int32),
                    })
                elif not edge_mode and nv:
                    yield pd.DataFrame({
                        "src": ids, "dst": ids,
                        "value": np.zeros(nv),
                        "err": np.zeros(nv, np.int32),
                    })
                continue

            dorder = np.argsort(gd, kind="stable")
            gs_d, gd_d, gw_d = gs[dorder], gd[dorder], gw[dorder]
            dstart = np.nonzero(np.r_[True, gd_d[1:] != gd_d[:-1]])[0]
            duniq = gd_d[dstart]
            sorder = np.argsort(gs, kind="stable")
            gs_s, gd_s = gs[sorder], gd[sorder]
            gw_s = gw[sorder]
            sstart = np.nonzero(np.r_[True, gs_s[1:] != gs_s[:-1]])[0]
            suniq = gs_s[sstart]

            INF = np.inf
            err = 0
            b = np.zeros(nv)
            ecred = np.zeros(ne) if edge_mode else None
            for sp in srcpos:
                dist = np.full(nv, INF)
                dist[sp] = 0.0
                for _ in range(rounds):
                    seg = np.minimum.reduceat(dist[gs_d] + gw_d, dstart)
                    nd = dist.copy()
                    nd[duniq] = np.minimum(nd[duniq], seg)
                    if np.array_equal(nd, dist):
                        break
                    dist = nd
                else:
                    err = 1
                fin_d = np.isfinite(dist[gs_d])
                tight_d = fin_d & (dist[gs_d] + gw_d == dist[gd_d])
                depth = np.zeros(nv, np.int64)
                for _ in range(rounds):
                    seg = np.maximum.reduceat(
                        np.where(tight_d, depth[gs_d] + 1, 0), dstart
                    )
                    nd = depth.copy()
                    nd[duniq] = np.maximum(nd[duniq], seg)
                    if np.array_equal(nd, depth):
                        break
                    depth = nd
                else:
                    err = 2
                maxd = int(depth.max())
                sigma = np.zeros(nv)
                sigma[sp] = 1.0
                dd_d = depth[gd_d]
                for d in range(1, maxd + 1):
                    contrib = np.where(
                        tight_d & (dd_d == d), sigma[gs_d], 0.0
                    )
                    sigma[duniq] += np.add.reduceat(contrib, dstart)
                fin_s = np.isfinite(dist[gs_s])
                tight_s = fin_s & (dist[gs_s] + gw_s == dist[gd_s])
                dd_s = depth[gd_s]
                delta = np.zeros(nv)
                wsum = np.zeros(nv)
                reached = np.isfinite(dist)
                for d in range(maxd, 0, -1):
                    mask = tight_s & (dd_s == d)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        w_t = np.where(
                            mask, (1.0 + delta[gd_s]) / sigma[gd_s], 0.0
                        )
                    if edge_mode:
                        ecred += np.where(mask, sigma[gs_s], 0.0) * w_t
                    wsum[suniq] += np.add.reduceat(w_t, sstart)
                    lev = reached & (depth == d - 1)
                    delta[lev] = sigma[lev] * wsum[lev]
                b += delta * ((depth > 0) & reached)

            if edge_mode:
                yield pd.DataFrame({
                    "src": ids[gs_s], "dst": ids[gd_s],
                    "value": ecred, "err": np.full(ne, err, np.int32),
                })
            else:
                yield pd.DataFrame({
                    "src": ids, "dst": ids,
                    "value": b, "err": np.full(nv, err, np.int32),
                })

    return inp.mapInPandas(fn, "src long, dst long, value double, err int")


def _finish_local_centrality(res: DataFrame, max_iter: int) -> DataFrame:
    res = res.persist()
    meta = res.select("converged").first()
    if meta is not None and not meta["converged"]:
        res.unpersist()
        raise PowerIterationFailedConvergence(max_iter)
    return res.select("id", "centrality")


def betweenness_centrality(
    graph: LinkGraph,
    k: int | None = None,
    sources: list[int] | None = None,
    normalized: bool = True,
    num_partitions: int | None = None,
    _edge_mode: bool = False,
    weight: bool = False,
    local_max_edges: int = LOCAL_CENTRALITY_MAX_EDGES,
) -> DataFrame:
    """(id BIGINT, betweenness DOUBLE) — Brandes' algorithm
    (networkx/algorithms/centrality/betweenness.py:13-123 via
    ``_single_source_shortest_path_basic`` :249 and
    ``_accumulate_basic`` :300), unweighted.

    Distributed form: ALL sources advance together — state keyed
    (source, id). One forward frontier sweep per DEPTH computes
    (layer, sigma) — sigma(s,v) = Σ sigma(s,u) over predecessors one
    layer closer — then one backward join per layer accumulates
    delta(s,v) = Σ_{succ w} sigma(s,v)/sigma(s,w) · (1 + delta(s,w)).
    Job count is O(diameter), independent of the number of sources
    (round 1 ran a sequential per-source loop: O(|S|·depth) driver
    round-trips — the batched sweep removes that storm). The scale
    knob is source sampling: ``k`` samples the ``k`` lowest-id
    vertices (deterministic) and rescales by n/k — the standard
    estimator (betweenness.py:72 ``k`` parameter); ``sources``
    overrides sampling explicitly. Per-layer tables live as eager
    localCheckpoints (bounded lineage); cross-source accumulation is
    a union + groupBy sum, never a driver-side merge.
    """
    spark = graph.spark
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # single-task Brandes kernel below the size gates (edge count AND
    # the |E|x|S| dense-state work bound) — serves all four variants
    # (node/edge x unit/weighted); the superstep sweeps remain the
    # 100 TB path, pinned by the *_dist / sampled entry queries
    if local_max_edges:
        base = (
            graph.weighted_edges() if graph.directed else graph.symmetrized_edges()
        )
        if not weight:
            base = base.select("src", "dst", F.lit(1.0).alias("weight"))
        ep = base.persist()
        m = ep.count()
        if m <= local_max_edges:
            verts0 = graph.vertices.select("id")
            n0 = verts0.count()
            if n0 == 0:
                ep.unpersist()
                return spark.createDataFrame(
                    [],
                    "src long, dst long, betweenness double"
                    if _edge_mode
                    else "id long, betweenness double",
                )
            if sources is None:
                if k is None:
                    src_ids0 = [r["id"] for r in verts0.collect()]
                    scale_k0 = 1.0
                else:
                    src_ids0 = [
                        r["id"] for r in verts0.orderBy("id").limit(k).collect()
                    ]
                    scale_k0 = n0 / float(len(src_ids0))
            else:
                src_ids0 = [int(x) for x in sources]
                scale_k0 = 1.0
            if m * max(len(src_ids0), 1) <= LOCAL_BRANDES_MAX_WORK:
                srcdf = spark.createDataFrame(
                    [(int(x),) for x in src_ids0] or [(None,)], "id long"
                ).select("id", F.lit(1.0).alias("is_src"))
                statics = verts0.join(srcdf, "id", "left").select(
                    "id", F.coalesce("is_src", F.lit(0.0)).alias("is_src")
                )
                res = _local_brandes(statics, ep, _edge_mode, 10_000).persist()
                maxerr = res.agg(F.max("err")).first()[0]
                if maxerr:
                    res.unpersist()
                    ep.unpersist()
                    raise RuntimeError(
                        "betweenness relaxation did not converge"
                        if maxerr == 1
                        else "betweenness depth pass did not converge"
                    )
                if _edge_mode:
                    if normalized:
                        e_scale = 1.0 / (n0 * (n0 - 1)) if n0 > 1 else 1.0
                    else:
                        e_scale = 1.0 if graph.directed else 0.5
                    e_factor = e_scale * scale_k0
                    keyed = res.select("src", "dst", "value")
                    if not graph.directed:
                        keyed = keyed.select(
                            F.least("src", "dst").alias("src"),
                            F.greatest("src", "dst").alias("dst"),
                            "value",
                        )
                    out = (
                        keyed.groupBy("src", "dst")
                        .agg(F.sum("value").alias("c"))
                        .select(
                            "src",
                            "dst",
                            (F.col("c") * F.lit(e_factor)).alias("betweenness"),
                        )
                        .persist()
                    )
                else:
                    if normalized:
                        scale0 = 1.0 / ((n0 - 1) * (n0 - 2)) if n0 > 2 else None
                    else:
                        scale0 = None if graph.directed else 0.5
                    factor0 = scale0 * scale_k0 if scale0 is not None else 1.0
                    out = (
                        res.groupBy(F.col("src").alias("id"))
                        .agg(F.sum("value").alias("v"))
                        .select(
                            "id",
                            (F.col("v") * F.lit(factor0)).alias("betweenness"),
                        )
                        .persist()
                    )
                out.count()
                res.unpersist()
                ep.unpersist()
                return out
        ep.unpersist()

    if weight:
        return _weighted_betweenness(
            graph, k=k, sources=sources, normalized=normalized,
            num_partitions=num_partitions, edge_mode=_edge_mode,
        )

    verts = graph.vertices.select("id").persist()
    n = verts.count()
    if n == 0:
        verts.unpersist()
        return spark.createDataFrame([], "id long, betweenness double")
    edges = (
        (graph.weighted_edges() if graph.directed else graph.symmetrized_edges())
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .join(verts.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .join(verts.withColumnRenamed("id", "src"), "src", "left_semi")
        .repartition(num_partitions, "src")
        .persist()
    )
    edges.count()

    if sources is None:
        if k is None:
            src_ids = [r["id"] for r in verts.collect()]
            scale_k = 1.0
        else:
            src_ids = [r["id"] for r in verts.orderBy("id").limit(k).collect()]
            scale_k = n / float(len(src_ids))
    else:
        src_ids = [int(s) for s in sources]
        scale_k = 1.0

    try:
        # ---- forward (all sources at once): (source, id, sigma) per layer
        layers: list[DataFrame] = [
            spark.createDataFrame([(int(s),) for s in src_ids], "source long")
            .select("source", F.col("source").alias("id"), F.lit(1.0).alias("sigma"))
            .join(verts, "id", "left_semi")
            .localCheckpoint(eager=True)
        ]
        seen = layers[0].select("source", "id").localCheckpoint(eager=True)
        while True:
            nxt = (
                edges.join(layers[-1].withColumnRenamed("id", "src"), "src")
                .groupBy("source", F.col("dst").alias("id"))
                .agg(F.sum("sigma").alias("sigma"))
                .join(seen, ["source", "id"], "left_anti")
                .localCheckpoint(eager=True)
            )
            if nxt.limit(1).count() == 0:
                break
            layers.append(nxt)
            seen = seen.unionByName(nxt.select("source", "id")).localCheckpoint(
                eager=True
            )
        # ---- backward (all sources at once): delta per layer ----------
        deltas: list[DataFrame] = []
        edge_credits: list[DataFrame] = []  # _edge_mode: per-DAG-edge terms
        delta_next: DataFrame | None = None  # layer d+1 (source, id, sigma, delta)
        for d in range(len(layers) - 1, -1, -1):
            cur = layers[d]
            if delta_next is None:
                delta_cur = cur.select(
                    "source", "id", "sigma", F.lit(0.0).alias("delta")
                )
            else:
                terms = edges.join(
                    delta_next.select(
                        "source",
                        F.col("id").alias("dst"),
                        ((1.0 + F.col("delta")) / F.col("sigma")).alias(
                            "wterm"
                        ),
                    ),
                    "dst",
                )
                if _edge_mode:
                    # per-DAG-edge credit sigma(v)·(1+delta(w))/sigma(w),
                    # only for v in layer d (shortest-path DAG edges)
                    ec = (
                        terms.join(
                            cur.select(
                                "source",
                                F.col("id").alias("src"),
                                F.col("sigma").alias("sig_v"),
                            ),
                            ["source", "src"],
                        )
                        .groupBy("src", "dst")
                        .agg(
                            F.sum(F.col("sig_v") * F.col("wterm")).alias("credit")
                        )
                        .localCheckpoint(eager=True)
                    )
                    edge_credits.append(ec)
                contrib = terms.groupBy("source", F.col("src").alias("id")).agg(
                    F.sum("wterm").alias("wsum")
                )
                delta_cur = (
                    cur.join(contrib, ["source", "id"], "left")
                    .select(
                        "source",
                        "id",
                        "sigma",
                        (
                            F.col("sigma") * F.coalesce("wsum", F.lit(0.0))
                        ).alias("delta"),
                    )
                )
            delta_cur = delta_cur.localCheckpoint(eager=True)
            if d > 0:  # the source row itself accumulates nothing
                deltas.append(delta_cur.select("id", "delta"))
            delta_next = delta_cur

        if _edge_mode:
            # rescale (betweenness.py _rescale_e): normalized ->
            # 1/(n(n-1)); unnormalized undirected -> 1/2 (each edge
            # accumulated from both stored orientations)
            if normalized:
                e_scale = 1.0 / (n * (n - 1)) if n > 1 else 1.0
            else:
                e_scale = 1.0 if graph.directed else 0.5
            e_factor = e_scale * scale_k
            if edge_credits:
                acc_e = edge_credits[0]
                for ee in edge_credits[1:]:
                    acc_e = acc_e.unionByName(ee)
            else:
                acc_e = spark.createDataFrame(
                    [], "src long, dst long, credit double"
                )
            if graph.directed:
                keyed = acc_e
            else:
                keyed = acc_e.select(
                    F.least("src", "dst").alias("src"),
                    F.greatest("src", "dst").alias("dst"),
                    "credit",
                )
            base = (
                graph.weighted_edges()
                .select("src", "dst")
                .where(F.col("src") != F.col("dst"))
            )
            if not graph.directed:
                base = base.select(
                    F.least("src", "dst").alias("src"),
                    F.greatest("src", "dst").alias("dst"),
                )
            base = (
                base.distinct()
                .join(verts.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(verts.withColumnRenamed("id", "dst"), "dst", "left_semi")
            )
            out_e = (
                base.join(
                    keyed.groupBy("src", "dst").agg(
                        F.sum("credit").alias("c")
                    ),
                    ["src", "dst"],
                    "left",
                )
                .select(
                    "src",
                    "dst",
                    (F.coalesce("c", F.lit(0.0)) * F.lit(e_factor)).alias(
                        "betweenness"
                    ),
                )
                .persist()
            )
            out_e.count()
            return out_e

        if deltas:
            acc = deltas[0]
            for dd in deltas[1:]:
                acc = acc.unionByName(dd)
            bc = acc.groupBy("id").agg(F.sum("delta").alias("b"))
        else:
            bc = spark.createDataFrame([], "id long, b double")
        # rescale (betweenness.py:338 _rescale, mirrored exactly):
        # normalized -> 1/((n-1)(n-2)) (undirected double-counting is
        # folded into the same constant); unnormalized undirected ->
        # 1/2; the n/k estimator factor applies only when a scale does
        if normalized:
            scale = 1.0 / ((n - 1) * (n - 2)) if n > 2 else None
        else:
            scale = None if graph.directed else 0.5
        factor = scale * scale_k if scale is not None else 1.0
        out = (
            verts.join(bc, "id", "left")
            .select(
                "id",
                (F.coalesce("b", F.lit(0.0)) * F.lit(factor)).alias(
                    "betweenness"
                ),
            )
            .persist()
        )
        out.count()
        return out
    finally:
        edges.unpersist()
        verts.unpersist()


def _weighted_betweenness(
    graph: LinkGraph,
    k: int | None,
    sources: list[int] | None,
    normalized: bool,
    num_partitions: int,
    max_rounds: int = 10_000,
    edge_mode: bool = False,
) -> DataFrame:
    """Weighted Brandes (reference betweenness.py:110 ``weight=`` via
    ``_single_source_dijkstra_path_basic`` :277): the layer-batched
    sweep of the unweighted form generalizes by replacing BFS layers
    with the shortest-path DAG's LONGEST-PATH depth:

    1. batched multi-source Bellman-Ford — state (source, id, dist),
       only improved rows ride the frontier (positive weights on a
       link graph; rounds = max hop count of any shortest path),
    2. TIGHT edges per source: dist(u) + w == dist(v) — the float
       equality is exact because both sides are the very sums the
       relaxation minimized over (same argument as
       shortest_paths.py:131),
    3. DAG depth d(v) = max over tight preds d(u) + 1 (max-plus
       fixpoint) — for every tight edge d(u) < d(v), so processing
       depths ascending (sigma) / descending (delta) preserves
       Brandes' dependency order exactly as BFS layers do,
    4. sigma per depth (one join each), delta per depth backward with
       the identical (1+delta)/sigma accumulation and _rescale.

    All phases are frontier supersteps over tables keyed
    (source, id) — job count O(max DAG depth), independent of |S|.
    """
    spark = graph.spark
    verts = graph.vertices.select("id").persist()
    n = verts.count()
    if n == 0:
        verts.unpersist()
        return spark.createDataFrame([], "id long, betweenness double")
    edges = (
        (graph.weighted_edges() if graph.directed else graph.symmetrized_edges())
        .where(F.col("src") != F.col("dst"))
        .join(verts.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .join(verts.withColumnRenamed("id", "src"), "src", "left_semi")
        .groupBy("src", "dst")
        .agg(F.min("weight").alias("w"))
        .repartition(num_partitions, "src")
        .persist()
    )
    edges.count()

    if sources is None:
        if k is None:
            src_ids = [r["id"] for r in verts.collect()]
            scale_k = 1.0
        else:
            src_ids = [r["id"] for r in verts.orderBy("id").limit(k).collect()]
            scale_k = n / float(len(src_ids))
    else:
        src_ids = [int(s) for s in sources]
        scale_k = 1.0

    try:
        # ---- 1. batched multi-source Bellman-Ford ------------------
        dist = (
            spark.createDataFrame([(int(s),) for s in src_ids], "source long")
            .select("source", F.col("source").alias("id"), F.lit(0.0).alias("dist"))
            .join(verts, "id", "left_semi")
            .localCheckpoint(eager=True)
        )
        frontier = dist
        for _ in range(max_rounds):
            cand = (
                edges.join(frontier.withColumnRenamed("id", "src"), "src")
                .groupBy("source", F.col("dst").alias("id"))
                .agg(F.min(F.col("dist") + F.col("w")).alias("nd"))
            )
            improved = (
                cand.join(dist, ["source", "id"], "left")
                .where(F.col("dist").isNull() | (F.col("nd") < F.col("dist")))
                .select("source", "id", F.col("nd").alias("dist"))
                .localCheckpoint(eager=True)
            )
            if improved.limit(1).count() == 0:
                break
            dist = (
                dist.join(improved.select("source", "id"), ["source", "id"], "left_anti")
                .unionByName(improved)
                .localCheckpoint(eager=True)
            )
            frontier = improved
        else:
            raise RuntimeError("weighted betweenness relaxation did not converge")

        # ---- 2. tight shortest-path-DAG edges per source -----------
        tight = (
            edges.join(
                dist.select("source", F.col("id").alias("src"), F.col("dist").alias("ds")),
                "src",
            )
            .join(
                dist.select("source", F.col("id").alias("dst"), F.col("dist").alias("dd")),
                ["source", "dst"],
            )
            .where(F.col("ds") + F.col("w") == F.col("dd"))
            .select("source", "src", "dst")
            .repartition(num_partitions, "src")
            .persist()
        )
        tight.count()

        # ---- 3. DAG depth: max-plus fixpoint over tight edges ------
        depth = dist.select("source", "id", F.lit(0).cast("long").alias("d"))
        depth = depth.localCheckpoint(eager=True)
        frontier = depth
        for _ in range(max_rounds):
            cand = (
                tight.join(frontier.withColumnRenamed("id", "src"), ["source", "src"])
                .groupBy("source", F.col("dst").alias("id"))
                .agg(F.max(F.col("d") + 1).alias("ndp"))
            )
            moved = (
                cand.join(depth, ["source", "id"], "left")
                .where(F.col("d").isNull() | (F.col("ndp") > F.col("d")))
                .select("source", "id", F.col("ndp").alias("d"))
                .localCheckpoint(eager=True)
            )
            if moved.limit(1).count() == 0:
                break
            depth = (
                depth.join(moved.select("source", "id"), ["source", "id"], "left_anti")
                .unionByName(moved)
                .localCheckpoint(eager=True)
            )
            frontier = moved
        else:
            raise RuntimeError("weighted betweenness depth pass did not converge")
        depth = depth.persist()
        max_d = depth.agg(F.max("d")).first()[0] or 0

        # ---- 4. sigma ascending / delta descending by depth --------
        layers: list[DataFrame] = []
        sigma_acc: DataFrame | None = None
        for d in range(0, max_d + 1):
            cur_ids = depth.where(F.col("d") == d).select("source", "id")
            if d == 0:
                lay = cur_ids.select("source", "id", F.lit(1.0).alias("sigma"))
            else:
                lay = (
                    tight.join(
                        sigma_acc.withColumnRenamed("id", "src"), ["source", "src"]
                    )
                    .groupBy("source", F.col("dst").alias("id"))
                    .agg(F.sum("sigma").alias("sigma"))
                    .join(cur_ids, ["source", "id"], "left_semi")
                )
            lay = lay.localCheckpoint(eager=True)
            layers.append(lay)
            sigma_acc = (
                lay if sigma_acc is None else sigma_acc.unionByName(lay)
            ).localCheckpoint(eager=True)

        deltas: list[DataFrame] = []
        edge_credits: list[DataFrame] = []  # edge_mode: per-tight-edge terms
        delta_next: DataFrame | None = None
        for d in range(max_d, -1, -1):
            cur = layers[d]
            if delta_next is None:
                delta_cur = cur.select("source", "id", "sigma", F.lit(0.0).alias("delta"))
            else:
                contrib = (
                    tight.join(
                        delta_next.select(
                            "source",
                            F.col("id").alias("dst"),
                            ((1.0 + F.col("delta")) / F.col("sigma")).alias("wterm"),
                        ),
                        ["source", "dst"],
                    )
                    .groupBy("source", F.col("src").alias("id"))
                    .agg(F.sum("wterm").alias("wsum"))
                )
                delta_cur = cur.join(contrib, ["source", "id"], "left").select(
                    "source",
                    "id",
                    "sigma",
                    (F.col("sigma") * F.coalesce("wsum", F.lit(0.0))).alias("delta"),
                )
            delta_cur = delta_cur.localCheckpoint(eager=True)
            if edge_mode and d > 0:
                # every tight edge's dst has exactly one depth, so each
                # edge is credited exactly once — at the step its dst's
                # delta became final: credit = sigma(v)*(1+delta(w))/sigma(w)
                # (_accumulate_edges, betweenness.py:190)
                ec = (
                    tight.join(
                        delta_cur.select(
                            "source",
                            F.col("id").alias("dst"),
                            ((1.0 + F.col("delta")) / F.col("sigma")).alias("wterm"),
                        ),
                        ["source", "dst"],
                    )
                    .join(
                        sigma_acc.select(
                            "source",
                            F.col("id").alias("src"),
                            F.col("sigma").alias("sig_v"),
                        ),
                        ["source", "src"],
                    )
                    .groupBy("src", "dst")
                    .agg(F.sum(F.col("sig_v") * F.col("wterm")).alias("credit"))
                    .localCheckpoint(eager=True)
                )
                edge_credits.append(ec)
            if d > 0:
                deltas.append(delta_cur.select("id", "delta"))
            # delta flows along tight edges from ALL deeper layers,
            # not just d+1: accumulate processed layers
            delta_next = (
                delta_cur
                if delta_next is None
                else delta_next.unionByName(delta_cur).localCheckpoint(eager=True)
            )

        if edge_mode:
            # rescale (_rescale_e): normalized -> 1/(n(n-1));
            # unnormalized undirected -> 1/2 (both orientations summed)
            if normalized:
                e_scale = 1.0 / (n * (n - 1)) if n > 1 else 1.0
            else:
                e_scale = 1.0 if graph.directed else 0.5
            e_factor = e_scale * scale_k
            if edge_credits:
                acc_e = edge_credits[0]
                for ee in edge_credits[1:]:
                    acc_e = acc_e.unionByName(ee)
            else:
                acc_e = spark.createDataFrame(
                    [], "src long, dst long, credit double"
                )
            base = edges.select("src", "dst")
            if not graph.directed:
                acc_e = acc_e.select(
                    F.least("src", "dst").alias("src"),
                    F.greatest("src", "dst").alias("dst"),
                    "credit",
                )
                base = base.select(
                    F.least("src", "dst").alias("src"),
                    F.greatest("src", "dst").alias("dst"),
                ).distinct()
            out_e = (
                base.join(
                    acc_e.groupBy("src", "dst").agg(F.sum("credit").alias("c")),
                    ["src", "dst"],
                    "left",
                )
                .select(
                    "src",
                    "dst",
                    (F.coalesce("c", F.lit(0.0)) * F.lit(e_factor)).alias(
                        "betweenness"
                    ),
                )
                .persist()
            )
            out_e.count()
            return out_e

        if deltas:
            acc = deltas[0]
            for dd in deltas[1:]:
                acc = acc.unionByName(dd)
            bc = acc.groupBy("id").agg(F.sum("delta").alias("b"))
        else:
            bc = spark.createDataFrame([], "id long, b double")
        if normalized:
            scale = 1.0 / ((n - 1) * (n - 2)) if n > 2 else None
        else:
            scale = None if graph.directed else 0.5
        factor = scale * scale_k if scale is not None else 1.0
        out = (
            verts.join(bc, "id", "left")
            .select(
                "id",
                (F.coalesce("b", F.lit(0.0)) * F.lit(factor)).alias("betweenness"),
            )
            .persist()
        )
        out.count()
        return out
    finally:
        edges.unpersist()
        verts.unpersist()


def _incoming_distances(graph: LinkGraph, node_id: int, weight: bool) -> DataFrame:
    """(id, d DOUBLE) — distances INTO ``node_id`` (closeness.py:103
    reverses directed graphs). BFS hop counts, or Bellman-Ford weighted
    lengths when ``weight`` (the reference's ``distance=`` param,
    closeness.py:77 / harmonic.py:44)."""
    g = graph.reverse() if graph.directed else graph
    if weight:
        from .shortest_paths import single_source_bellman_ford_path_length

        return single_source_bellman_ford_path_length(g, node_id, weight=True).select(
            "id", F.col("dist").cast("double").alias("d")
        )
    from .traversal import bfs_layers

    return bfs_layers(g, [node_id]).select(
        "id", F.col("layer").cast("double").alias("d")
    )


def closeness_centrality(
    graph: LinkGraph, node_id: int, wf_improved: bool = True,
    weight: bool = False,
) -> float:
    """Closeness of one node — (r-1)/Σd scaled by (r-1)/(n-1) when
    ``wf_improved`` (networkx/algorithms/centrality/closeness.py:20-120:
    uses INCOMING distances, hence BFS over the reversed view;
    ``weight=True`` swaps BFS for the Bellman-Ford length table —
    the reference's ``distance='weight'`` mode, closeness.py:77).
    Per-node by nature: the distributed cost is one sweep; corpus-wide
    closeness is the sampled/targeted form, not all-pairs."""
    dists = _incoming_distances(graph, node_id, weight)
    row = dists.agg(
        F.count(F.lit(1)).alias("r"), F.sum("d").alias("tot")
    ).first()
    r, tot = row["r"], row["tot"]
    if r <= 1 or not tot:
        return 0.0
    cc = (r - 1) / float(tot)
    if wf_improved:
        n = graph.num_vertices()
        cc *= (r - 1) / float(n - 1) if n > 1 else 0.0
    return cc


def harmonic_centrality(
    graph: LinkGraph, node_id: int, weight: bool = False
) -> float:
    """Harmonic centrality of one node — Σ 1/d(u, v) over incoming
    distances (networkx/algorithms/centrality/harmonic.py:12-72;
    ``weight=True`` = the reference's ``distance='weight'``)."""
    dists = _incoming_distances(graph, node_id, weight)
    val = (
        dists.where(F.col("d") > 0)
        .agg(F.sum(1.0 / F.col("d")))
        .first()[0]
    )
    return float(val or 0.0)


def sampled_closeness_harmonic(
    graph: LinkGraph,
    sources: Iterable[int] | DataFrame,
    local_max_edges: int | None = None,
) -> DataFrame:
    """(id, n_reached BIGINT, dist_sum BIGINT, harmonic_sum DOUBLE) —
    per-node incoming-distance aggregates over a SAMPLE of origins:
    one batched multi-source BFS from the sampled sources
    (``multi_source_bfs_layers``), then a groupBy over the target id.

    ``harmonic_sum(v) = Σ_{u∈S, d(u,v)>0} 1/d(u,v)`` is the
    pivot-sampled harmonic centrality (exact when S = V —
    networkx/algorithms/centrality/harmonic.py:12); ``dist_sum`` and
    ``n_reached`` feed the Eppstein–Wang closeness estimator
    ``ĉ(v) ≈ (k·(n-1)) / (n·dist_sum)``. Nodes reached by no sampled
    origin get zeros. Cost: O(diameter) shuffles on the BITSET state
    (``multi_source_bfs_counts`` — O(n·|S|/64) rows; the estimators
    only need per-target counts per layer, never the explicit
    (source, target) pairs) — the sample size is the scale knob,
    never the graph."""
    from .traversal import LOCAL_MSBFS_MAX_EDGES, multi_source_bfs_counts

    if local_max_edges is None:
        local_max_edges = LOCAL_MSBFS_MAX_EDGES
    msb = multi_source_bfs_counts(graph, sources, local_max_edges=local_max_edges)
    agg = (
        msb.where(F.col("layer") > 0)
        .groupBy("id")
        .agg(
            F.sum("n_src").alias("n_reached"),
            F.sum(F.col("layer").cast("long") * F.col("n_src")).alias("dist_sum"),
            F.sum(F.col("n_src") / F.col("layer")).alias("harmonic_sum"),
        )
    )
    return (
        graph.vertices.select("id")
        .join(agg, "id", "left")
        .select(
            "id",
            F.coalesce("n_reached", F.lit(0)).alias("n_reached"),
            F.coalesce("dist_sum", F.lit(0)).alias("dist_sum"),
            F.coalesce("harmonic_sum", F.lit(0.0)).alias("harmonic_sum"),
        )
    )


def eigenvector_centrality(
    graph: LinkGraph,
    max_iter: int = 100,
    tol: float = 1.0e-6,
    nstart: dict | None = None,
    weight: bool = True,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    fixed_iter: int | None = None,
    local_max_edges: int = LOCAL_CENTRALITY_MAX_EDGES,
) -> DataFrame:
    """Returns (id BIGINT, centrality DOUBLE).

    ``fixed_iter`` runs exactly that many supersteps with no
    convergence action (oracle parity / benchmarking), mirroring the
    pagerank/hits contract. ``weight=False`` treats every edge as 1
    (the reference's ``weight=None``).
    """
    spark = graph.spark
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    base = graph.weighted_edges() if graph.directed else graph.symmetrized_edges()
    if not weight:
        base = base.select("src", "dst", F.lit(1.0).alias("weight"))

    nodes = graph.vertices.select("id").repartition(num_partitions, "id").persist()
    n = nodes.count()
    if n == 0:
        nodes.unpersist()
        return spark.createDataFrame([], "id long, centrality double")

    if nstart is None:
        x = nodes.select("id", F.lit(1.0 / n).alias("centrality"))
    else:
        if all(v == 0 for v in nstart.values()):
            raise ValueError("initial vector cannot have all zero values")
        s = float(sum(nstart.values()))
        xv = spark.createDataFrame(
            [(int(k), float(v) / s) for k, v in nstart.items()],
            "id long, centrality double",
        )
        x = nodes.join(xv, "id", "left").select(
            "id", F.coalesce("centrality", F.lit(0.0)).alias("centrality")
        )

    # single-task numpy kernel below the size gate (cost-model
    # physical choice; never when checkpointing was requested)
    if local_max_edges and checkpoint_dir is None:
        ep = base.persist()
        if ep.count() <= local_max_edges:
            try:
                return _finish_local_centrality(
                    _local_power_iteration(
                        x.withColumnRenamed("centrality", "x0"), ep,
                        "eigen", n, tol, max_iter, fixed_iter,
                    ),
                    max_iter,
                )
            finally:
                ep.unpersist()
                nodes.unpersist()
        ep.unpersist()

    adj = build_adjacency(
        base, num_partitions=num_partitions, coalesce_parallel=True, normalize=False
    ).persist()
    adj.count()

    loop = SuperstepLoop(
        spark,
        "eigenvector",
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
    )
    x = loop.start(x.repartition(num_partitions, "id"))

    def superstep(x_cur: DataFrame) -> DataFrame:
        gathered = (
            adj.join(x_cur.withColumnRenamed("id", "src"), "src")
            .select(F.explode("pairs").alias("z"), "centrality")
            .select(
                F.col("z.dsts").alias("id"),
                (F.col("centrality") * F.col("z.wts")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("gathered"))
        )
        raw = x_cur.join(gathered, "id", "left").select(
            "id",
            (F.col("centrality") + F.coalesce("gathered", F.lit(0.0))).alias(
                "centrality"
            ),
        )
        norm = raw.agg(
            F.sqrt(F.sum(F.col("centrality") * F.col("centrality"))).alias("nrm")
        )
        return raw.crossJoin(F.broadcast(norm)).select(
            "id",
            (
                F.col("centrality")
                / F.when(F.col("nrm") > 0, F.col("nrm")).otherwise(F.lit(1.0))
            ).alias("centrality"),
        )

    def l1(prev: DataFrame, new: DataFrame) -> dict:
        err = (
            new.join(
                prev.select("id", F.col("centrality").alias("c_prev")), "id"
            )
            .agg(F.sum(F.abs(F.col("centrality") - F.col("c_prev"))))
            .first()[0]
        )
        return {"l1_error": err}

    niter = fixed_iter if fixed_iter is not None else max_iter
    converged = fixed_iter is not None
    try:
        for _ in range(niter):
            x_new = superstep(x)
            if fixed_iter is not None:
                x, _ = loop.advance(x_new, metrics_fn=lambda p, n_: {"rows": n_.count()})
                continue
            x, m = loop.advance(x_new, metrics_fn=l1)
            if m["l1_error"] < n * tol:
                converged = True
                break
        if not converged:
            raise PowerIterationFailedConvergence(max_iter)
        out = x.persist()
        out.count()
        return out
    finally:
        adj.unpersist()
        nodes.unpersist()


def katz_centrality(
    graph: LinkGraph,
    alpha: float = 0.1,
    beta: float = 1.0,
    max_iter: int = 1000,
    tol: float = 1.0e-6,
    weight: bool = True,
    normalized: bool = True,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    fixed_iter: int | None = None,
    local_max_edges: int = LOCAL_CENTRALITY_MAX_EDGES,
) -> DataFrame:
    """Returns (id BIGINT, centrality DOUBLE) — Katz centrality by
    power iteration (networkx/algorithms/centrality/katz.py:12):
    ``x_new(v) = alpha * Σ_{u→v} w(u,v)·x(u) + beta``, converged when
    ``Σ|x_new - x| < n·tol``, then L2-normalized (``normalized=True``,
    the reference default).

    Same physical plan as pagerank/eigenvector: the salted CSR
    adjacency is built once and persisted, every superstep is one
    gather join + map-side partial sum, beta rides the plan as a
    literal. ``fixed_iter`` runs exactly that many supersteps with no
    convergence action (oracle parity / benchmarking).
    """
    spark = graph.spark
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    base = graph.weighted_edges() if graph.directed else graph.symmetrized_edges()
    if not weight:
        base = base.select("src", "dst", F.lit(1.0).alias("weight"))

    nodes = graph.vertices.select("id").repartition(num_partitions, "id").persist()
    n = nodes.count()
    if n == 0:
        nodes.unpersist()
        return spark.createDataFrame([], "id long, centrality double")

    # single-task numpy kernel below the size gate
    if local_max_edges and checkpoint_dir is None:
        ep = base.persist()
        if ep.count() <= local_max_edges:
            try:
                return _finish_local_centrality(
                    _local_power_iteration(
                        nodes.select("id", F.lit(0.0).alias("x0")), ep,
                        "katz", n, tol, max_iter, fixed_iter,
                        alpha=alpha, beta=beta, normalized=normalized,
                    ),
                    max_iter,
                )
            finally:
                ep.unpersist()
                nodes.unpersist()
        ep.unpersist()

    adj = build_adjacency(
        base, num_partitions=num_partitions, coalesce_parallel=True, normalize=False
    ).persist()
    adj.count()

    loop = SuperstepLoop(
        spark,
        "katz",
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
    )
    x = loop.start(
        nodes.select("id", F.lit(0.0).alias("centrality")).repartition(
            num_partitions, "id"
        )
    )

    def superstep(x_cur: DataFrame) -> DataFrame:
        gathered = (
            adj.join(x_cur.withColumnRenamed("id", "src"), "src")
            .select(F.explode("pairs").alias("z"), "centrality")
            .select(
                F.col("z.dsts").alias("id"),
                (F.col("centrality") * F.col("z.wts")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("gathered"))
        )
        return x_cur.join(gathered, "id", "left").select(
            "id",
            (
                F.lit(float(alpha)) * F.coalesce("gathered", F.lit(0.0))
                + F.lit(float(beta))
            ).alias("centrality"),
        )

    def l1(prev: DataFrame, new: DataFrame) -> dict:
        err = (
            new.join(prev.select("id", F.col("centrality").alias("c_prev")), "id")
            .agg(F.sum(F.abs(F.col("centrality") - F.col("c_prev"))))
            .first()[0]
        )
        return {"l1_error": err}

    niter = fixed_iter if fixed_iter is not None else max_iter
    converged = fixed_iter is not None
    try:
        for _ in range(niter):
            x_new = superstep(x)
            if fixed_iter is not None:
                x, _ = loop.advance(x_new, metrics_fn=lambda p, n_: {"rows": n_.count()})
                continue
            x, m = loop.advance(x_new, metrics_fn=l1)
            if m["l1_error"] < n * tol:
                converged = True
                break
        if not converged:
            raise PowerIterationFailedConvergence(max_iter)
        if normalized:
            nrm = x.agg(
                F.sqrt(F.sum(F.col("centrality") * F.col("centrality"))).alias("nrm")
            )
            x = x.crossJoin(F.broadcast(nrm)).select(
                "id",
                (
                    F.col("centrality")
                    / F.when(F.col("nrm") > 0, F.col("nrm")).otherwise(F.lit(1.0))
                ).alias("centrality"),
            )
        out = x.persist()
        out.count()
        return out
    finally:
        adj.unpersist()
        nodes.unpersist()


def edge_betweenness_centrality(
    graph: LinkGraph,
    k: int | None = None,
    sources: list[int] | None = None,
    normalized: bool = True,
    num_partitions: int | None = None,
    weight: bool = False,
    local_max_edges: int = LOCAL_CENTRALITY_MAX_EDGES,
) -> DataFrame:
    """(src, dst, betweenness DOUBLE) — Brandes edge betweenness
    (networkx/algorithms/centrality/betweenness.py:190
    ``edge_betweenness_centrality`` / ``_accumulate_edges``),
    unweighted, over the same batched multi-source sweep as
    ``betweenness_centrality``: the backward pass's per-DAG-edge term
    sigma(v)·(1+delta(w))/sigma(w) IS the edge credit, summed across
    sources and layers. Undirected edges are reported once on the
    canonical (src<dst) key. Zero-credit edges are included (the
    reference initializes all edges to 0)."""
    return betweenness_centrality(
        graph,
        k=k,
        sources=sources,
        normalized=normalized,
        num_partitions=num_partitions,
        _edge_mode=True,
        weight=weight,
        local_max_edges=local_max_edges,
    )
