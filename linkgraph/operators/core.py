"""k-core decomposition by iterative peeling.

Reference semantics (networkx/algorithms/core.py): ``k_core(G, k)`` is
the maximal subgraph where every node has degree >= k; ``core_number``
assigns each node the largest k of a k-core containing it. The
reference peels via a sequential bucket sort (core.py ``core_number``,
O(m)); distributed peeling removes ALL sub-k nodes each round —
O(rounds) joins, rounds <= peeling depth (tiny for web graphs whose
degree distribution is heavy-tailed).

Self-loop note: the reference raises on self-loops for core_number;
here they are dropped up front (consistent with the triangles
operator's handling, networkx/algorithms/cluster.py:62).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.loop import stable_checkpoint
from ._local import member_maps, run_local_kernel

# same cost-model gates as the siblings (_local.py module docstring):
# below a few million edges the whole peeling loop runs inside one
# Arrow task instead of paying the per-job floor dozens of times
LOCAL_CORE_MAX_EDGES = 2_000_000
# truss crossover (re-measured r5, after the distributed lane switched
# to incremental support maintenance): on the part co-occurrence graph
# local wins 3.2x at 116k edges (3.4 vs 10.8 s — per-round job floors
# still dominate at toy scale) while the distributed plan wins ~3x at
# 1.2M edges (27 vs 77.5 s; it was a TIE at 73.5 s before r5's
# one-enumeration + delta-probe peeling) — the 400k gate still sits
# between the two certified measurements
LOCAL_TRUSS_MAX_EDGES = 400_000


def _simple_undirected_edges(graph: LinkGraph) -> DataFrame:
    """Canonical simple undirected edge set, self-loops removed."""
    e = graph.edges.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    )
    return e.where(F.col("src") != F.col("dst")).distinct()


def k_core(graph: LinkGraph, k: int, max_rounds: int | None = None) -> LinkGraph:
    """Maximal subgraph with all degrees >= k (networkx/algorithms/core.py
    ``k_core``). Returns a LinkGraph over the surviving vertices and
    canonical undirected edges.

    Computed via the identity k_core(G, k) = induced subgraph on
    {v : core_number(v) ≥ k} — NOT round-by-round sub-k peeling. The
    peeling loop this replaces cascades one wave per round, O(n)
    rounds on a path (k=2 peels two endpoints per round), and with a
    bounded round budget it SILENTLY returned a non-maximal remainder
    (round-4 bug class: k_core(520-path, 2) returned 119 edges instead
    of 0). ``core_number`` is exact at every size (gated single-task
    BZ peeling below 2M edges; the h-index fixpoint above, which
    RAISES on non-convergence instead of lying). ``max_rounds`` is
    retained for API compatibility only — passing it warns, because a
    caller who used it to CAP cost now gets the full (exact)
    core_number computation instead."""
    if max_rounds is not None:
        import warnings

        warnings.warn(
            "k_core(max_rounds=) is ignored since the round-4 switch to "
            "the exact core_number>=k identity; the bound no longer caps "
            "cost and will be removed",
            DeprecationWarning,
            stacklevel=2,
        )
    if k <= 0:
        # nx.k_core(G, 0) is the whole graph — including isolates
        # (networkx/algorithms/core.py k_core with k=0 filters nothing)
        return LinkGraph(
            vertices=graph.vertices,
            edges=_simple_undirected_edges(graph).withColumn("weight", F.lit(1.0)),
            directed=False,
        )
    c = core_number(graph)
    return _induced_on(graph, c.where(F.col("core") >= k))


def _h_index_expr(hst) -> F.Column:
    """h-index of a neighbor-estimate HISTOGRAM: ``hst`` is an
    ascending-sorted array<struct<c_dst, cnt>>; walking it DESCENDING
    with running suffix count ge(c) = #neighbors with estimate ≥ c,
    h = max over distinct estimates c of min(c, ge(c)).

    Identity proof: let h be the true h-index (largest h with
    ge(h) ≥ h). For the smallest distinct value c' ≥ h, ge(c') = ge(h)
    ≥ h and c' ≥ h, so the max is ≥ h. Conversely if some distinct c
    had min(c, ge(c)) = m > h, then ge(m) ≥ ge(c) ≥ m would contradict
    h's maximality. One hash-agg fold per src — no sort window."""
    zero = F.struct(
        F.lit(0).cast("long").alias("run"), F.lit(0).cast("long").alias("best")
    )
    return F.aggregate(
        F.reverse(hst),  # descending by estimate value
        zero,
        lambda acc, x: F.struct(
            (acc["run"] + x["cnt"]).alias("run"),
            F.greatest(
                acc["best"], F.least(x["c_dst"], acc["run"] + x["cnt"])
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def _local_core_number(
    graph: LinkGraph, edges: DataFrame | None = None
) -> DataFrame:
    """Single-task exact k-core decomposition: the Batagelj–Zaversnik
    (2003) O(m) bucket peeling — the SAME algorithm the reference's
    sequential ``core_number`` implements with dicts
    (networkx/algorithms/core.py:96-135) — over numpy-built CSR with
    python-list buckets for the sequential pop/decrement loop (list
    indexing is ~3× numpy scalar indexing there). Exact, so it agrees
    with the distributed h-index fixpoint bit-for-bit; the
    ``core_number_parts_dist`` entry twin keeps the superstep plan
    hash-verified."""

    def kernel(ids, stat, es, ed, ew):
        import numpy as np

        nv = len(ids)
        si, di, ms, mdm = member_maps(ids, es, ed)
        ok = ms & mdm & (si != di)
        a, b = si[ok], di[ok]
        if len(a):
            key = np.unique(
                np.minimum(a, b).astype(np.int64) * nv + np.maximum(a, b)
            )
            a, b = key // nv, key % nv
        s2 = np.concatenate([a, b])
        d2 = np.concatenate([b, a])
        order = np.argsort(s2, kind="stable")
        adj = d2[order]
        degarr = np.bincount(s2, minlength=nv)
        indptr = np.concatenate(([0], np.cumsum(degarr)))
        vert = np.argsort(degarr, kind="stable")
        pos = np.empty(nv, dtype=np.int64)
        pos[vert] = np.arange(nv)
        maxd = int(degarr.max()) if nv else 0
        counts = np.bincount(degarr, minlength=maxd + 1)
        bins = np.concatenate(([0], np.cumsum(counts)))[:-1].tolist()
        vert_l, pos_l = vert.tolist(), pos.tolist()
        degs, adj_l, ptr = degarr.tolist(), adj.tolist(), indptr.tolist()
        for i in range(nv):
            v = vert_l[i]
            dv = degs[v]
            for t in range(ptr[v], ptr[v + 1]):
                u = adj_l[t]
                du = degs[u]
                if du > dv:
                    pu = pos_l[u]
                    pw = bins[du]
                    w = vert_l[pw]
                    if u != w:
                        vert_l[pu] = w
                        vert_l[pw] = u
                        pos_l[u] = pw
                        pos_l[w] = pu
                    bins[du] = pw + 1
                    degs[u] = du - 1
        return {"id": ids, "core": np.asarray(degs, dtype=np.int64)}

    return run_local_kernel(
        edges if edges is not None else graph.weighted_edges(),
        graph.vertices.select("id"),
        [],
        kernel,
        "id long, core long",
    )


def core_number(
    graph: LinkGraph,
    max_iters: int = 500,
    local_max_edges: int = LOCAL_CORE_MAX_EDGES,
) -> DataFrame:
    """(id, core) — the largest k such that id is in the k-core
    (networkx/algorithms/core.py ``core_number``).

    Single-superstep-loop distributed form (Montresor et al.,
    "Distributed k-Core Decomposition", IEEE TPDS 2013): every node
    starts at c = degree and repeatedly sets c to the h-index of its
    neighbors' current estimates (largest h with ≥ h neighbors whose
    estimate is ≥ h). The sequence is monotone non-increasing and its
    fixpoint is exactly the core number — ONE loop for all k, job
    count independent of k_max (vs the O(k_max) full-peeling runs this
    replaces).

    Per iteration: one equi-join of edges against estimates (shuffle
    on dst), then the h-index via a two-level HISTOGRAM aggregation —
    ``groupBy(src, c_dst).count()`` (map-side partial agg: a
    10⁶-degree hub's rows combine locally per estimate value before
    any shuffle) followed by a per-src hash-agg collecting the
    (estimate, count) histogram and folding it descending:
    h = max over distinct estimates c of min(c, #neighbors with
    estimate ≥ c) — an identity of the h-index, proof in
    ``_h_index_expr``. No window, no per-src neighborhood sort
    anywhere in the plan (the round-2 hub-sort weakness, paid).

    Converges in rounds proportional to graph "locality" — small for
    dense web cores; worst case (long induced paths) is O(path length),
    so ``max_iters`` is generous and exhaustion raises rather than
    returning a silently-wrong labeling.

    r5: the loop is DELTA-FRONTIER — each round recomputes h only for
    neighbors of nodes that changed last round (lossless: a node whose
    neighbors all held still cannot change), so total gather work is
    ~Σ frontier degrees instead of rounds × m. At 20M edges the
    certified wall matches the full-recompute loop (295 vs ~310 s,
    identical checksum) with the tail rounds touching only the active
    region — the term that dominates at 100× scale; at the 1.2M-edge
    pin it costs ~9 s of extra per-round job floors (64 vs 55 s),
    below the local gate where users get the 10.8 s BZ kernel anyway.

    Below ``local_max_edges`` the whole loop runs as one Arrow task
    (exact BZ peeling, :func:`_local_core_number`) — the size-gated
    physical choice every sibling iterative operator makes; the
    ``*_dist`` entry twin pins this superstep plan.
    """
    if local_max_edges:
        # persist the edge projection before the gate count and hand
        # the SAME persisted plan to the local kernel (k_truss gate
        # pattern — ADVICE r4: counting the unpersisted plan and then
        # re-deriving weighted_edges() evaluated a possibly expensive
        # edge derivation twice)
        we = graph.weighted_edges().persist()
        if we.count() <= local_max_edges:
            out = _local_core_number(graph, edges=we).localCheckpoint(
                eager=True
            )
            we.unpersist()
            return out
        we.unpersist()
    spark = graph.spark
    num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    canon = _simple_undirected_edges(graph)
    edges = (
        canon.unionByName(
            canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .repartition(num_partitions, "dst")
        .persist()
    )
    edges.count()

    c = stable_checkpoint(
        edges.groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("core"))
    )
    # delta frontier (r5 — Montresor et al.'s own locality argument):
    # a node's h-index reads only its NEIGHBORS' estimates, and
    # estimates are monotone non-increasing, so a node whose neighbors
    # all held still this round cannot change next round. Each round
    # recomputes h only for neighbors-of-changed; everyone else keeps
    # their estimate EXACTLY (skipping is lossless, not approximate).
    # Round 1 starts from changed = all nodes (the full recompute),
    # tail rounds touch only the shrinking active region — total work
    # ~ sum of frontier degrees instead of rounds × m.
    # stable_checkpoint everywhere in this loop: c is referenced
    # multiple times per round (hist join + delta compare + rebuild),
    # so plain localCheckpoint's carried origin stats SQUARE per round
    # (plans/loop.py:41 — the r3 driver-BigInteger stall; re-observed
    # here as round walls growing 1 s -> 4 s while the frontier
    # shrank)
    changed = stable_checkpoint(c.select("id"))
    n_changed = 1  # enter the loop; real count maintained below

    converged = False
    for _ in range(max_iters):
        if n_changed == 0:
            converged = True
            break
        frontier = (
            edges.join(
                changed.withColumnRenamed("id", "dst"), "dst", "left_semi"
            )
            .select(F.col("src").alias("id"))
            .distinct()
        )
        hist = (
            edges.join(frontier.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(
                c.select(F.col("id").alias("dst"), F.col("core").alias("c_dst")),
                "dst",
            )
            .groupBy("src", "c_dst")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        h = (
            hist.groupBy(F.col("src").alias("id"))
            .agg(
                F.array_sort(F.collect_list(F.struct("c_dst", "cnt"))).alias(
                    "hst"
                )
            )
            .select("id", _h_index_expr(F.col("hst")).alias("core"))
        )
        delta = (
            h.withColumnRenamed("core", "c_new")
            .join(c.withColumnRenamed("core", "c_old"), "id")
            .where(F.col("c_new") != F.col("c_old"))
            .select("id", F.col("c_new").alias("core"))
        )
        delta = stable_checkpoint(delta)
        n_changed = delta.count()
        if n_changed == 0:
            converged = True
            break
        c = stable_checkpoint(
            c.join(delta.withColumnRenamed("core", "c_new"), "id", "left")
            .select("id", F.coalesce("c_new", "core").alias("core"))
        )
        changed = delta.select("id")
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"core_number did not converge within max_iters={max_iters}"
        )
    # isolated vertices (and self-loop-only vertices) have core 0
    return graph.vertices.select("id").join(c, "id", "left").select(
        "id", F.coalesce("core", F.lit(0)).cast("long").alias("core")
    )


def _local_k_truss_edges(edges_df: DataFrame, k: int) -> DataFrame:
    """Single-task k-truss peeling: iterate (orient by current degree →
    vectorized wedge enumeration → closing probe → per-edge support
    bincount → drop support < k−2) until stable, all inside one
    ``mapInPandas`` task. The wedge machinery is the triangles local
    kernel's (triangles.py ``_local_all_triangles``) with the closing
    hit also mapped back to its canonical edge index so support is one
    ``np.bincount`` over the three edge slots per triangle. The exact
    oriented-wedge total is checked per round BEFORE any O(wedges)
    allocation; exceeding ``LOCAL_TRI_MAX_WEDGE_BOUND`` emits the
    all-NULL sentinel row and the caller falls back to the distributed
    peeling plan."""
    from .triangles import LOCAL_TRI_MAX_WEDGE_BOUND

    ep = edges_df.select("src", "dst").coalesce(1)

    def fn(batches):
        import numpy as np
        import pandas as pd

        dfs = list(batches)
        empty = pd.DataFrame(
            {"src": np.empty(0, np.int64), "dst": np.empty(0, np.int64)}
        )
        if not dfs:
            yield empty
            return
        e = pd.concat(dfs, ignore_index=True)
        if not len(e):
            yield empty
            return
        s_raw = e["src"].to_numpy(dtype="int64")
        t_raw = e["dst"].to_numpy(dtype="int64")
        uniq, inv = np.unique(
            np.concatenate([s_raw, t_raw]), return_inverse=True
        )
        n = len(uniq)
        s = inv[: len(s_raw)]
        t = inv[len(s_raw):]
        keep = s != t
        ekey = np.unique(
            np.minimum(s[keep], t[keep]).astype(np.int64) * n
            + np.maximum(s[keep], t[keep])
        )
        while len(ekey):
            a = (ekey // n).astype(np.int64)
            b = (ekey % n).astype(np.int64)
            deg = np.bincount(a, minlength=n) + np.bincount(b, minlength=n)
            first = (deg[a] < deg[b]) | ((deg[a] == deg[b]) & (a < b))
            lo = np.where(first, a, b)
            hi = np.where(first, b, a)
            order = np.argsort(lo, kind="stable")
            lo_s, hi_s = lo[order], hi[order]
            eidx_s = order  # wedge-pivot position -> canonical edge index
            counts = np.bincount(lo_s, minlength=n).astype(np.int64)
            if int((counts * (counts - 1) // 2).sum()) > LOCAL_TRI_MAX_WEDGE_BOUND:
                yield pd.DataFrame(
                    {"src": [None], "dst": [None]}, dtype="Int64"
                )
                return
            counts = counts.astype(np.int32)
            m = len(lo_s)
            starts = np.concatenate(([0], np.cumsum(counts, dtype=np.int32)))[:-1]
            pos = np.arange(m, dtype=np.int32) - np.repeat(starts, counts)
            rep = np.repeat(counts, counts) - 1 - pos
            i_idx = np.repeat(np.arange(m, dtype=np.int32), rep)
            if len(i_idx):
                cum = np.cumsum(rep, dtype=np.int32)
                run_start = np.repeat(cum - rep, rep)
                j_idx = i_idx + 1 + (
                    np.arange(len(i_idx), dtype=np.int32) - run_start
                )
                wb, wc = hi_s[i_idx], hi_s[j_idx]
                lo_w = np.minimum(wb, wc)
                hi_w = np.maximum(wb, wc)
                wkey = lo_w.astype(np.int64) * n + hi_w
                at = np.searchsorted(ekey, wkey)
                at[at >= len(ekey)] = len(ekey) - 1
                hit = ekey[at] == wkey
                sup = np.bincount(
                    np.concatenate(
                        [eidx_s[i_idx[hit]], eidx_s[j_idx[hit]], at[hit]]
                    ),
                    minlength=len(ekey),
                )
            else:
                sup = np.zeros(len(ekey), dtype=np.int64)
            keepmask = sup >= k - 2
            if keepmask.all():
                break
            ekey = ekey[keepmask]
        yield pd.DataFrame(
            {"src": uniq[(ekey // n)], "dst": uniq[(ekey % n)]}
        )

    return ep.mapInPandas(fn, "src long, dst long")


def k_truss(
    graph: LinkGraph,
    k: int,
    max_rounds: int = 200,
    local_max_edges: int = LOCAL_TRUSS_MAX_EDGES,
    stats_out: dict | None = None,
) -> LinkGraph:
    """Maximal subgraph whose every edge lies in >= k-2 triangles OF
    THE SUBGRAPH (networkx/algorithms/core.py ``k_truss``; the
    reference also drops nodes isolated by the peeling, so the result
    keeps only edge endpoints).

    Distributed peeling with INCREMENTAL SUPPORT MAINTENANCE (r5 —
    the round-4 plan re-enumerated the O(m^1.5) wedge stream every
    round, so cost was rounds × m^1.5 and one thread tied 32 cores at
    1.2M edges): the oriented-wedge triangle enumeration now runs
    exactly ONCE to seed a per-edge support table; each peel round
    then (1) removes edges with support < k-2, (2) enumerates only the
    triangles DESTROYED by the removal — a common-neighbor probe
    R ⋈ adj ⋈ adj, the same device as the incremental triangle
    refresher (streaming/incremental.py) — deduped by sorted corner so
    a triangle losing 2-3 edges in one round decrements once, and
    (3) subtracts the per-edge destroyed-triangle counts from the
    survivors' supports. Total probe work across ALL rounds is bounded
    by the number of triangles destroyed (≤ the triangle count),
    instead of rounds × full re-enumeration; per round the support
    table is rewritten once (O(m_round) shuffle on (src, dst)) and
    localCheckpointed (bounded lineage, see dag.py note).

    The initial enumeration orients edges by degree (the same
    (degree, id) total order as ``all_triangles``): wedge pivots have
    out-degree ≤ O(√m), so the self-join never explodes on Zipf hubs;
    the closing probe keeps the shuffle_hash build (unique-key edge
    table, never sorts the wedge stream).
    """
    if k < 2:
        raise ValueError("k_truss requires k >= 2")
    spark = graph.spark
    if local_max_edges:
        raw = graph.edges.select("src", "dst").persist()
        if raw.count() <= local_max_edges:
            res = _local_k_truss_edges(raw, k).persist()
            if res.where(F.col("src").isNull()).isEmpty():
                raw.unpersist()
                verts = (
                    res.select(F.col("src").alias("id"))
                    .unionByName(res.select(F.col("dst").alias("id")))
                    .distinct()
                )
                return LinkGraph(
                    vertices=verts,
                    edges=res.withColumn("weight", F.lit(1.0)),
                    directed=False,
                )
            res.unpersist()
        raw.unpersist()
    num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        _simple_undirected_edges(graph)
        .repartition(num_partitions, "src", "dst")
        .localCheckpoint(eager=True)
    )
    # ---- seed supports: ONE oriented-wedge enumeration ----
    both = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = both.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranked = (
        e.join(
            deg.select(F.col("src").alias("_u"), F.col("deg").alias("du")),
            F.col("src") == F.col("_u"),
        ).drop("_u")
        .join(
            deg.select(F.col("src").alias("_v"), F.col("deg").alias("dv")),
            F.col("dst") == F.col("_v"),
        ).drop("_v")
    )
    src_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("src") < F.col("dst"))
    )
    o = ranked.select(
        F.when(src_first, F.col("src")).otherwise(F.col("dst")).alias("lo"),
        F.when(src_first, F.col("dst")).otherwise(F.col("src")).alias("hi"),
    )
    w1 = o.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    w2 = o.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    wedges = w1.join(w2, "a").where(F.col("b") < F.col("c"))
    tri = wedges.join(
        # shuffle-hash: build side is the unique-key edge set, so the
        # wedge stream probes without being sorted (same device as
        # all_triangles' closing join); b<c rows of the canonical e
        # are exactly the candidate closing edges
        e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
        .hint("shuffle_hash"),
        ["b", "c"],
        "left_semi",
    )
    sup0 = (
        tri.select(
            F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst")
        )
        .unionByName(
            tri.select(
                F.least("b", "c").alias("src"), F.greatest("b", "c").alias("dst")
            )
        )
        .unionByName(
            tri.select(
                F.least("a", "c").alias("src"), F.greatest("a", "c").alias("dst")
            )
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    from pyspark.sql import Observation

    # supports + a STATIC probe orientation (lo = lower-INITIAL-degree
    # endpoint) carried as columns: degrees only shrink during peeling,
    # so the initial orientation stays a skew bound for every later
    # probe, and the loop never recomputes degrees (the first cut of
    # this loop paid a per-round degree agg + two joins for the same
    # bound). The sub-threshold count rides the checkpoint action as an
    # Observation, so round emptiness costs no extra job.
    obs0 = Observation()
    s = (
        e.join(sup0, ["src", "dst"], "left")
        .join(
            o.select(
                F.least("lo", "hi").alias("src"),
                F.greatest("lo", "hi").alias("dst"),
                "lo",
                "hi",
            ),
            ["src", "dst"],
        )
        .select(
            "src", "dst", "lo", "hi",
            F.coalesce("support", F.lit(0)).alias("support"),
        )
        .repartition(num_partitions, "src", "dst")
        .observe(
            obs0, F.sum((F.col("support") < k - 2).cast("long")).alias("nrem")
        )
        .localCheckpoint(eager=True)
    )
    n_rem = obs0.get["nrem"] or 0
    # ---- peel rounds: delta-frontier support updates only ----
    stable = n_rem == 0
    rounds = 0
    while not stable and rounds < max_rounds:
        rounds += 1
        removed = s.where(F.col("support") < k - 2)
        surv = s.where(F.col("support") >= k - 2)
        # destroyed triangles = ≥1 removed edge + a common neighbor in
        # the PRE-round edge set; dedup by sorted corner triple; probe
        # fans out from each removed edge's carried lo endpoint. The
        # observation already told the driver |removed|, so the
        # fan-out join BROADCASTS the removed set whenever it fits —
        # the 2m-row adjacency stream is then never shuffled for the
        # fan-out (map-side broadcast-hash over the checkpointed s);
        # the closing membership check probes the CANONICAL m-row edge
        # set (not the 2m symmetric view) with the shuffle_hash build.
        sym = s.select("src", "dst").unionByName(
            s.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        rsel = removed.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
        if n_rem < 500_000:
            rsel = F.broadcast(rsel)
        fan = rsel.join(
            sym.select(F.col("src").alias("a"), F.col("dst").alias("w")), "a"
        )
        cand = fan.join(
            s.select(F.col("src").alias("_cs"), F.col("dst").alias("_cd"))
            .hint("shuffle_hash"),
            (F.least("b", "w") == F.col("_cs"))
            & (F.greatest("b", "w") == F.col("_cd")),
            "left_semi",
        )
        tri_d = cand.select(
            F.least("a", "b", "w").alias("x"),
            F.expr("array_sort(array(a, b, w))[1]").alias("y"),
            F.greatest("a", "b", "w").alias("z"),
        ).distinct()
        dec = (
            tri_d.select(
                F.explode(
                    F.array(
                        F.struct(F.col("x").alias("src"), F.col("y").alias("dst")),
                        F.struct(F.col("x").alias("src"), F.col("z").alias("dst")),
                        F.struct(F.col("y").alias("src"), F.col("z").alias("dst")),
                    )
                ).alias("ed")
            )
            .select("ed.src", "ed.dst")
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        obs = Observation()
        s = (
            surv.join(dec, ["src", "dst"], "left")
            .select(
                "src", "dst", "lo", "hi",
                (F.col("support") - F.coalesce("d", F.lit(0))).alias("support"),
            )
            .observe(
                obs,
                F.sum((F.col("support") < k - 2).cast("long")).alias("nrem"),
            )
            .localCheckpoint(eager=True)
        )
        n_rem = obs.get["nrem"] or 0
        stable = n_rem == 0
    e = s.select("src", "dst")
    if stats_out is not None:
        stats_out["rounds"] = rounds
    if not stable:
        # truss peeling can cascade one wave per round (chains of
        # triangles), so a bounded budget without a stability check
        # would return a NON-maximal remainder silently — the round-4
        # k_core/CC bug class. Raise instead; callers with genuinely
        # deep cascades can widen max_rounds.
        raise RuntimeError(
            f"k_truss did not stabilize within max_rounds={max_rounds}"
        )
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    return LinkGraph(
        vertices=verts,
        edges=e.withColumn("weight", F.lit(1.0)),
        directed=False,
    )


def _induced_on(graph: LinkGraph, node_ids: DataFrame) -> LinkGraph:
    """Induced simple undirected subgraph on ``node_ids`` (one id col)."""
    keep = node_ids.select("id")
    edges = (
        _simple_undirected_edges(graph)
        .join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")
    )
    return LinkGraph(
        vertices=graph.vertices.join(keep, "id", "left_semi"),
        edges=edges.withColumn("weight", F.lit(1.0)),
        directed=False,
    )


def k_shell(
    graph: LinkGraph, k: int | None = None, core: DataFrame | None = None
) -> LinkGraph:
    """Induced subgraph on nodes with core number exactly k
    (networkx/algorithms/core.py ``k_shell`` — ``c[v] == k`` filter).
    Default k = max core number. ``core`` lets callers reuse one
    core_number() pass across k_shell/k_crust/k_corona (the reference's
    ``core_number=`` kwarg) — the expensive step runs once."""
    c = core if core is not None else core_number(graph)
    if k is None:
        k = c.agg(F.max("core")).first()[0]
    return _induced_on(graph, c.where(F.col("core") == k))


def k_crust(
    graph: LinkGraph, k: int | None = None, core: DataFrame | None = None
) -> LinkGraph:
    """Induced subgraph on nodes with core number <= k — the graph
    minus its (k+1)-core (networkx/algorithms/core.py ``k_crust``).
    Default k = max core number - 1."""
    c = core if core is not None else core_number(graph)
    if k is None:
        k = c.agg(F.max("core")).first()[0] - 1
    return _induced_on(graph, c.where(F.col("core") <= k))


def k_corona(
    graph: LinkGraph, k: int, core: DataFrame | None = None
) -> LinkGraph:
    """Nodes in the k-shell with EXACTLY k neighbors of core >= k,
    induced (networkx/algorithms/core.py ``k_corona``). One gather of
    neighbor core numbers (equi-join + count) on top of core_number."""
    c = core if core is not None else core_number(graph)
    canon = _simple_undirected_edges(graph)
    sym = canon.unionByName(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    nbr_ge_k = (
        sym.join(
            c.where(F.col("core") >= k).select(F.col("id").alias("dst")),
            "dst",
            "left_semi",
        )
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("n_ge"))
    )
    keep = (
        c.where(F.col("core") == k)
        .join(nbr_ge_k, "id", "left")
        .where(F.coalesce("n_ge", F.lit(0)) == k)
        .select("id")
    )
    return _induced_on(graph, keep)


def onion_layers(graph: LinkGraph, max_rounds: int = 10_000) -> DataFrame:
    """(id, layer) — onion decomposition (networkx/algorithms/core.py
    ``onion_layers``, Hébert-Dufresne et al. 2016). Raises on
    self-loops (reference parity).

    Synchronous distributed peeling, exactly the reference's loop: each
    round takes a degree snapshot, lifts ``current_core`` to the
    minimum degree, removes ALL nodes with degree <= current_core as
    one layer. Per round: one groupBy degree count + one global min +
    two semi-joins; rounds = number of onion layers (small for
    heavy-tailed web graphs — layers grow geometrically)."""
    if (
        graph.edges.where(F.col("src") == F.col("dst")).limit(1).count() > 0
    ):
        raise ValueError(
            "onion_layers is not defined on graphs with self-loops "
            "(reference parity: networkx/algorithms/core.py onion_layers)"
        )
    spark = graph.spark
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = (
        _simple_undirected_edges(graph).repartition(nparts, "src").persist()
    )
    edges.count()

    layers: list[DataFrame] = []
    current_layer = 1
    # isolated vertices form layer 1 (reference: isolates first)
    deg0 = (
        edges.select(F.col("src").alias("id"))
        .unionAll(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    isolated = graph.vertices.select("id").join(deg0, "id", "left_anti")
    if isolated.limit(1).count() > 0:
        layers.append(isolated.withColumn("layer", F.lit(1).cast("long")))
        current_layer = 2

    # remaining-vertex set carried explicitly: a node whose degree drops
    # to 0 mid-peel stays in the sweep and joins the NEXT round's layer
    # together with every other node whose snapshot degree falls at or
    # below current_core — exactly the reference's degrees-dict loop.
    verts = deg0.localCheckpoint(eager=True)
    current_core = 1
    for _ in range(max_rounds):
        if verts.limit(1).count() == 0:
            break
        deg = (
            verts.join(
                edges.select(F.col("src").alias("id"))
                .unionAll(edges.select(F.col("dst").alias("id")))
                .groupBy("id")
                .agg(F.count(F.lit(1)).alias("d")),
                "id",
                "left",
            )
            .select("id", F.coalesce("d", F.lit(0)).alias("deg"))
            .localCheckpoint(eager=True)
        )
        min_deg = deg.agg(F.min("deg")).first()[0]
        if min_deg > current_core:
            current_core = min_deg
        peel = deg.where(F.col("deg") <= current_core).select("id")
        layers.append(peel.withColumn("layer", F.lit(current_layer).cast("long")))
        current_layer += 1
        verts = deg.where(F.col("deg") > current_core).select("id").localCheckpoint(
            eager=True
        )
        new_edges = (
            edges.join(peel.withColumnRenamed("id", "src"), "src", "left_anti")
            .join(peel.withColumnRenamed("id", "dst"), "dst", "left_anti")
            .localCheckpoint(eager=True)
        )
        edges.unpersist()
        edges = new_edges
    else:
        raise RuntimeError(f"onion_layers did not finish in {max_rounds} rounds")

    out = layers[0]
    for p in layers[1:]:
        out = out.unionByName(p)
    return out
