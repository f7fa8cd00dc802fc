"""Triangle counting / enumeration via oriented wedge joins.

Reference semantics (networkx/algorithms/cluster.py):

* undirected, non-multigraph; **self-loops ignored** (cluster.py:62,82,113),
* per-node counts include zeros for triangle-free nodes (cluster.py:86),
* each triangle counted once, credited to all three corners
  (cluster.py:78-95 "later neighbors" trick),
* ``all_triangles`` enumerates each triangle exactly once using an
  internal node ordering (cluster.py:300-321),
* ``transitivity = 3·T / #triads`` (cluster.py:500-539),
* ``clustering = t / (d(d-1))`` with d = #unique neighbors excluding
  self (cluster.py:385,485-496), ``average_clustering`` (cluster.py:325).

Physical strategy (the canonical distributed-triangle plan): orient
every undirected edge from its lower to its higher endpoint under the
total order ``(degree, id)`` — the same device as the reference's
later-neighbor intersection, but the **degree-first order also bounds
wedge skew**: every wedge pivot has out-degree ≤ O(sqrt(m)) in the
oriented graph, so the self-join never explodes on hubs.  Then

    wedges  = oriented ⋈ oriented  on pivot (a→b, a→c, ord(b)<ord(c))
    closed  = wedges   ⋈ oriented  on (b,c)        [the closing edge]

Both joins are plain equi-joins → Catalyst picks shuffle-hash / SMJ /
broadcast; AQE handles residual skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def _simple_undirected(graph: LinkGraph) -> DataFrame:
    """Canonical simple edge set: src<dst, deduped, self-loops dropped."""
    return (
        graph.edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _oriented(graph: LinkGraph, simple: DataFrame | None = None) -> DataFrame:
    """Orient edges low→high under (degree, id); columns (lo, hi).

    Degrees join onto the CANONICAL edge set (one row per undirected
    edge, not the 2× symmetrized table) — two equi-joins on an edge
    table half the size, orientation decided per-row. ``simple``
    (optional) is a pre-materialized canonical edge set — callers
    persist it once so derived edge plans (e.g. a co-occurrence
    self-join) are not recomputed per downstream action."""
    if simple is None:
        simple = _simple_undirected(graph)
    both = simple.unionByName(
        simple.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = both.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranked = (
        simple.join(deg.withColumnRenamed("src", "_u").withColumnRenamed("deg", "du"),
                    F.col("src") == F.col("_u")).drop("_u")
        .join(deg.withColumnRenamed("src", "_v").withColumnRenamed("deg", "dv"),
              F.col("dst") == F.col("_v")).drop("_v")
    )
    src_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("src") < F.col("dst"))
    )
    return ranked.select(
        F.when(src_first, F.col("src")).otherwise(F.col("dst")).alias("lo"),
        F.when(src_first, F.col("dst")).otherwise(F.col("src")).alias("hi"),
        F.when(src_first, F.col("du")).otherwise(F.col("dv")).alias("deg_lo"),
        F.when(src_first, F.col("dv")).otherwise(F.col("du")).alias("deg_hi"),
    )


# below this many oriented edges the closing side broadcasts (~16 bytes
# per edge → 160 MB at the threshold; executors are sized for that) so
# the wedge stream never shuffles — it pipelines map-side from the
# oriented scan straight into a broadcast-hash semi-join
BROADCAST_CLOSING_MAX_EDGES = 10_000_000

# The local single-task path engages only when BOTH hold: edge rows
# under the edge cap AND the wedge-count upper bound Σ_v C(deg v, 2)
# (one cheap aggregate; the oriented wedge table is a subset of it)
# under the wedge cap — edge count alone is NOT a safe gate because a
# dense co-occurrence graph can pack 10^8 wedges into 10^6 edges and
# the in-task merge would dwarf the distributed plan. This is a
# cost-model-driven physical choice (the same information Catalyst
# lacks for UD logic, computed explicitly). Output stays a distributed
# DataFrame (built on the executor, not the driver); the oriented-
# wedge join below remains the at-scale path.
LOCAL_TRI_MAX_EDGES = 2_000_000
LOCAL_TRI_MAX_WEDGE_BOUND = 40_000_000


def _local_all_triangles(edges_df: DataFrame) -> DataFrame:
    """Single-task triangle enumeration: one ``mapInPandas`` task does
    canonicalization (self-loop drop + parallel-edge dedup via one
    ``np.unique`` over lo·n+hi keys — cheaper in-task than a distinct
    SHUFFLE before it), degree orientation, wedge generation and the
    closing probe in vectorized numpy. Emits each triangle once as
    (a, b, c), a<b<c — identical rows to the distributed plan.
    Index/degree arrays are int32 (#distinct ids and the wedge bound
    are both < 2³¹): the kernel's cost at this size is dominated by
    first-touch page faults on its temporaries, so halving the bytes
    halves the wall clock.

    Memory safety is checked IN-TASK, not by a pre-gate shuffle: the
    exact wedge total is known from the oriented degree histogram
    BEFORE any O(wedges) allocation, and if it exceeds
    ``LOCAL_TRI_MAX_WEDGE_BOUND`` the task emits one all-NULL sentinel
    row instead — ``all_triangles`` detects it and falls back to the
    distributed plan. Moving the gate in-task saves the degree
    aggregation job (two shuffle stages) that used to precede every
    local run; real rows are never null, so the sentinel is
    unambiguous."""
    ep = edges_df.select("src", "dst").coalesce(1)

    def fn(batches):
        import numpy as np
        import pandas as pd

        dfs = [b for b in batches]
        if dfs:
            e = pd.concat(dfs, ignore_index=True)
        else:
            e = pd.DataFrame({"src": pd.Series(dtype="int64"),
                              "dst": pd.Series(dtype="int64")})
        empty = pd.DataFrame(
            {"a": np.empty(0, np.int64),
             "b": np.empty(0, np.int64),
             "c": np.empty(0, np.int64)}
        )
        if not len(e):
            yield empty
            return
        s_raw = e["src"].to_numpy(dtype="int64")
        t_raw = e["dst"].to_numpy(dtype="int64")
        # compact ids so degree/bincount arrays are O(#distinct) even
        # for sparse id spaces; uniq maps back at the end
        uniq, inv = np.unique(np.concatenate([s_raw, t_raw]),
                              return_inverse=True)
        n = len(uniq)
        inv = inv.astype(np.int32)
        s = inv[: len(s_raw)]
        t = inv[len(s_raw):]
        # canonicalize in-task: drop self loops, dedup parallel edges
        keep = s != t
        ekey = np.unique(
            np.minimum(s[keep], t[keep]).astype(np.int64) * n
            + np.maximum(s[keep], t[keep])
        )
        s = (ekey // n).astype(np.int32)
        t = (ekey % n).astype(np.int32)
        if not len(s):
            yield empty
            return
        deg = np.bincount(s, minlength=n) + np.bincount(t, minlength=n)
        first = (deg[s] < deg[t]) | ((deg[s] == deg[t]) & (s < t))
        lo = np.where(first, s, t)
        hi = np.where(first, t, s)
        # CSR blocks by lo; all-int pair generation (no per-row Python,
        # no float index math): for each block position i, it pairs
        # with the (block_size-1-i) later positions of the same block —
        # two np.repeat calls enumerate every wedge exactly once
        order = np.argsort(lo, kind="stable").astype(np.int32)
        lo_s = lo[order]
        hi_s = hi[order]
        counts = np.bincount(lo_s, minlength=n).astype(np.int64)
        if int((counts * (counts - 1) // 2).sum()) > LOCAL_TRI_MAX_WEDGE_BOUND:
            yield pd.DataFrame(
                {"a": [None], "b": [None], "c": [None]}, dtype="Int64"
            )
            return
        counts = counts.astype(np.int32)
        m = len(lo_s)
        starts = np.concatenate(([0], np.cumsum(counts, dtype=np.int32)))[:-1]
        pos = np.arange(m, dtype=np.int32) - np.repeat(starts, counts)
        rep = np.repeat(counts, counts) - 1 - pos
        i_idx = np.repeat(np.arange(m, dtype=np.int32), rep)
        if not len(i_idx):
            yield empty
            return
        cum = np.cumsum(rep, dtype=np.int32)  # wedge gate keeps this < 2³¹
        run_start = np.repeat(cum - rep, rep)
        j_idx = i_idx + 1 + (
            np.arange(len(i_idx), dtype=np.int32) - run_start
        )
        wb = hi_s[i_idx]
        wc = hi_s[j_idx]
        swap = wb > wc
        lo_w = np.where(swap, wc, wb)
        hi_w = np.where(swap, wb, wc)
        # closing probe: sorted-key membership test against the already
        # sorted canonical keys (ids compacted, no int64 overflow)
        wkey = lo_w.astype(np.int64) * n + hi_w
        at = np.searchsorted(ekey, wkey)
        at[at >= len(ekey)] = len(ekey) - 1
        hit = ekey[at] == wkey
        tri = np.stack(
            [uniq[lo_s[i_idx[hit]]], uniq[lo_w[hit]], uniq[hi_w[hit]]],
            axis=1,
        )
        if len(tri):
            tri.sort(axis=1)
        yield pd.DataFrame(
            {"a": tri[:, 0] if len(tri) else np.empty(0, np.int64),
             "b": tri[:, 1] if len(tri) else np.empty(0, np.int64),
             "c": tri[:, 2] if len(tri) else np.empty(0, np.int64)}
        )

    return ep.mapInPandas(fn, "a long, b long, c long")


def all_triangles(
    graph: LinkGraph,
    local_max_edges: int = LOCAL_TRI_MAX_EDGES,
    _simple: DataFrame | None = None,
) -> DataFrame:
    """Every triangle exactly once as (a, b, c) with a<b<c by id.

    Spark analog of ``nx.all_triangles`` (cluster.py:300-321); the
    internal orientation there is insertion order, here (degree,id) —
    the enumerated *set* of triangles is identical either way.

    The oriented edge table is persisted for the duration of the plan
    (it is read three times: both wedge sides + the closing probe);
    when it is small enough the closing side is broadcast, so the
    O(Σ deg²) wedge stream is generated and filtered inside one
    map-side pipeline without ever shuffling.
    """
    # materialize the edge set ONCE — graph.edges may itself be an
    # expensive derived plan (e.g. a co-occurrence self-join), and the
    # size gate + orientation + wedge sides all read it
    if local_max_edges:
        # size gate = one cheap count over the RAW projection (no
        # distinct shuffle first — the local kernel dedups in-task with
        # one np.unique); the wedge-memory gate runs IN-TASK where the
        # exact oriented-wedge total is known, emitting a null sentinel
        # row to request the distributed fallback (docstring above)
        raw = (
            graph.edges.select("src", "dst").persist()
            if _simple is None
            else _simple
        )
        if raw.count() <= local_max_edges:
            res = _local_all_triangles(raw).persist()
            if res.where(F.col("a").isNull()).isEmpty():
                return res
            res.unpersist()
    simple = _simple_undirected(graph).persist() if _simple is None else _simple
    if not local_max_edges:
        simple.count()
    o = _oriented(graph, simple=simple).select("lo", "hi").persist()
    n_oriented = o.count()
    w1 = o.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    w2 = o.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    wedges = w1.join(w2, "a").where(F.col("b") < F.col("c"))
    # canonicalize the closing-edge probe by id so it stays an equi-join
    # (an OR of two conjunctions would degrade to a nested-loop join)
    closing = o.select(
        F.least("lo", "hi").alias("b"), F.greatest("lo", "hi").alias("c")
    )
    if n_oriented <= BROADCAST_CLOSING_MAX_EDGES:
        closing = F.broadcast(closing)
    else:
        # beyond the broadcast cap the closing side carries a
        # shuffle-hash hint: the build side is the UNIQUE-key canonical
        # edge table (no build skew possible), so the O(Σ deg²) wedge
        # stream is probed per-partition without the sort-merge join's
        # O(W log W) sort of the wedges — at 258M wedges the sort
        # buffers dominated task time and GC (measured in
        # tools/triangle_scaling.py; BENCH.md §7f)
        closing = closing.hint("shuffle_hash")
    closed = wedges.join(closing, ["b", "c"], "left_semi")
    return closed.select(
        F.least("a", "b", "c").alias("a"),
        F.expr("array_sort(array(a, b, c))[1]").alias("b"),
        F.greatest("a", "b", "c").alias("c"),
    )


def triangles(
    graph: LinkGraph,
    _simple: DataFrame | None = None,
    local_max_edges: int = LOCAL_TRI_MAX_EDGES,
) -> DataFrame:
    """Per-node triangle counts, zeros included:
    (id BIGINT, triangles BIGINT) — parity with ``nx.triangles``
    (cluster.py:78-95). ``local_max_edges=0`` forces the distributed
    wedge+closing-join plan regardless of graph size."""
    tri = all_triangles(graph, local_max_edges=local_max_edges, _simple=_simple)
    corners = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    return graph.vertices.select("id").join(corners, "id", "left").select(
        "id", F.coalesce("t", F.lit(0)).alias("triangles")
    )


def triangle_count(graph: LinkGraph) -> int:
    """Total number of distinct triangles in the graph."""
    return all_triangles(graph).count()


def _degrees_and_triangles(graph: LinkGraph) -> DataFrame:
    """(id, deg, triangles) with deg = #unique neighbors excl. self —
    the d used by clustering/transitivity (cluster.py:99-116). The
    canonical edge set is materialized once and shared with the
    triangle plan."""
    simple = _simple_undirected(graph).persist()
    both = simple.unionByName(
        simple.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = both.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    t = triangles(graph, _simple=simple)
    return (
        t.join(deg, "id", "left")
        .select("id", F.coalesce("deg", F.lit(0)).alias("deg"), "triangles")
    )


def transitivity(graph: LinkGraph) -> float:
    """3·T / #triads (cluster.py:500-539); 0.0 when no triads."""
    row = (
        _degrees_and_triangles(graph)
        .agg(
            F.sum("triangles").alias("t3"),  # already 3T summed over corners
            F.sum(F.col("deg") * (F.col("deg") - 1)).alias("triads2"),
        )
        .first()
    )
    t3, triads2 = row["t3"] or 0, row["triads2"] or 0
    if triads2 == 0:
        return 0.0
    # t3 = Σ per-corner counts = 3T; triads2 = Σ d(d−1) = 2·#triads,
    # so 3T/#triads = 2·t3/triads2
    return 2.0 * t3 / triads2


def clustering(graph: LinkGraph) -> DataFrame:
    """Per-node clustering coefficient t/(d(d-1)) (cluster.py:485-496);
    0.0 for deg<2. Columns (id, clustering)."""
    dt = _degrees_and_triangles(graph)
    return dt.select(
        "id",
        F.when(
            F.col("deg") < 2, F.lit(0.0)
        ).otherwise(
            2.0 * F.col("triangles") / (F.col("deg") * (F.col("deg") - 1))
        ).alias("clustering"),
    )


def average_clustering(graph: LinkGraph, count_zeros: bool = True) -> float:
    """Mean clustering (cluster.py:325)."""
    c = clustering(graph)
    if not count_zeros:
        c = c.where(F.col("clustering") > 0)
    v = c.agg(F.avg("clustering")).first()[0]
    return float(v) if v is not None else 0.0


def weighted_clustering(graph: LinkGraph) -> DataFrame:
    """(id BIGINT, clustering DOUBLE) — weight-aware clustering
    coefficient (networkx/algorithms/cluster.py:154
    ``_weighted_triangles_and_degree_iter`` + ``clustering(weight=)``):

        c_u = 2 · Σ_{triangles (u,j,k)} cbrt(ŵ_uj·ŵ_jk·ŵ_uk) / (d(d−1))

    with weights normalized by the global max edge weight and d the
    simple-graph degree. Self-loops dropped; parallel/oriented
    duplicate edges coalesce to their max weight (the reference's
    Graph ingest is last-write-wins on a single weight — callers with
    multigraph input should pre-aggregate).

    Plan: the triangle enumeration is the same oriented wedge join as
    ``all_triangles`` (local fast path included); weights ride in via
    three equi-joins against the canonical weighted edge table, then
    one scatter-groupBy credits each corner. No Python in the path —
    cbrt/×/Σ are all JVM column expressions.
    """
    we = (
        graph.weighted_edges()
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            F.col("weight").cast("double").alias("w"),
        )
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.max("w").alias("w"))
        .persist()
    )
    max_w = we.agg(F.max("w")).first()[0]
    if max_w is None:
        return graph.vertices.select("id", F.lit(0.0).alias("clustering"))
    simple = we.select("src", "dst")
    tri = all_triangles(graph, _simple=simple)

    def wcol(u: str, v: str, name: str):
        return we.select(
            F.col("src").alias(u), F.col("dst").alias(v),
            (F.col("w") / F.lit(float(max_w))).alias(name),
        )

    tq = (
        tri.join(wcol("a", "b", "w_ab"), ["a", "b"])
        .join(wcol("b", "c", "w_bc"), ["b", "c"])
        .join(wcol("a", "c", "w_ac"), ["a", "c"])
        .select(
            "a", "b", "c",
            F.cbrt(F.col("w_ab") * F.col("w_bc") * F.col("w_ac")).alias("q"),
        )
    )
    credit = (
        tq.select(F.explode(F.array("a", "b", "c")).alias("id"), "q")
        .groupBy("id")
        .agg(F.sum("q").alias("tw"))
    )
    both = simple.unionByName(
        simple.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = both.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    out = (
        graph.vertices.select("id")
        .join(deg, "id", "left")
        .join(credit, "id", "left")
        .select(
            "id",
            F.when(
                (F.coalesce("deg", F.lit(0)) > 1) & F.col("tw").isNotNull(),
                2.0 * F.col("tw")
                / (F.col("deg").cast("double") * (F.col("deg").cast("double") - 1.0)),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering"),
        )
    )
    return out


def square_clustering(graph: LinkGraph) -> DataFrame:
    """(id BIGINT, sq_clustering DOUBLE) — squares-based clustering
    coefficient (networkx/algorithms/cluster.py ``square_clustering``,
    Lind–González–Herrmann / Zhang C4 form as decomposed in the
    reference, arXiv:2007.11111 sigma terms):

        squares(v)  = ½ Σ_{y≠v} cn(v,y)·(cn(v,y)−1)
        potential(v)= (d_v−1)·Σ_{u∈N(v)} d_u − d_v(d_v−1) − 2·T(v)
                      − squares(v)
        C4(v)       = squares / potential   (0 when d_v<2 or
                                             potential ≤ 0)

    where cn is the common-neighbor count. All four terms ride
    existing substrates: the degree table, one neighbor-degree join
    (avg_nbr_degree's numerator), the triangle count, and the wedge
    common-neighbor table (Σ deg² — the same cost envelope as the
    link-prediction indices; hub capping is the documented 100 TB
    mitigation).
    """
    from .links import wedge_pairs

    simple = _simple_undirected(graph).persist()
    sym = simple.unionByName(
        simple.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    sum_nbr_deg = (
        sym.join(deg.withColumnRenamed("id", "dst").withColumnRenamed("deg", "nd"),
                 "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum("nd").alias("snd"))
    )
    cn = wedge_pairs(graph)
    sq = (
        cn.select(F.col("u").alias("id"), (F.col("cn") * (F.col("cn") - 1)).alias("q"))
        .unionByName(
            cn.select(F.col("v").alias("id"), (F.col("cn") * (F.col("cn") - 1)).alias("q"))
        )
        .groupBy("id")
        .agg((F.sum("q") / 2.0).alias("squares"))
    )
    t = triangles(graph, _simple=simple)
    out = (
        graph.vertices.select("id")
        .join(deg, "id", "left")
        .join(sum_nbr_deg, "id", "left")
        .join(sq, "id", "left")
        .join(t, "id", "left")
        .select(
            "id",
            F.coalesce("deg", F.lit(0)).alias("d"),
            F.coalesce("snd", F.lit(0)).alias("snd"),
            F.coalesce("squares", F.lit(0.0)).alias("squares"),
            F.coalesce("triangles", F.lit(0)).alias("tri"),
        )
        .select(
            "id",
            F.when(
                F.col("d") < 2, F.lit(0.0)
            ).otherwise(
                F.when(
                    ((F.col("d") - 1) * F.col("snd")
                     - F.col("d") * (F.col("d") - 1)
                     - 2.0 * F.col("tri")
                     - F.col("squares")) > 0,
                    F.col("squares")
                    / ((F.col("d") - 1) * F.col("snd")
                       - F.col("d") * (F.col("d") - 1)
                       - 2.0 * F.col("tri")
                       - F.col("squares")),
                ).otherwise(F.lit(0.0))
            ).alias("sq_clustering"),
        )
    )
    return out
