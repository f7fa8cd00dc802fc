"""Louvain community detection as synchronous DataFrame supersteps.

Reference semantics: ``nx.community.louvain_communities``
(networkx/algorithms/community/louvain.py) — greedy modularity
optimization in two alternating phases: local moving (each node joins
the neighbor community with the best modularity gain) and graph
contraction (communities become super-nodes, parallel edges sum,
intra-community weight becomes a self-loop). The reference visits
nodes sequentially in random order; a distributed engine cannot (and
need not) reproduce that schedule — like LPA, ANY greedy-modularity
local optimum is a valid output, so tests assert partition validity
and modularity quality, not label equality.

Distributed local-moving round (all nodes at once):
  * k_i (weighted degree, self-loops twice) and Σ_tot(c) ride as two
    aggregate tables;
  * one edges⋈community join + groupBy gives w_{i→c} for every
    neighbor community of every node — the same gather shape as LPA;
  * gain(i, c) = w_{i→c}/m − k_i·Σ_tot(c∖i)/(2m²), argmax via
    ``max_by`` with deterministic (gain, −c) tie-breaking; the "stay"
    gain uses the exact same formula against the node's own community
    (falling back to −k_i·Σ_tot(own∖i)/(2m²) when no neighbor shares
    it, NOT zero — a singleton-looking node may still be priced out of
    a community it has no remaining edge into);
  * ONLY half the nodes (xxhash64 parity alternating per round) may
    move each round — the standard guard against synchronous swap
    oscillation (two adjacent nodes trading communities forever);
  * each round is ONE action: the next community table carries a
    ``moved`` flag, is localCheckpoint'ed (lineage truncation), and a
    single count() both materializes it and yields the move count;
    the previous round's table is unpersisted — memory is O(1) in
    rounds. Rounds end when BOTH parity classes produce zero moves.

Contraction is one groupBy on (comm(u), comm(v)) — the quotient-graph
shuffle — and the level loop repeats until the community count stops
shrinking. Output maps ORIGINAL vertex ids to final communities by
composing the per-level mappings (a chain of joins on community
tables that shrink geometrically).

Small graphs (below ``local_max_edges``, mirroring the CC/triangles
fast paths) run a deterministic sequential Louvain inside ONE
``mapInPandas`` task — still a Spark job, no driver collect — because
at test scale the per-round fixed cost of a distributed superstep
dwarfs the work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.loop import stable_checkpoint

LOCAL_LOUVAIN_MAX_EDGES = 200_000


def _canon_weighted(graph: LinkGraph) -> DataFrame:
    """(src<=dst, weight) — undirected weight-summed edges, self-loops
    kept (contracted levels need them)."""
    e = graph.weighted_edges().select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        F.col("weight").cast("double").alias("weight"),
    )
    return e.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))


def _local_louvain(graph: LinkGraph, edges: DataFrame) -> DataFrame:
    """Sequential greedy Louvain over one coalesced partition.

    Deterministic: nodes visited in ascending id order each sweep, best
    community by (gain, −community) — no RNG, so reruns are identical.
    Community label = min ORIGINAL member id (stable representative).
    """
    verts = graph.vertices.select("id")

    both = (
        edges.select("src", "dst", "weight")
        .unionByName(
            verts.select(
                F.col("id").alias("src"),
                F.lit(None).cast("long").alias("dst"),
                F.lit(None).cast("double").alias("weight"),
            )
        )
        .coalesce(1)
    )

    def fn2(batches):
        import numpy as np
        import pandas as pd

        srcs, dsts, ws, lone = [], [], [], []
        for b in batches:
            mask = b["dst"].notna()
            srcs.append(b.loc[mask, "src"].to_numpy(dtype="int64"))
            dsts.append(b.loc[mask, "dst"].to_numpy(dtype="int64"))
            ws.append(b.loc[mask, "weight"].to_numpy(dtype="float64"))
            lone.append(b.loc[~mask, "src"].to_numpy(dtype="int64"))
        src = np.concatenate(srcs) if srcs else np.empty(0, np.int64)
        dst = np.concatenate(dsts) if dsts else np.empty(0, np.int64)
        w = np.concatenate(ws) if ws else np.empty(0, np.float64)
        all_ids = np.concatenate(lone) if lone else np.empty(0, np.int64)
        ids = np.unique(np.concatenate([all_ids, src, dst]))
        n = len(ids)
        if n == 0:
            yield pd.DataFrame(
                {
                    "id": pd.Series([], dtype="int64"),
                    "community": pd.Series([], dtype="int64"),
                }
            )
            return
        pos = {int(v): i for i, v in enumerate(ids)}
        adj = [dict() for _ in range(n)]
        selfw = np.zeros(n)
        for s, d, ww in zip(src, dst, w):
            si, di = pos[int(s)], pos[int(d)]
            if si == di:
                selfw[si] += float(ww)
                continue
            adj[si][di] = adj[si].get(di, 0.0) + float(ww)
            adj[di][si] = adj[di].get(si, 0.0) + float(ww)
        m = float(w.sum())
        result = np.array(ids, dtype="int64", copy=True)  # singleton default
        if m > 0:
            node2orig = {i: {i} for i in range(n)}
            cur_adj = adj
            cur_self = selfw.copy()
            cur_k = np.array([sum(a.values()) for a in adj]) + 2.0 * selfw
            while True:
                nn = len(cur_adj)
                cn = list(range(nn))
                tot = cur_k.copy()
                improved = False
                for _sweep in range(100):
                    moved = 0
                    for i in range(nn):
                        ci = cn[i]
                        tot[ci] -= cur_k[i]
                        wic = {}
                        for j, ww in cur_adj[i].items():
                            wic[cn[j]] = wic.get(cn[j], 0.0) + ww
                        best_c = ci
                        best_g = wic.get(ci, 0.0) / m - cur_k[i] * tot[ci] / (
                            2 * m * m
                        )
                        for c in sorted(wic):
                            g = wic[c] / m - cur_k[i] * tot[c] / (2 * m * m)
                            if g > best_g + 1e-12 or (
                                g > best_g - 1e-12 and c < best_c
                            ):
                                best_c, best_g = c, g
                        cn[i] = best_c
                        tot[best_c] += cur_k[i]
                        if best_c != ci:
                            moved += 1
                            improved = True
                    if moved == 0:
                        break
                labels = {c: idx for idx, c in enumerate(sorted(set(cn)))}
                if len(labels) == nn or not improved:
                    # final assignment
                    groups = {}
                    for i in range(nn):
                        groups.setdefault(cn[i], set()).update(node2orig[i])
                    for members in groups.values():
                        rep = int(ids[min(members)])
                        for mm in members:
                            result[mm] = rep
                    break
                new_n = len(labels)
                new_adj = [dict() for _ in range(new_n)]
                new_self = np.zeros(new_n)
                new_k = np.zeros(new_n)
                new_orig = {i: set() for i in range(new_n)}
                for i in range(nn):
                    li = labels[cn[i]]
                    new_orig[li] |= node2orig[i]
                    new_self[li] += cur_self[i]
                    new_k[li] += cur_k[i]
                    for j, ww in cur_adj[i].items():
                        lj = labels[cn[j]]
                        if li == lj:
                            if i < j:
                                new_self[li] += ww
                        else:
                            new_adj[li][lj] = new_adj[li].get(lj, 0.0) + ww
                cur_adj, cur_self, cur_k = new_adj, new_self, new_k
                node2orig = new_orig
        yield pd.DataFrame({"id": ids, "community": result})

    return both.mapInPandas(fn2, "id long, community long")


def _local_moving(
    spark,
    edges: DataFrame,
    nodes: DataFrame,
    m: float,
    max_rounds: int,
) -> DataFrame:
    """One Louvain level's local-moving phase. ``edges`` canonical
    (src<=dst, weight); ``nodes`` (id). Returns (id, comm)."""
    # weighted degree: self-loop counts TWICE (standard k_i)
    sym = edges.where(F.col("src") != F.col("dst"))
    sym = sym.unionByName(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    selfw = edges.where(F.col("src") == F.col("dst")).select(
        F.col("src").alias("id"), (2.0 * F.col("weight")).alias("kw")
    )
    deg = (
        sym.select(F.col("src").alias("id"), F.col("weight").alias("kw"))
        .unionByName(selfw)
        .groupBy("id")
        .agg(F.sum("kw").alias("k"))
    )
    k = nodes.join(deg, "id", "left").select(
        "id", F.coalesce("k", F.lit(0.0)).alias("k")
    )

    # stable_checkpoint: each round references comm ~4 times (sig_tot,
    # gather, current, update), so carried-over origin stats would
    # grow ^4 per round (see plans/loop.py stable_checkpoint).
    comm = stable_checkpoint(k.select("id", F.col("id").alias("comm"), "k"))
    sym = sym.localCheckpoint(eager=True)

    quiet = 0  # consecutive zero-move rounds: 2 = both parity classes
    try:
        for rnd in range(max_rounds):
            sig_tot = comm.groupBy(F.col("comm").alias("tc")).agg(
                F.sum("k").alias("tot")
            )
            # w_{i -> c}: weight from i to each neighbor community
            # (self-loops excluded from sym by construction). A zero-
            # weight row for i's OWN community rides along in the same
            # aggregate, so the stay gain is always priced exactly —
            # including −k·Σ_tot(own∖i)/(2m²) when no neighbor shares
            # the community — without a separate fallback join.
            nbr_c = (
                sym.join(
                    comm.select(
                        F.col("id").alias("dst"), F.col("comm").alias("c")
                    ),
                    "dst",
                )
                .select(F.col("src").alias("id"), "c", F.col("weight").alias("w_ic"))
                .unionByName(
                    comm.select(
                        "id", F.col("comm").alias("c"), F.lit(0.0).alias("w_ic")
                    )
                )
                .groupBy("id", "c")
                .agg(F.sum("w_ic").alias("w_ic"))
            )
            cand = (
                nbr_c.join(comm.select("id", "comm", "k"), "id")
                .join(sig_tot, F.col("c") == F.col("tc"), "left")
                .drop("tc")
                .select(
                    "id", "comm", "k", "c", "w_ic",
                    F.coalesce("tot", F.lit(0.0)).alias("tot_c"),
                )
            )
            # gain of joining c (Σ_tot excludes i when c is its own comm)
            gain = cand.select(
                "id", "comm", "k", "c",
                (
                    F.col("w_ic") / m
                    - F.col("k")
                    * (
                        F.col("tot_c")
                        - F.when(
                            F.col("c") == F.col("comm"), F.col("k")
                        ).otherwise(0.0)
                    )
                    / (2.0 * m * m)
                ).alias("g"),
            )
            best = gain.groupBy("id").agg(
                F.max_by("c", F.struct(F.col("g"), -F.col("c"))).alias("best_c"),
                F.max("g").alias("best_g"),
                F.max(F.when(F.col("c") == F.col("comm"), F.col("g"))).alias(
                    "stay_g"
                ),
            )
            # parity gate: alternate halves to kill synchronous swaps
            movers = best.where(
                (F.col("best_g") > F.col("stay_g") + 1e-12)
                & F.col("best_c").isNotNull()
                & (F.pmod(F.xxhash64(F.col("id")), F.lit(2)) == rnd % 2)
            ).select("id", F.col("best_c").alias("new_comm"))
            # ONE action per round: materialize the checkpointed next
            # table and read the move count off its `moved` flag
            new_comm = stable_checkpoint(
                comm.join(movers, "id", "left")
                .select(
                    "id",
                    F.coalesce("new_comm", "comm").alias("comm"),
                    "k",
                    F.col("new_comm").isNotNull().alias("moved"),
                ),
                eager=False,
            )
            n_moves = new_comm.where("moved").count()
            prev = comm
            comm = new_comm
            prev.unpersist()
            quiet = quiet + 1 if n_moves == 0 else 0
            if quiet >= 2:  # neither parity class can improve
                break
        return comm.select("id", "comm").localCheckpoint(eager=True)
    finally:
        sym.unpersist()
        comm.unpersist()


def louvain_communities(
    graph: LinkGraph,
    max_levels: int = 10,
    max_rounds_per_level: int = 20,
    local_max_edges: int = LOCAL_LOUVAIN_MAX_EDGES,
) -> DataFrame:
    """(id BIGINT, community BIGINT) — multi-level Louvain partition of
    the undirected weighted view. Raises ValueError on directed input
    (reference parity: louvain is undirected-modularity based; the
    reference converts — callers can pass an undirected view
    explicitly)."""
    if graph.directed:
        raise ValueError(
            "louvain_communities expects an undirected graph; take the "
            "undirected view first (reference converts via to_undirected)"
        )
    spark = graph.spark
    edges = _canon_weighted(graph).persist()
    n_edges = edges.count()
    if local_max_edges and n_edges <= local_max_edges:
        try:
            return _local_louvain(graph, edges).localCheckpoint(eager=True)
        finally:
            edges.unpersist()
    edges = edges.localCheckpoint(eager=True)
    m = edges.agg(F.sum("weight")).first()[0]
    if not m:
        return graph.vertices.select("id", F.col("id").alias("community"))
    nodes = (
        graph.vertices.select("id")
        .unionByName(edges.select(F.col("src").alias("id")))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    # mapping: original id -> current super-node id
    mapping = nodes.select("id", F.col("id").alias("node"))
    n_nodes = nodes.count()
    for _ in range(max_levels):
        comm = _local_moving(spark, edges, nodes, float(m), max_rounds_per_level)
        n_comms = comm.select("comm").distinct().count()
        if n_comms == n_nodes:
            break
        # compose the mapping with this level's assignment
        mapping = (
            mapping.join(comm.select(F.col("id").alias("node"), "comm"), "node")
            .select("id", F.col("comm").alias("node"))
            .localCheckpoint(eager=True)
        )
        # contract: communities become nodes, weights sum, intra-
        # community mass becomes self-loops (canonical src<=dst keys)
        cmap_src = comm.select(F.col("id").alias("src"), F.col("comm").alias("cs"))
        cmap_dst = comm.select(F.col("id").alias("dst"), F.col("comm").alias("cd"))
        prev_edges = edges
        edges = (
            edges.join(cmap_src, "src")
            .join(cmap_dst, "dst")
            .select(
                F.least("cs", "cd").alias("src"),
                F.greatest("cs", "cd").alias("dst"),
                "weight",
            )
            .groupBy("src", "dst")
            .agg(F.sum("weight").alias("weight"))
            .localCheckpoint(eager=True)
        )
        prev_edges.unpersist()
        prev_nodes = nodes
        nodes = comm.select(F.col("comm").alias("id")).distinct().localCheckpoint(
            eager=True
        )
        prev_nodes.unpersist()
        comm.unpersist()
        n_nodes = n_comms
    return mapping.select("id", F.col("node").alias("community"))


def greedy_modularity_communities(
    graph: LinkGraph,
    resolution: float = 1.0,
    cutoff: int = 1,
    best_n: int | None = None,
    max_edges: int = 2_000_000,
) -> DataFrame:
    """(id BIGINT, community BIGINT) — Clauset–Newman–Moore greedy
    modularity maximization (reference
    networkx/algorithms/community/modularity_max.py
    ``greedy_modularity_communities``), community label = min member
    id (stable canonical representative).

    Semantics mirrored from the reference generator loop (r5 facade —
    the most-called nx community API after LPA/Louvain had no surface
    here): every node starts alone; repeatedly merge the community
    pair with the largest modularity gain ΔQ (ties by smallest (u, v)
    pair — the reference's MappedQueue ordering), maintaining the
    sparse ΔQ matrix incrementally; stop when ΔQ < 0 (modularity
    maximum) unless ``best_n`` forces further merges, or when
    ``cutoff`` communities remain; if merging exhausts connected pairs
    (StopIteration branch), pad down to ``best_n`` by unioning the
    largest communities. Parallel edge weights sum; self-loops count
    in degree/m but never merge. Generalized (resolution-scaled)
    modularity throughout.

    CNM's heap-driven merge order is INHERENTLY sequential — each ΔQ
    update depends on the previous merge — so this runs as a
    size-gated single-task kernel (the engine's local-lane pattern,
    _local.py) and RAISES above ``max_edges``: at web scale the
    modularity-maximizing surface is ``louvain_communities`` (same
    objective, parallel local-moving schedule; communities differ —
    both are valid greedy local optima, nx documents no equivalence).
    """
    if graph.directed:
        raise ValueError(
            "greedy_modularity_communities expects an undirected graph "
            "(reference parity: modularity_max.py operates on G as given; "
            "this engine's community surface is undirected)"
        )
    if cutoff < 1:
        raise ValueError(f"cutoff must be >= 1. Got {cutoff}.")
    if best_n is not None and best_n < cutoff:
        raise ValueError(f"Must have best_n >= cutoff. Got {best_n} < {cutoff}")
    edges = _canon_weighted(graph).persist()
    n_edges = edges.count()
    if n_edges > max_edges:
        edges.unpersist()
        raise ValueError(
            f"greedy_modularity_communities is a sequential CNM kernel "
            f"gated at {max_edges} edges (got {n_edges}); use "
            f"louvain_communities for the distributed modularity path"
        )
    verts = graph.vertices.select("id")

    both = (
        edges.select("src", "dst", "weight")
        .unionByName(
            verts.select(
                F.col("id").alias("src"),
                F.lit(None).cast("long").alias("dst"),
                F.lit(None).cast("double").alias("weight"),
            )
        )
        .coalesce(1)
    )

    res = float(resolution)
    cut = int(cutoff)
    bn = None if best_n is None else int(best_n)

    def fn(batches):
        import heapq
        from collections import defaultdict

        import numpy as np
        import pandas as pd

        srcs, dsts, ws, nodes_parts = [], [], [], []
        for b in batches:
            mask = b["dst"].notna()
            srcs.append(b.loc[mask, "src"].to_numpy(dtype="int64"))
            dsts.append(b.loc[mask, "dst"].to_numpy(dtype="int64"))
            ws.append(b.loc[mask, "weight"].to_numpy(dtype="float64"))
            nodes_parts.append(b.loc[~mask, "src"].to_numpy(dtype="int64"))
        nodes = sorted(set(np.concatenate(nodes_parts).tolist())) if nodes_parts else []
        es = np.concatenate(srcs) if srcs else np.empty(0, np.int64)
        ed = np.concatenate(dsts) if dsts else np.empty(0, np.int64)
        ew = np.concatenate(ws) if ws else np.empty(0, np.float64)

        if len(nodes) == 0:
            yield pd.DataFrame({"id": [], "community": []}).astype("int64")
            return
        # G.size(weight): each canonical edge (incl. self-loop) once
        m = float(ew.sum())
        communities = {n: {n} for n in nodes}
        if m == 0.0 or len(es) == 0:
            yield pd.DataFrame(
                {"id": nodes, "community": nodes}
            ).astype("int64")
            return
        q0 = 1.0 / m
        # a[u] = deg(u) * q0 * 0.5; degree counts self-loops TWICE
        deg = defaultdict(float)
        for u, v, wt in zip(es.tolist(), ed.tolist(), ew.tolist()):
            deg[u] += wt
            deg[v] += wt
        a = {n: deg.get(n, 0.0) * q0 * 0.5 for n in nodes}
        # sparse ΔQ matrix, both directions, self-loops excluded
        dqd: dict = defaultdict(dict)
        for u, v, wt in zip(es.tolist(), ed.tolist(), ew.tolist()):
            if u == v:
                continue
            dqd[u][v] = dqd[u].get(v, 0.0) + wt
            dqd[v][u] = dqd[v].get(u, 0.0) + wt
        for u in list(dqd):
            for v in list(dqd[u]):
                dqd[u][v] = q0 * dqd[u][v] - res * 2.0 * a[u] * a[v]
        # one global lazy heap over (-dq, u, v) + per-pair versions:
        # the lexicographic global min equals the reference's
        # heap-of-row-maxes pop (the argmin pair is its own row's max,
        # and _HeapElement orders by (priority, element) exactly so)
        ver: dict = defaultdict(int)
        heap: list = []
        for u in dqd:
            for v, dq in dqd[u].items():
                heapq.heappush(heap, (-dq, u, v, 0))

        def pop_best():
            while heap:
                negdq, u, v, k = heap[0]
                if u in dqd and v in dqd.get(u, {}) and k == ver[(u, v)]:
                    heapq.heappop(heap)
                    return -negdq, u, v
                heapq.heappop(heap)
            return None

        def set_dq(u, v, val):
            dqd[u][v] = val
            ver[(u, v)] += 1
            heapq.heappush(heap, (-val, u, v, ver[(u, v)]))

        bn_eff = bn if bn is not None else len(nodes)
        exhausted = False
        while len(communities) > cut:
            best = pop_best()
            if best is None:
                exhausted = True
                break
            dq, u, v = best
            if dq < 0 and len(communities) <= bn_eff:
                break
            # merge u into v (reference direction: communities[v] |= u)
            communities[v] = communities[u] | communities[v]
            del communities[u]
            u_nbrs = set(dqd[u])
            v_nbrs = set(dqd[v])
            for w in (u_nbrs | v_nbrs) - {u, v}:
                if w in u_nbrs and w in v_nbrs:
                    dq_vw = dqd[v][w] + dqd[u][w]
                elif w in v_nbrs:
                    dq_vw = dqd[v][w] - res * 2.0 * a[u] * a[w]
                else:
                    dq_vw = dqd[u][w] - res * 2.0 * a[v] * a[w]
                set_dq(v, w, dq_vw)
                set_dq(w, v, dq_vw)
            for w in list(dqd[u]):
                dqd[w].pop(u, None)
            del dqd[u]
            dqd[v].pop(u, None)
            a[v] += a[u]
            a[u] = 0.0
        comms = sorted(communities.values(), key=len, reverse=True)
        if exhausted and bn is not None:
            while len(comms) > bn:
                c1, c2, *rest = comms
                comms = [c1 | c2] + rest
        out_id, out_c = [], []
        for c in comms:
            rep = min(c)
            for n in sorted(c):
                out_id.append(n)
                out_c.append(rep)
        yield pd.DataFrame({"id": out_id, "community": out_c}).astype("int64")

    out = both.mapInPandas(fn, "id long, community long").localCheckpoint(
        eager=True
    )
    edges.unpersist()
    return out
