"""Cycle witnesses: ``find_cycle``, bounded ``simple_cycles``, and
``girth`` — link-spam loop hunting over web graphs.

Reference semantics (networkx/algorithms/cycles.py):

* ``find_cycle`` (cycles.py:93) returns ONE cycle as an edge list or
  raises ``NetworkXNoCycle``. The reference's witness depends on DFS
  visit order; this engine's is deterministic instead: the cycle
  returned is the SHORTEST cycle through the smallest-id vertex that
  lies on any cycle (ties: smallest closing predecessor). Always *a*
  valid cycle — pytest asserts witness validity plus existence parity
  against live networkx.
* ``simple_cycles`` (cycles.py:180, with ``length_bound``) yields each
  simple cycle at most once. This engine requires a bound (unbounded
  enumeration is exponential and never a 100 TB workload) and emits
  the canonical rotation: the cycle written starting at its minimum
  vertex (directed: following edge orientation; undirected: the
  direction whose second vertex is smaller than its last — each
  undirected cycle has exactly two traversals, one is chosen).
* ``girth`` (cycles.py girth) — length of the shortest undirected
  cycle, ``inf`` when acyclic.

Physical strategy (Spark-first): the reference walks DFS stacks —
inherently sequential. Here:

* ``find_cycle`` composes existing distributed substrates: SCC labels
  (strongly_connected.py) locate cycle vertices, an unweighted
  Bellman-Ford tree (shortest_paths.py:131) gives distances +
  deterministic predecessors inside the chosen SCC, and the witness
  path is materialized by pointer doubling over the predecessor
  forest (same O(log L) device as dag.py:330-368) — never a
  driver-side walk.
* bounded ``simple_cycles`` is frontier-extension: a path table
  (start, cur, path) joined against the edge table k times, closing
  edges checked with an equi-join on (cur=src, dst=start) each round.
  Candidate volume is O(Σ deg^(k-1)) with the min-start constraint
  pruning each cycle to exactly one representative — the same growth
  shape as triangle wedge enumeration, and the reason ``length_bound``
  is mandatory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.loop import stable_checkpoint
from ._local import member_maps, run_local_kernel

# Size gate for the single-task witness kernel: find_cycle composes
# SCC + BFS tree + pointer doubling — each O(diameter) superstep
# rounds, a brutal scheduling floor on small cyclic graphs (a 25-node
# ring costs ~24 BFS rounds). Below the gate one Arrow task runs the
# same deterministic rules (python Tarjan is O(V+E); the gate keeps it
# comfortably sub-second).
LOCAL_CYCLE_MAX_EDGES = 200_000


class NoCycle(ValueError):
    """Parity with ``nx.exception.NetworkXNoCycle`` (cycles.py:93
    raises when the exhausted DFS finds no back edge)."""


def _pred_chain(spark, pred: DataFrame, end_id: int) -> DataFrame:
    """(back BIGINT, id BIGINT) — the predecessor chain starting at
    ``end_id`` (back=0) and following ``pred`` until a NULL/absent
    predecessor. Pointer doubling: O(log L) self-joins of the jump
    table (same device as dag.py:330-368), no driver walk."""
    # stable_checkpoint, not bare localCheckpoint: jump self-joins
    # each round, so carried-over origin stats would square per round
    # (see plans/loop.py stable_checkpoint).
    chain = stable_checkpoint(
        spark.createDataFrame([(int(end_id), 0)], "id LONG, back LONG")
    )
    jump = stable_checkpoint(
        pred.where(F.col("pred").isNotNull())
        .select("id", F.col("pred").alias("anc"), F.lit(1).alias("hops"))
    )
    while True:
        ext = stable_checkpoint(
            chain.join(jump, "id")
            .select(
                F.col("anc").alias("id"),
                (F.col("back") + F.col("hops")).alias("back"),
            )
            .join(chain, ["id", "back"], "left_anti")
        )
        if ext.isEmpty():
            break
        chain = stable_checkpoint(chain.unionByName(ext))
        jump2 = stable_checkpoint(
            jump.join(
                jump.select(
                    F.col("id").alias("anc"),
                    F.col("anc").alias("anc2"),
                    F.col("hops").alias("hops2"),
                ),
                "anc",
            )
            .select(
                "id",
                F.col("anc2").alias("anc"),
                (F.col("hops") + F.col("hops2")).alias("hops"),
            )
        )
        jump = jump2 if not jump2.isEmpty() else jump
    return chain


def _local_find_cycle(statics, edges) -> DataFrame:
    """Single-task witness with the exact distributed rules: min
    self-loop first; else anchor = min id in any SCC of size >= 2
    (iterative Tarjan), BFS inside the anchor's SCC, closing
    in-neighbor at min (dist, src), path via min-src tight
    predecessors. err=1 signals acyclic (wrapper raises NoCycle)."""

    def kernel(ids, stat, es, ed, ew):
        import numpy as np

        nv = len(ids)
        si, di, ms, md = member_maps(ids, es, ed)
        keep = ms & md
        gs = si[keep].astype(np.int64)
        gd = di[keep].astype(np.int64)
        empty = {
            "pos": np.zeros(0, np.int64),
            "src": np.zeros(0, np.int64),
            "dst": np.zeros(0, np.int64),
            "err": np.zeros(0, np.int32),
        }

        def rows(pairs):
            p = np.arange(len(pairs), dtype=np.int64)
            return {
                "pos": p,
                "src": np.array([a for a, _ in pairs], dtype=np.int64),
                "dst": np.array([b for _, b in pairs], dtype=np.int64),
                "err": np.zeros(len(pairs), np.int32),
            }

        # 1. min self-loop
        selfm = gs == gd
        if selfm.any():
            v = int(ids[gs[selfm].min()])
            return rows([(v, v)])
        if nv == 0 or len(gs) == 0:
            empty["pos"] = np.zeros(1, np.int64)
            empty["src"] = np.zeros(1, np.int64)
            empty["dst"] = np.zeros(1, np.int64)
            empty["err"] = np.ones(1, np.int32)
            return empty

        # adjacency (deduped pairs, positions)
        pairkey = gs * np.int64(nv) + gd
        uniq = np.unique(pairkey)
        ugs = (uniq // nv).astype(np.int64)
        ugd = (uniq % nv).astype(np.int64)
        order = np.argsort(ugs, kind="stable")
        ugs, ugd = ugs[order], ugd[order]
        indptr = np.searchsorted(ugs, np.arange(nv + 1))

        # 2. iterative Tarjan SCC
        index = np.full(nv, -1, np.int64)
        low = np.zeros(nv, np.int64)
        onstk = np.zeros(nv, bool)
        comp = np.full(nv, -1, np.int64)
        stack: list[int] = []
        counter = 0
        ncomp = 0
        for root in range(nv):
            if index[root] != -1:
                continue
            work = [(root, 0)]
            while work:
                v, pi = work[-1]
                if pi == 0:
                    index[v] = low[v] = counter
                    counter += 1
                    stack.append(v)
                    onstk[v] = True
                recurse = False
                for j in range(indptr[v] + pi, indptr[v + 1]):
                    w = int(ugd[j])
                    if index[w] == -1:
                        work[-1] = (v, j - indptr[v] + 1)
                        work.append((w, 0))
                        recurse = True
                        break
                    if onstk[w] and index[w] < low[v]:
                        low[v] = index[w]
                if recurse:
                    continue
                work.pop()
                if low[v] == index[v]:
                    while True:
                        w = stack.pop()
                        onstk[w] = False
                        comp[w] = ncomp
                        if w == v:
                            break
                    ncomp += 1
                if work:
                    p = work[-1][0]
                    if low[v] < low[p]:
                        low[p] = low[v]

        sizes = np.bincount(comp, minlength=ncomp)
        big = sizes[comp] >= 2
        if not big.any():
            empty["pos"] = np.zeros(1, np.int64)
            empty["src"] = np.zeros(1, np.int64)
            empty["dst"] = np.zeros(1, np.int64)
            empty["err"] = np.ones(1, np.int32)
            return empty
        # 3. anchor = min id among big-SCC members (ids sorted -> min pos)
        anchor = int(np.nonzero(big)[0].min())
        cid = comp[anchor]
        inscc = comp == cid
        sub = inscc[ugs] & inscc[ugd]
        sgs, sgd = ugs[sub], ugd[sub]

        # BFS distances from the anchor inside the SCC
        dist = np.full(nv, -1, np.int64)
        dist[anchor] = 0
        frontier = np.zeros(nv, bool)
        frontier[anchor] = True
        d = 0
        while frontier.any():
            d += 1
            fe = frontier[sgs] & (dist[sgd] == -1)
            nxt = np.zeros(nv, bool)
            nxt[sgd[fe]] = True
            dist[nxt] = d
            frontier = nxt

        # 4. closing in-neighbor of the anchor at min (dist, src)
        into = sgd == anchor
        cand = sgs[into]
        cand = cand[dist[cand] >= 0]
        ckey = dist[cand] * np.int64(nv) + cand
        u = int(cand[np.argmin(ckey)])

        # 5. path anchor -> u via min-src tight predecessors
        path = [u]
        v = u
        while v != anchor:
            tight = sgd == v
            preds = sgs[tight]
            preds = preds[(dist[preds] >= 0) & (dist[preds] + 1 == dist[v])]
            v = int(preds.min())
            path.append(v)
        path.reverse()
        pairs = [(int(ids[a]), int(ids[b])) for a, b in zip(path, path[1:])]
        pairs.append((int(ids[u]), int(ids[anchor])))
        return rows(pairs)

    return run_local_kernel(
        edges, statics, [], kernel, "pos long, src long, dst long, err int"
    )


def find_cycle(
    graph: LinkGraph, local_max_edges: int = LOCAL_CYCLE_MAX_EDGES
) -> DataFrame:
    """(pos BIGINT, src BIGINT, dst BIGINT) — the edges of one
    directed cycle, pos 0 at the cycle's deterministic anchor (see
    module docstring). Raises :class:`NoCycle` when the graph is a
    DAG. Directed graphs only (reference supports undirected too; a
    web link graph is directed — use :func:`girth` /
    :func:`simple_cycles` for undirected cycle questions)."""
    if not graph.directed:
        raise ValueError(
            "find_cycle is implemented for directed graphs; for "
            "undirected cycles use girth/simple_cycles"
        )
    spark = graph.spark

    # single-task witness kernel below the size gate
    if local_max_edges:
        ep = graph.edges.select(
            "src", "dst", F.lit(1.0).alias("weight")
        ).persist()
        if ep.count() <= local_max_edges:
            try:
                res = _local_find_cycle(
                    graph.vertices.select("id"), ep
                ).persist()
                meta = res.select("err").first()
                if meta is None or meta["err"]:
                    res.unpersist()
                    raise NoCycle(
                        "graph is acyclic (no self-loop, no SCC of size >= 2)"
                    )
                return res.select("pos", "src", "dst").orderBy("pos")
            finally:
                ep.unpersist()
        ep.unpersist()

    edges = (
        graph.edges.select("src", "dst")
        .distinct()
        .join(graph.vertices.select(F.col("id").alias("src")), "src", "left_semi")
        .join(graph.vertices.select(F.col("id").alias("dst")), "dst", "left_semi")
        .persist()
    )
    try:
        # 1. a self-loop is the shortest possible witness
        loop = edges.where(F.col("src") == F.col("dst")).agg(F.min("src")).first()[0]
        if loop is not None:
            return spark.createDataFrame(
                [(0, int(loop), int(loop))], "pos LONG, src LONG, dst LONG"
            )

        # 2. anchor = min id inside any nontrivial SCC
        from .strongly_connected import strongly_connected_components

        labels = strongly_connected_components(graph).persist()
        anchor_row = (
            labels.groupBy("component")
            .agg(F.count(F.lit(1)).alias("n"), F.min("id").alias("lo"))
            .where(F.col("n") >= 2)
            .agg(F.min("lo"))
            .first()
        )
        if anchor_row[0] is None:
            labels.unpersist()
            raise NoCycle("graph is acyclic (no self-loop, no SCC of size >= 2)")
        anchor = int(anchor_row[0])
        comp = labels.where(F.col("id") == anchor).select("component")
        members = labels.join(
            F.broadcast(comp), "component", "left_semi"
        ).select("id")
        sub_edges = (
            edges.join(members.select(F.col("id").alias("src")), "src", "left_semi")
            .join(members.select(F.col("id").alias("dst")), "dst", "left_semi")
            .withColumn("weight", F.lit(1.0))
        )
        sub = LinkGraph(vertices=members, edges=sub_edges, directed=True)

        # 3. BFS tree from the anchor inside its SCC
        from .shortest_paths import shortest_path_tree

        tree = shortest_path_tree(sub, anchor, weight=False).persist()

        # 4. closing edge: in-neighbor of the anchor at minimum depth
        closing = (
            sub_edges.where(F.col("dst") == anchor)
            .join(tree.select(F.col("id").alias("src"), "dist"), "src")
            .orderBy(F.col("dist").asc(), F.col("src").asc())
            .first()
        )
        u = int(closing["src"])

        # 5. materialize the anchor -> u path, then append (u, anchor)
        pred = tree.select("id", "pred")
        chain = _pred_chain(spark, pred, u)
        path_len = chain.agg(F.max("back")).first()[0]
        nodes = chain.select(
            (F.lit(path_len) - F.col("back")).cast("long").alias("pos"), "id"
        )
        nxt = nodes.select(
            (F.col("pos") - 1).alias("pos"), F.col("id").alias("nid")
        )
        path_edges = nodes.join(nxt, "pos").select(
            "pos", F.col("id").alias("src"), F.col("nid").alias("dst")
        )
        close_row = spark.createDataFrame(
            [(int(path_len), u, anchor)], "pos LONG, src LONG, dst LONG"
        )
        out = path_edges.unionByName(close_row).orderBy("pos")
        labels.unpersist()
        tree.unpersist()
        return out
    finally:
        edges.unpersist()


def _bounded_cycle_tables(graph: LinkGraph, length_bound: int):
    """Yields (k, cycles_at_k) for k = 1..length_bound; each
    cycles_at_k is (cycle STRING, k BIGINT) in canonical rotation.
    Shared engine of :func:`simple_cycles` and :func:`girth` — a lazy
    GENERATOR so girth's early exit never runs the deeper extension
    joins it doesn't need (each extension is eagerly checkpointed
    only when the caller advances to it)."""
    spark = graph.spark
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    directed = graph.directed
    base = graph.edges if directed else graph.symmetrized_edges()
    e = (
        base.select("src", "dst")
        .distinct()
        .join(graph.vertices.select(F.col("id").alias("src")), "src", "left_semi")
        .join(graph.vertices.select(F.col("id").alias("dst")), "dst", "left_semi")
        .repartition(nparts, "src")
        .persist()
    )

    # k=1: self loops (reference yields [v] for them, Graph and DiGraph)
    yield 1, (
        e.where(F.col("src") == F.col("dst")).select(
            F.col("src").cast("string").alias("cycle"),
            F.lit(1).cast("long").alias("k"),
        )
    )
    if length_bound < 2:
        return

    simple = e.where(F.col("src") != F.col("dst"))
    # path table: start (= the cycle's min vertex), cur, path; the
    # min-start constraint (every later vertex > start) gives each
    # cycle exactly one starting rotation, and array_contains bans
    # revisits (vertex-simple paths)
    p = simple.where(F.col("dst") > F.col("src")).select(
        F.col("src").alias("start"),
        F.col("dst").alias("cur"),
        F.array("src", "dst").alias("path"),
    )
    for k in range(2, length_bound + 1):
        closing = simple.select(
            F.col("src").alias("cur"), F.col("dst").alias("start")
        )
        closed = p.join(closing, ["cur", "start"])
        if not directed:
            # a 2-walk u-v-u re-uses its arrival edge (not a cycle),
            # and each undirected cycle has two traversals — keep the
            # one whose second vertex is smaller than its last
            closed = closed.where(
                (F.size("path") >= 3)
                & (F.element_at("path", 2) < F.element_at("path", -1))
            )
        yield k, closed.select(
            F.array_join("path", ",").alias("cycle"),
            F.size("path").cast("long").alias("k"),
        )
        if k == length_bound:
            break
        p = (
            p.join(simple.select(F.col("src").alias("cur"), "dst"), "cur")
            .where(
                (F.col("dst") > F.col("start"))
                & ~F.array_contains("path", F.col("dst"))
            )
            .select(
                "start",
                F.col("dst").alias("cur"),
                F.concat("path", F.array("dst")).alias("path"),
            )
            .localCheckpoint(eager=True)
        )


def simple_cycles(graph: LinkGraph, length_bound: int = 3) -> DataFrame:
    """(cycle STRING, k BIGINT) — every simple cycle of length <=
    ``length_bound``, exactly once, in canonical rotation ("v0,v1,..."
    with v0 the cycle's minimum vertex). Reference
    ``simple_cycles(G, length_bound)`` (cycles.py:180); undirected
    graphs yield length-1 (self-loop) and length>=3 cycles, directed
    graphs also length-2 (reciprocal pairs)."""
    if length_bound < 1:
        raise ValueError("length_bound must be >= 1")
    out = None
    for _, t in _bounded_cycle_tables(graph, length_bound):
        out = t if out is None else out.unionByName(t)
    return out


def girth(graph: LinkGraph, length_bound: int | None = None) -> float:
    """Length of the shortest cycle of the UNDIRECTED simple graph
    (reference ``girth``, cycles.py; self loops excluded there — girth
    counts cycles of length >= 3). Returns ``inf`` when no cycle of
    length <= ``length_bound`` exists (unbounded girth needs
    all-pairs BFS; the bound keeps the frontier-extension table the
    same shape as bounded simple_cycles). Early-exits at the first k
    with a nonempty cycle table."""
    if length_bound is None:
        length_bound = 8
    und = graph if not graph.directed else LinkGraph(
        vertices=graph.vertices, edges=graph.edges, directed=False
    )
    for k, t in _bounded_cycle_tables(und, length_bound):
        if k < 3:
            continue  # reference girth ignores self loops
        if not t.limit(1).isEmpty():
            return float(k)
    return float("inf")
