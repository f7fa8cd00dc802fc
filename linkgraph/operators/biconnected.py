"""Biconnected components, articulation points, and bridges.

Reference semantics: ``nx.biconnected_components`` /
``nx.biconnected_component_edges`` / ``nx.articulation_points`` /
``nx.bridges`` (networkx/algorithms/components/biconnected.py,
networkx/algorithms/bridges.py) — the reference runs a sequential
Hopcroft–Tarjan DFS with an edge stack. A DFS is inherently
sequential, so the distributed form here is the classic
Tarjan–Vishkin reduction (Tarjan & Vishkin 1985, "An efficient
parallel biconnectivity algorithm"), which works over ANY rooted
spanning tree, not just a DFS tree:

  1. connected components → one root (min id) per component;
  2. BFS spanning forest from the roots (frontier supersteps,
     parent(v) = min neighbor one layer up — deterministic);
  3. subtree sizes ``nd`` by a bottom-up level sweep, preorder
     numbers ``pre`` by a top-down level sweep (sibling offsets via a
     per-parent window cumsum of nd);
  4. ``low`` / ``high`` = min/max preorder reachable from the subtree
     through one non-tree edge — another bottom-up sweep;
  5. an auxiliary graph whose vertices are the TREE EDGES (keyed by
     the child endpoint):
       rule 1: non-tree edge {u,w}, pre(u)+nd(u) <= pre(w)
               (unrelated subtrees) → aux edge (u, w);
       rule 2: tree edge (u=parent(v), v), u non-root, and
               low(v) < pre(u) or high(v) >= pre(u)+nd(u)
               (the cycle through v escapes u's subtree-slice)
               → aux edge (u, v);
     connected components of the auxiliary graph ARE the biconnected
     components; a non-tree edge belongs to the block of its
     later-preorder endpoint.

Every sweep is O(depth) joins over level-sized slices; BFS forests on
web graphs are shallow, so the job count stays small where the data
is large. Output block labels are canonicalized to the
lexicographically smallest (src, dst) edge in the block so results
are deterministic and oracle-hashable.

Articulation points use the partition-level characterization — v is
an articulation point iff its incident edges lie in >= 2 distinct
blocks — which needs no root special-casing. Bridges are the
single-edge blocks (matching ``nx.bridges``: an edge in no cycle).

Small graphs (below ``local_max_edges``, mirroring the CC/triangles
fast paths) run the reference's own device — an iterative
Hopcroft–Tarjan with an explicit edge stack — inside ONE
``mapInPandas`` task (Arrow in, Arrow out; never the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..graph import LinkGraph
from .components import connected_components

LOCAL_BICONN_MAX_EDGES = 200_000


def _simple_edges(graph: LinkGraph) -> DataFrame:
    """Canonical simple undirected edge set: src < dst, deduped,
    self-loops dropped (a self-loop is never in a biconnected
    component and never affects articulation)."""
    e = graph.edges.select(
        F.least("src", "dst").cast("long").alias("src"),
        F.greatest("src", "dst").cast("long").alias("dst"),
    )
    return e.where(F.col("src") < F.col("dst")).distinct()


def _local_biconnected(ep: DataFrame) -> DataFrame:
    """Single-task iterative Hopcroft–Tarjan (the reference algorithm,
    networkx/algorithms/components/biconnected.py:380 ``_biconnected_dfs``,
    re-derived here with an explicit stack — no recursion, no nx import)."""
    ep = ep.coalesce(1)

    def fn(batches):
        import numpy as np
        import pandas as pd

        srcs, dsts = [], []
        for b in batches:
            srcs.append(b["src"].to_numpy(dtype="int64"))
            dsts.append(b["dst"].to_numpy(dtype="int64"))
        src = np.concatenate(srcs) if srcs else np.empty(0, np.int64)
        dst = np.concatenate(dsts) if dsts else np.empty(0, np.int64)
        adj: dict[int, list[int]] = {}
        for u, v in zip(src.tolist(), dst.tolist()):
            adj.setdefault(u, []).append(v)
            adj.setdefault(v, []).append(u)
        for u in adj:
            adj[u].sort()

        disc: dict[int, int] = {}
        low: dict[int, int] = {}
        out_s, out_d, out_ls, out_ld = [], [], [], []

        def emit(block: list[tuple[int, int]]) -> None:
            lbl = min(block)
            for a, b_ in block:
                out_s.append(a)
                out_d.append(b_)
                out_ls.append(lbl[0])
                out_ld.append(lbl[1])

        counter = 0
        for start in sorted(adj):
            if start in disc:
                continue
            disc[start] = low[start] = counter
            counter += 1
            estack: list[tuple[int, int]] = []
            # (node, parent, iterator index)
            stack = [(start, -1, 0)]
            while stack:
                u, parent, i = stack[-1]
                nbrs = adj[u]
                advanced = False
                while i < len(nbrs):
                    w = nbrs[i]
                    i += 1
                    if w == parent:
                        # skip ONE parent occurrence (simple graph:
                        # exactly one edge back to the parent)
                        parent = -1
                        continue
                    if w not in disc:
                        disc[w] = low[w] = counter
                        counter += 1
                        estack.append((u, w))
                        stack[-1] = (u, parent, i)
                        stack.append((w, u, 0))
                        advanced = True
                        break
                    if disc[w] < disc[u]:
                        estack.append((u, w))
                        low[u] = min(low[u], disc[w])
                if advanced:
                    continue
                stack.pop()
                if stack:
                    pu = stack[-1][0]
                    low[pu] = min(low[pu], low[u])
                    if low[u] >= disc[pu]:
                        # pop the block delimited by tree edge (pu, u)
                        block = []
                        while estack and disc[estack[-1][0]] >= disc[u]:
                            block.append(estack.pop())
                        if estack and estack[-1] == (pu, u):
                            block.append(estack.pop())
                        if block:
                            emit(
                                [
                                    (min(a, b_), max(a, b_))
                                    for a, b_ in block
                                ]
                            )
        yield pd.DataFrame(
            {
                "src": pd.Series(out_s, dtype="int64"),
                "dst": pd.Series(out_d, dtype="int64"),
                "bc_src": pd.Series(out_ls, dtype="int64"),
                "bc_dst": pd.Series(out_ld, dtype="int64"),
            }
        )

    return ep.mapInPandas(fn, "src long, dst long, bc_src long, bc_dst long")


def _level_graph(ep: DataFrame, verts: DataFrame, spark) -> DataFrame:
    """BFS forest: (id, comp, layer, parent) — parent NULL at roots.
    One CC run + one frontier loop; parent = min neighbor one layer
    up (deterministic)."""
    g = LinkGraph(vertices=verts, edges=ep, directed=False)
    comp = connected_components(g).persist()
    sym = ep.unionByName(
        ep.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    sym.count()

    # frontier BFS from all component roots at once
    frontier = comp.where(F.col("id") == F.col("component")).select("id")
    visited = frontier.select("id", F.lit(0).alias("layer")).persist()
    visited.count()
    depth = 0
    while True:
        depth += 1
        nxt = (
            sym.join(frontier.withColumnRenamed("id", "src"), "src", "left_semi")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
        )
        nxt = nxt.select("id", F.lit(depth).alias("layer")).persist()
        n = nxt.count()
        if n == 0:
            nxt.unpersist()
            break
        new_visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        visited.unpersist()
        nxt.unpersist()
        visited = new_visited
        frontier = visited.where(F.col("layer") == depth).select("id")

    lv = visited
    parent = (
        sym.join(lv.withColumnRenamed("id", "src").withColumnRenamed("layer", "ls"), "src")
        .join(lv.withColumnRenamed("id", "dst").withColumnRenamed("layer", "ld"), "dst")
        .where(F.col("ls") == F.col("ld") - 1)
        .groupBy(F.col("dst").alias("id"))
        .agg(F.min("src").alias("parent"))
    )
    out = (
        lv.join(parent, "id", "left")
        .join(comp.withColumnRenamed("component", "comp"), "id")
        .select("id", "comp", "layer", "parent")
        .localCheckpoint(eager=True)
    )
    comp.unpersist()
    sym.unpersist()
    visited.unpersist()
    return out


def _distributed_biconnected(ep: DataFrame, spark) -> DataFrame:
    verts = ep.select(F.col("src").alias("id")).unionByName(
        ep.select(F.col("dst").alias("id"))
    ).distinct().persist()
    tree = _level_graph(ep, verts, spark).persist()
    max_layer = tree.agg(F.max("layer")).first()[0] or 0

    # ---- bottom-up nd (subtree sizes): one join+agg per level ------
    nd = tree.select("id", "parent", "layer", F.lit(1).alias("nd"))
    nd = nd.localCheckpoint(eager=True)
    for lvl in range(max_layer, 0, -1):
        child_sum = (
            nd.where(F.col("layer") == lvl)
            .groupBy(F.col("parent").alias("id"))
            .agg(F.sum("nd").alias("child_nd"))
        )
        nd = (
            nd.join(child_sum, "id", "left")
            .withColumn("nd", F.col("nd") + F.coalesce("child_nd", F.lit(0)))
            .drop("child_nd")
            .localCheckpoint(eager=True)
        )

    # ---- top-down pre: sibling offsets via per-parent window cumsum
    sib = Window.partitionBy("parent").orderBy("id")
    offs = nd.withColumn(
        "offset",
        F.lit(1)
        + F.coalesce(
            F.sum("nd").over(sib.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    pre = offs.where(F.col("layer") == 0).select(
        "id", "layer", "parent", "nd", F.lit(0).alias("pre")
    )
    pre = pre.localCheckpoint(eager=True)
    for lvl in range(1, max_layer + 1):
        nxt = (
            offs.where(F.col("layer") == lvl)
            .join(
                pre.select(F.col("id").alias("parent"), F.col("pre").alias("ppre")),
                "parent",
            )
            .select(
                "id",
                "layer",
                "parent",
                "nd",
                (F.col("ppre") + F.col("offset")).alias("pre"),
            )
        )
        pre = pre.unionByName(nxt).localCheckpoint(eager=True)

    tree.unpersist()
    prev = pre.persist()
    prev.count()

    # ---- non-tree edges (both directions), with pre on both ends ---
    sym = ep.unionByName(
        ep.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    pcols = prev.select(
        F.col("id").alias("src"),
        F.col("pre").alias("pre_u"),
        F.col("nd").alias("nd_u"),
        F.col("parent").alias("par_u"),
    )
    qcols = prev.select(
        F.col("id").alias("dst"),
        F.col("pre").alias("pre_w"),
        F.col("parent").alias("par_w"),
    )
    ann = sym.join(pcols, "src").join(qcols, "dst")
    non_tree = ann.where(
        (F.col("par_u").isNull() | (F.col("par_u") != F.col("dst")))
        & (F.col("par_w").isNull() | (F.col("par_w") != F.col("src")))
    ).persist()
    non_tree.count()

    # ---- bottom-up low/high ----------------------------------------
    nt_agg = non_tree.groupBy(F.col("src").alias("id")).agg(
        F.min("pre_w").alias("ntmin"), F.max("pre_w").alias("ntmax")
    )
    lh = (
        prev.join(nt_agg, "id", "left")
        .select(
            "id",
            "layer",
            "parent",
            "pre",
            "nd",
            F.least("pre", F.coalesce("ntmin", F.col("pre"))).alias("low"),
            F.greatest("pre", F.coalesce("ntmax", F.col("pre"))).alias("high"),
        )
        .localCheckpoint(eager=True)
    )
    for lvl in range(max_layer, 0, -1):
        child_lh = (
            lh.where(F.col("layer") == lvl)
            .groupBy(F.col("parent").alias("id"))
            .agg(F.min("low").alias("clow"), F.max("high").alias("chigh"))
        )
        lh = (
            lh.join(child_lh, "id", "left")
            .withColumn("low", F.least("low", F.coalesce("clow", F.col("low"))))
            .withColumn(
                "high", F.greatest("high", F.coalesce("chigh", F.col("high")))
            )
            .drop("clow", "chigh")
            .localCheckpoint(eager=True)
        )
    lh = lh.persist()
    lh.count()

    # ---- auxiliary graph (vertices = non-root tree-edge child ids) -
    # rule 1: unrelated non-tree edge → (u, w)
    aux1 = (
        non_tree.where(F.col("src") < F.col("dst"))
        .withColumn(
            "lo",
            F.when(F.col("pre_u") <= F.col("pre_w"), F.col("src")).otherwise(
                F.col("dst")
            ),
        )
        .withColumn(
            "hi",
            F.when(F.col("pre_u") <= F.col("pre_w"), F.col("dst")).otherwise(
                F.col("src")
            ),
        )
        .withColumn("plo", F.least("pre_u", "pre_w"))
        .withColumn("phi", F.greatest("pre_u", "pre_w"))
        .join(lh.select(F.col("id").alias("lo"), F.col("nd").alias("ndlo")), "lo")
        .where(F.col("plo") + F.col("ndlo") <= F.col("phi"))
        .select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    )
    # rule 2: tree edge (u=parent(v), v), u non-root, escape condition
    aux2 = (
        lh.where(F.col("parent").isNotNull())
        .join(
            lh.select(
                F.col("id").alias("parent"),
                F.col("pre").alias("ppre"),
                F.col("nd").alias("pnd"),
                F.col("parent").alias("gp"),
            ),
            "parent",
        )
        .where(F.col("gp").isNotNull())
        .where(
            (F.col("low") < F.col("ppre"))
            | (F.col("high") >= F.col("ppre") + F.col("pnd"))
        )
        .select(F.col("parent").alias("a"), F.col("id").alias("b"))
    )
    aux_edges = aux1.unionByName(aux2)
    aux_verts = lh.where(F.col("parent").isNotNull()).select("id")
    aux_g = LinkGraph(
        vertices=aux_verts,
        edges=aux_edges.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        directed=False,
    )
    blocks = connected_components(aux_g).persist()  # (id=child, component)
    blocks.count()

    # ---- map every simple edge to its block -------------------------
    # tree edge (parent(v), v) → block(v); non-tree {u,w} → block of
    # the later-preorder endpoint.
    tree_edges = lh.where(F.col("parent").isNotNull()).select(
        F.least("parent", "id").alias("src"),
        F.greatest("parent", "id").alias("dst"),
        F.col("id").alias("key"),
    )
    nt_half = (
        non_tree.where(F.col("src") < F.col("dst"))
        .withColumn(
            "key",
            F.when(F.col("pre_u") >= F.col("pre_w"), F.col("src")).otherwise(
                F.col("dst")
            ),
        )
        .select("src", "dst", "key")
    )
    edge_blocks = (
        tree_edges.unionByName(nt_half)
        .join(blocks.withColumnRenamed("id", "key"), "key")
        .select("src", "dst", "component")
    )
    canon = edge_blocks.groupBy("component").agg(
        F.min(F.struct("src", "dst")).alias("m")
    ).select(
        "component",
        F.col("m.src").alias("bc_src"),
        F.col("m.dst").alias("bc_dst"),
    )
    out = edge_blocks.join(canon, "component").select(
        "src", "dst", "bc_src", "bc_dst"
    )
    out = out.localCheckpoint(eager=True)
    for df in (prev, non_tree, lh, blocks, verts):
        df.unpersist()
    return out


def biconnected_components(
    graph: LinkGraph,
    local_max_edges: int = LOCAL_BICONN_MAX_EDGES,
) -> DataFrame:
    """(src, dst, bc_src, bc_dst) — one row per simple undirected
    edge; (bc_src, bc_dst) is the lexicographically smallest edge of
    the edge's biconnected component (deterministic block label).

    Matches ``nx.biconnected_component_edges`` as an edge partition
    (block labels there are positional, here canonical)."""
    ep = _simple_edges(graph).persist()
    try:
        if local_max_edges and ep.count() <= local_max_edges:
            return _local_biconnected(ep)
        return _distributed_biconnected(ep, graph.spark)
    finally:
        ep.unpersist()


def articulation_points(
    graph: LinkGraph,
    local_max_edges: int = LOCAL_BICONN_MAX_EDGES,
) -> DataFrame:
    """(id) — vertices whose incident edges lie in >= 2 distinct
    biconnected components (exactly the reference's articulation set,
    networkx/algorithms/components/biconnected.py:36)."""
    eb = biconnected_components(graph, local_max_edges=local_max_edges)
    ends = eb.select(
        F.col("src").alias("id"), "bc_src", "bc_dst"
    ).unionByName(eb.select(F.col("dst").alias("id"), "bc_src", "bc_dst"))
    return (
        ends.groupBy("id")
        .agg(F.count_distinct("bc_src", "bc_dst").alias("nblocks"))
        .where(F.col("nblocks") >= 2)
        .select("id")
    )


def bridges(
    graph: LinkGraph,
    local_max_edges: int = LOCAL_BICONN_MAX_EDGES,
) -> DataFrame:
    """(src, dst) — edges in no cycle (``nx.bridges``,
    networkx/algorithms/bridges.py:12): exactly the single-edge
    biconnected components."""
    eb = biconnected_components(graph, local_max_edges=local_max_edges).persist()
    try:
        singles = (
            eb.groupBy("bc_src", "bc_dst")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") == 1)
        )
        return eb.join(singles, ["bc_src", "bc_dst"], "left_semi").select(
            "src", "dst"
        ).localCheckpoint(eager=True)
    finally:
        eb.unpersist()
