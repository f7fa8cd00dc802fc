"""Strongly connected components — distributed coloring algorithm.

Reference semantics: ``strongly_connected_components``
(networkx/algorithms/components/strongly_connected.py:17) — Tarjan-
style sequential DFS, inherently serial. The distributed re-expression
is the classic trim+forward-color+backward-reach algorithm (Orzan; the
same scheme GraphX ships): per outer round,

1. TRIM: vertices with no in-edges or no out-edges among active
   vertices are trivial single-node SCCs — peel repeatedly,
2. COLOR: propagate ``max id that can reach v`` along forward edges to
   fixpoint (monotone max-aggregation, O(diameter) supersteps),
3. BACKWARD REACH: every color class's root (the vertex whose id ==
   its color) backward-BFSes inside its color class; reached vertices
   form the root's SCC — ALL colors resolved simultaneously,
4. remove resolved vertices, repeat.

Each phase is join + groupBy-max / semi-join supersteps with lineage
truncation; worst case (one long cycle chain) needs many rounds, but
web graphs resolve in a handful (the giant SCC gets color = max id of
its reach-set and absorbs most vertices in round 1).

Outputs match the reference exactly as SET PARTITIONS (component
representative = max vertex id in the SCC; the reference yields sets
in DFS order, so tests compare frozenset-of-frozensets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def strongly_connected_components(
    graph: LinkGraph, max_outer_rounds: int = 64, max_iters: int = 10_000
) -> DataFrame:
    """(id BIGINT, component BIGINT) — component = max vertex id in the
    SCC (deterministic representative)."""
    spark = graph.spark
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    edges = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(nparts, "src")
        .localCheckpoint(eager=True)
    )
    verts = graph.vertices.select("id").localCheckpoint(eager=True)
    done_parts: list[DataFrame] = []

    for _round in range(max_outer_rounds):
        if verts.limit(1).count() == 0:
            break

        # --- 1. trim trivial SCCs (no in- or no out-edge) repeatedly
        while True:
            has_out = edges.select("src").distinct()
            has_in = edges.select("dst").distinct()
            trivial = verts.join(
                has_out.withColumnRenamed("src", "id"), "id", "left_anti"
            ).unionByName(
                verts.join(has_in.withColumnRenamed("dst", "id"), "id", "left_anti")
            ).distinct().localCheckpoint(eager=True)
            n_triv = trivial.count()
            if n_triv == 0:
                break
            done_parts.append(trivial.select("id", F.col("id").alias("component")))
            verts = verts.join(trivial, "id", "left_anti").localCheckpoint(eager=True)
            edges = (
                edges.join(trivial.withColumnRenamed("id", "src"), "src", "left_anti")
                .join(trivial.withColumnRenamed("id", "dst"), "dst", "left_anti")
                .localCheckpoint(eager=True)
            )
        if verts.limit(1).count() == 0:
            break

        # --- 2. forward max-coloring to fixpoint
        colors = verts.select("id", F.col("id").alias("color"))
        for _ in range(max_iters):
            inbound = (
                edges.join(
                    colors.select(F.col("id").alias("src"), F.col("color").alias("c_src")),
                    "src",
                )
                .groupBy(F.col("dst").alias("id"))
                .agg(F.max("c_src").alias("c_in"))
            )
            stepped = (
                colors.join(inbound, "id", "left")
                .select(
                    "id",
                    F.greatest("color", F.coalesce("c_in", F.col("color"))).alias("color"),
                )
                .localCheckpoint(eager=True)
            )
            changed = (
                stepped.withColumnRenamed("color", "c_new")
                .join(colors.withColumnRenamed("color", "c_old"), "id")
                .where(F.col("c_new") != F.col("c_old"))
                .limit(1)
                .count()
            )
            colors = stepped
            if changed == 0:
                break

        # --- 3. backward reach from each color root within its class
        colored_edges = (
            edges.join(colors.select(F.col("id").alias("src"), F.col("color").alias("cs")), "src")
            .join(colors.select(F.col("id").alias("dst"), F.col("color").alias("cd")), "dst")
            .where(F.col("cs") == F.col("cd"))
            .select("src", "dst", F.col("cs").alias("color"))
            .localCheckpoint(eager=True)
        )
        reached = colors.where(F.col("id") == F.col("color")).select("id", "color")
        reached = reached.localCheckpoint(eager=True)
        frontier = reached
        for _ in range(max_iters):
            nxt = (
                colored_edges.join(
                    frontier.select(F.col("id").alias("dst"), F.col("color").alias("fc")),
                    "dst",
                )
                .where(F.col("color") == F.col("fc"))
                .select(F.col("src").alias("id"), "color")
                .distinct()
                .join(reached.select("id"), "id", "left_anti")
                .localCheckpoint(eager=True)
            )
            if nxt.limit(1).count() == 0:
                break
            reached = reached.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt

        done_parts.append(reached.select("id", F.col("color").alias("component")))
        verts = verts.join(reached.select("id"), "id", "left_anti").localCheckpoint(eager=True)
        edges = (
            edges.join(reached.select(F.col("id").alias("src")), "src", "left_anti")
            .join(reached.select(F.col("id").alias("dst")), "dst", "left_anti")
            .localCheckpoint(eager=True)
        )

    if verts.limit(1).count() != 0:
        # mirror PowerIterationFailedConvergence: never return a silent
        # partial labeling (long chains of small SCCs can exceed the
        # round budget — the caller must raise it explicitly)
        raise RuntimeError(
            f"strongly_connected_components did not resolve all vertices "
            f"within max_outer_rounds={max_outer_rounds}; "
            "raise max_outer_rounds"
        )
    out = done_parts[0] if done_parts else verts.select(
        "id", F.col("id").alias("component")
    )
    for p in done_parts[1:]:
        out = out.unionByName(p)
    return out


def number_strongly_connected_components(graph: LinkGraph, **kw) -> int:
    return (
        strongly_connected_components(graph, **kw)
        .agg(F.countDistinct("component"))
        .first()[0]
    )


def is_strongly_connected(graph: LinkGraph, **kw) -> bool:
    """Parity with NetworkXPointlessConcept on the null graph
    (strongly_connected.py:116 area)."""
    if graph.num_vertices() == 0:
        raise ValueError(
            "Connectivity is undefined for the null graph "
            "(NetworkXPointlessConcept parity)"
        )
    return number_strongly_connected_components(graph, **kw) == 1


def condensation_edges(graph: LinkGraph) -> DataFrame:
    """Edges of the condensation DAG (component -> component, deduped;
    networkx/algorithms/components/strongly_connected.py:279)."""
    scc = strongly_connected_components(graph)
    e = (
        graph.edges.select("src", "dst")
        .join(scc.select(F.col("id").alias("src"), F.col("component").alias("c_src")), "src")
        .join(scc.select(F.col("id").alias("dst"), F.col("component").alias("c_dst")), "dst")
        .where(F.col("c_src") != F.col("c_dst"))
        .select(F.col("c_src").alias("src"), F.col("c_dst").alias("dst"))
        .distinct()
    )
    return e


def attracting_components(graph: LinkGraph) -> DataFrame:
    """(id, component) for every vertex in an attracting component —
    an SCC with no condensation out-edge, so a random walk entering it
    never leaves (reference
    networkx/algorithms/components/attracting.py:9
    ``attracting_components``: the condensation nodes with
    out_degree 0). One SCC pass, one per-edge label join, one
    anti-join of components against the set with outgoing
    cross-component edges."""
    scc = strongly_connected_components(graph)
    has_out = (
        graph.edges.select("src", "dst")
        .join(
            scc.select(F.col("id").alias("src"), F.col("component").alias("c_src")),
            "src",
        )
        .join(
            scc.select(F.col("id").alias("dst"), F.col("component").alias("c_dst")),
            "dst",
        )
        .where(F.col("c_src") != F.col("c_dst"))
        .select(F.col("c_src").alias("component"))
        .distinct()
    )
    return scc.join(has_out, "component", "left_anti").select("id", "component")


def number_attracting_components(graph: LinkGraph) -> int:
    """attracting.py:60 ``number_attracting_components``."""
    return (
        attracting_components(graph).agg(F.countDistinct("component")).first()[0]
    )


def is_attracting_component(graph: LinkGraph) -> bool:
    """attracting.py:89 — True iff the whole graph is one attracting
    component (i.e. strongly connected and non-null)."""
    ac = attracting_components(graph).persist()
    try:
        n_comp = ac.agg(F.countDistinct("component")).first()[0]
        n_in = ac.count()
    finally:
        ac.unpersist()
    return n_comp == 1 and n_in == graph.num_vertices()


def is_semiconnected(graph: LinkGraph) -> bool:
    """True iff for every vertex pair (u, v) at least one of u→v, v→u
    holds (reference networkx/algorithms/connectivity... semiconnected.py:11
    ``is_semiconnected``): the condensation's topological order must
    form a Hamiltonian chain — every consecutive component pair in
    topological order joined by an edge. Raises ValueError on the null
    graph (NetworkXPointlessConcept parity).

    One SCC pass + condensation, one O(depth) generations loop on the
    condensation, one window lag + edge semi-join — then a two-scalar
    comparison. The reference sorts the condensation topologically and
    checks the same consecutive-pair property."""
    from pyspark.sql.window import Window

    from .dag import topological_sort

    if graph.num_vertices() == 0:
        raise ValueError(
            "Connectivity is undefined for the null graph "
            "(NetworkXPointlessConcept parity)"
        )
    scc = strongly_connected_components(graph).persist()
    try:
        comp_vertices = scc.select(F.col("component").alias("id")).distinct()
        ce = (
            graph.edges.select("src", "dst")
            .join(
                scc.select(F.col("id").alias("src"), F.col("component").alias("c_src")),
                "src",
            )
            .join(
                scc.select(F.col("id").alias("dst"), F.col("component").alias("c_dst")),
                "dst",
            )
            .where(F.col("c_src") != F.col("c_dst"))
            .select(F.col("c_src").alias("src"), F.col("c_dst").alias("dst"))
            .distinct()
            .persist()
        )
        cond = LinkGraph(
            vertices=comp_vertices,
            edges=ce.withColumn("weight", F.lit(1.0)),
            directed=True,
        )
        order = topological_sort(cond)
        # the single-partition window here ranks CONDENSATION nodes
        # (#SCCs after contraction), not raw vertices; for web graphs
        # the giant SCC collapses most mass. Consecutive pairs:
        w = Window.orderBy("topo_rank")
        pairs = (
            order.select("id", "topo_rank")
            .withColumn("_next", F.lead("id").over(w))
            .where(F.col("_next").isNotNull())
            .select(F.col("id").alias("src"), F.col("_next").alias("dst"))
        )
        n_pairs = pairs.count()
        n_linked = pairs.join(ce, ["src", "dst"], "left_semi").count()
        ce.unpersist()
        return n_linked == n_pairs
    finally:
        scc.unpersist()


def flow_hierarchy(graph: LinkGraph, weighted: bool = False) -> float:
    """Fraction of edge weight NOT participating in any cycle — i.e.
    edges whose endpoints lie in different SCCs (reference
    networkx/algorithms/hierarchy.py:10 ``flow_hierarchy``; Luo &
    Magee 2011). Directed graphs only, matching the reference's
    NetworkXError on undirected input.

    One SCC pass + two label joins + a one-row aggregate (documented
    driver boundary). ``weighted=True`` weighs edges by their
    ``weight`` column; the reference's default counts edges."""
    row = flow_hierarchy_df(graph, weighted=weighted).first()
    if row["flow_hierarchy"] is None:
        raise ZeroDivisionError("flow_hierarchy of a graph with no edges")
    return float(row["flow_hierarchy"])


def flow_hierarchy_df(graph: LinkGraph, weighted: bool = False) -> DataFrame:
    """One-row DataFrame form of :func:`flow_hierarchy` — the whole
    fraction rides the plan (entry-query / composition surface)."""
    if not graph.directed:
        raise ValueError("flow_hierarchy is not applicable to undirected graphs")
    scc = strongly_connected_components(graph)
    w = F.coalesce(F.col("weight"), F.lit(1.0)) if weighted else F.lit(1.0)
    return (
        graph.edges.join(
            scc.select(F.col("id").alias("src"), F.col("component").alias("_cs")),
            "src",
        )
        .join(
            scc.select(F.col("id").alias("dst"), F.col("component").alias("_cd")),
            "dst",
        )
        .agg(
            (
                F.sum(
                    F.when(F.col("_cs") != F.col("_cd"), w).otherwise(F.lit(0.0))
                ).cast("double")
                / F.sum(w)
            ).alias("flow_hierarchy")
        )
    )


def is_aperiodic(graph: LinkGraph) -> bool:
    """True iff no integer k > 1 divides every cycle length (reference
    networkx is_aperiodic, Jarvis & Shier 1996). Directed, strongly
    connected input required — raises ValueError otherwise, mirroring
    the reference's NetworkXError/NetworkXPointlessConcept.

    The reference's sequential BFS that gcds ``level[u]−level[v]+1``
    over non-tree edges generalizes cleanly: with BFS levels from any
    source, a tree-consistent edge contributes 0 (gcd-neutral), so the
    period is gcd over ALL edges of that difference. One bfs_layers
    pass (O(diameter) supersteps), one per-edge join, one DISTINCT on
    the difference — at most 2·depth+1 values, a documented
    driver-scale boundary — then gcd on the driver."""
    import math

    from .traversal import bfs_layers

    if not graph.directed:
        raise ValueError("is_aperiodic not defined for undirected graphs")
    n = graph.num_vertices()
    if n == 0:
        raise ValueError("Graph has no nodes (NetworkXPointlessConcept parity)")
    src = graph.vertices.agg(F.min("id")).first()[0]
    levels = bfs_layers(graph, [src]).select(
        "id", F.col("layer").cast("long").alias("_lvl")
    ).localCheckpoint(eager=True)
    # strong-connectivity via two BFS passes from one source (forward
    # reach-all + backward reach-all) — equivalent to the full SCC
    # decomposition for this yes/no question at a fraction of the cost
    if levels.count() != n:
        raise ValueError("Graph is not strongly connected")
    if bfs_layers(graph.reverse(), [src]).count() != n:
        raise ValueError("Graph is not strongly connected")
    diffs = (
        graph.edges.select("src", "dst")
        .join(levels.select(F.col("id").alias("src"), F.col("_lvl").alias("_lu")), "src")
        .join(levels.select(F.col("id").alias("dst"), F.col("_lvl").alias("_lv")), "dst")
        .select((F.col("_lu") - F.col("_lv") + 1).alias("d"))
        .distinct()
        .collect()
    )
    g = 0
    for r in diffs:
        g = math.gcd(g, int(r["d"]))
    return g == 1
