"""DAG layering: topological generations / cycle detection.

Reference semantics — networkx/algorithms/dag.py:

* ``topological_generations`` (:282-338): peel zero-in-degree nodes
  in rounds (Kahn); generation(v) = the round in which v's in-degree
  reaches zero. Equivalently generation(v) = length of the longest
  directed path ending at v — the max-plus fixpoint
  g(v) = max_{(u,v) in E} g(u) + 1 (0 for roots), which is the form a
  superstep program computes without materializing the peeling order.
* ``topological_sort`` (:164): any ordering by (generation, id) is a
  valid topological order; the deterministic one emitted here sorts
  by generation then id.
* ``is_directed_acyclic_graph`` (:123): a cycle never reaches the
  fixpoint — generations keep growing past |V| - 1, which the loop
  detects and reports (the reference raises NetworkXUnfeasible from
  ``topological_generations``).

Physical strategy: g starts 0 everywhere; each superstep is one
gather (join labels on src, groupBy dst max, map-side combine) over
an edge table partitioned by src that never re-shuffles. Only the
max-plus updates that CHANGED propagate work in later rounds —
the join keys on the changed frontier, so round cost decays with the
number of still-moving vertices. Rounds = #generations (graph depth),
the same O(diameter) bound as BFS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.loop import stable_checkpoint
from ._local import member_maps, run_local_kernel

# Size gate for the single-task longest-path kernel (same cost model
# as pagerank.py LOCAL_PR_MAX_EDGES): the distributed max-plus
# fixpoint pays one gather join + eager materialization per DAG depth
# level — a per-round scheduling floor that dwarfs the vectorized
# Kahn sweep below a few million edges.
LOCAL_DAG_MAX_EDGES = 2_000_000


class GraphContainsCycle(ValueError):
    """Mirror of networkx NetworkXUnfeasible (dag.py:319)."""


def topological_generations(
    graph: LinkGraph, num_partitions: int | None = None
) -> DataFrame:
    """(id BIGINT, generation BIGINT) for every vertex; raises
    :class:`GraphContainsCycle` when the graph has a directed cycle."""
    spark = graph.spark
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    edges = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))  # a self-loop is a cycle
        .distinct()
        .join(graph.vertices.select(F.col("id").alias("src")), "src", "left_semi")
        .join(graph.vertices.select(F.col("id").alias("dst")), "dst", "left_semi")
        .repartition(num_partitions, "src")
        .persist()
    )
    if (
        graph.edges.where(F.col("src") == F.col("dst"))
        .join(graph.vertices.select(F.col("id").alias("src")), "src", "left_semi")
        .limit(1)
        .count()
    ):
        edges.unpersist()
        raise GraphContainsCycle("self-loop")
    edges.count()

    n = graph.vertices.count()
    g = (
        graph.vertices.select("id", F.lit(0).cast("long").alias("generation"))
        .repartition(num_partitions, "id")
        .persist()
    )
    g.count()
    frontier = g  # vertices whose generation changed last round
    try:
        rounds = 0
        while True:
            cand = (
                edges.join(
                    frontier.select(F.col("id").alias("src"), "generation"), "src"
                )
                .groupBy(F.col("dst").alias("id"))
                .agg((F.max("generation") + 1).alias("ng"))
            )
            # localCheckpoint (not bare persist): the frontier feeds the
            # next round's join, so an unbroken lineage chain would grow
            # one plan level per round — O(rounds) analysis cost and an
            # eventual driver OOM stringifying the plan on deep graphs
            moved = (
                cand.join(g, "id")
                .where(F.col("ng") > F.col("generation"))
                .select("id", F.col("ng").alias("generation"))
                .localCheckpoint(eager=True)
            )
            n_moved = moved.count()
            if frontier is not g:
                frontier.unpersist()
            if n_moved == 0:
                moved.unpersist()
                return g
            rounds += 1
            if rounds > n:
                raise GraphContainsCycle(
                    f"generations still growing after {n} rounds"
                )
            new_g = (
                g.join(moved.select("id"), "id", "left_anti")
                .unionByName(moved)
                .repartition(num_partitions, "id")
                .localCheckpoint(eager=True)
            )
            g.unpersist()
            g = new_g
            frontier = moved
    finally:
        edges.unpersist()


def is_directed_acyclic_graph(graph: LinkGraph) -> bool:
    """dag.py:123 — True iff the max-plus layering reaches a fixpoint."""
    try:
        topological_generations(graph)
        return True
    except GraphContainsCycle:
        return False


def topological_sort(graph: LinkGraph) -> DataFrame:
    """(id, generation, topo_rank) — deterministic valid topological
    order: sort by (generation, id). The reference's order depends on
    insertion order (dag.py:164); any generation-respecting order is
    valid, and tests verify the ordering constraint, not the exact
    sequence."""
    from pyspark.sql.window import Window

    g = topological_generations(graph)
    # global rank: generations are already a partial order; ranking
    # within a generation by id via a per-generation window plus
    # broadcast generation offsets (same two-phase device as
    # assign_dense_ids — no single-partition window)
    w = Window.partitionBy("generation").orderBy("id")
    local = g.withColumn("_rn", F.row_number().over(w))
    offsets = (
        g.groupBy("generation")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.orderBy("generation").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("generation", "_off")
    )
    return local.join(F.broadcast(offsets), "generation").select(
        "id",
        "generation",
        (F.col("_rn") - 1 + F.col("_off")).cast("long").alias("topo_rank"),
    )


def ancestor_closure(graph: LinkGraph, sources: DataFrame) -> DataFrame:
    """(q, anc) — every ancestor of every queried node, each node its
    own ancestor (the reference's LCA convention). Multi-source
    reverse BFS: all queried nodes advance in lock-step, so rounds =
    ancestor-DAG depth regardless of |sources|; per-round state is the
    new frontier only (anti-joined against seen)."""
    rev = graph.edges.select(
        F.col("dst").alias("anc"), F.col("src").alias("_nxt")
    ).distinct().persist()
    seen = sources.select(F.col("q"), F.col("q").alias("anc")).localCheckpoint()
    frontier = seen
    while True:
        nxt = (
            frontier.join(rev, "anc")
            .select("q", F.col("_nxt").alias("anc"))
            .distinct()
            .join(seen, ["q", "anc"], "left_anti")
            .localCheckpoint()
        )
        if nxt.isEmpty():
            return seen
        seen = seen.unionByName(nxt).localCheckpoint()
        frontier = nxt


def _local_longest_paths(statics: DataFrame, edges: DataFrame) -> DataFrame:
    """Single-task longest-path labels: vectorized Kahn — process
    indegree-0 levels, relax out-edges with ``np.maximum.at`` — which
    reaches the same max-plus fixpoint as the distributed frontier
    loop (every predecessor is final before a vertex relaxes).
    Self-loops and cycles are detected in-kernel and surfaced as an
    error code so the driver raises :class:`GraphContainsCycle`
    exactly like the superstep plan."""

    def kernel(ids, stat, es, ed, ew):
        import numpy as np

        nv = len(ids)
        si, di, ms, md = member_maps(ids, es, ed)
        if bool((ms & (es == ed)).any()):
            return {
                "id": ids,
                "dist": np.zeros(nv),
                "err": np.full(nv, 1, dtype=np.int32),
            }
        keep = ms & md & (es != ed)
        gs = si[keep].astype(np.int64)
        gd = di[keep].astype(np.int64)
        gw = ew[keep]
        d = np.zeros(nv)
        indeg = np.bincount(gd, minlength=nv)
        frontier = indeg == 0
        done = frontier.copy()
        while True:
            fe = frontier[gs]
            if not fe.any():
                break
            np.maximum.at(d, gd[fe], d[gs[fe]] + gw[fe])
            indeg = indeg - np.bincount(gd[fe], minlength=nv)
            frontier = (indeg == 0) & ~done
            done |= frontier
        err = 0
        if int(done.sum()) < nv:
            # cycle-tangled residue: finish with Jacobi max-plus
            # rounds, replicating the distributed loop's decision
            # exactly — converge to the same least fixpoint (a
            # non-improving cycle stabilizes) or raise after > |V|
            # improving rounds (a growing cycle never does)
            rounds = 0
            while True:
                nd = d.copy()
                np.maximum.at(nd, gd, d[gs] + gw)
                if bool((nd <= d).all()):
                    break
                d = nd
                rounds += 1
                if rounds > nv:
                    err = 2
                    break
        return {
            "id": ids,
            "dist": d,
            "err": np.full(nv, err, dtype=np.int32),
        }

    return run_local_kernel(
        edges, statics, [], kernel, "id long, dist double, err int"
    )


def longest_path_lengths(
    graph: LinkGraph,
    weighted: bool = False,
    num_partitions: int | None = None,
    local_max_edges: int = LOCAL_DAG_MAX_EDGES,
) -> DataFrame:
    """(id BIGINT, dist DOUBLE) — weight of the heaviest directed path
    ending at each vertex (0 for roots). The weighted max-plus form of
    :func:`topological_generations`: d(v) = max_{(u,v)} d(u) + w(u,v),
    reference ``dag_longest_path_length`` (networkx/algorithms/dag.py
    dag_longest_path, default_weight=1 when ``weighted=False``).

    Same physical profile as the generations pass: one gather join +
    map-side-combined groupBy max per superstep over an edge table
    partitioned once by src; only still-moving vertices ride the
    frontier, so round cost decays. Raises :class:`GraphContainsCycle`
    when rounds exceed |V| (a cycle never reaches the fixpoint).
    """
    spark = graph.spark
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # single-task numpy kernel below the size gate (the kernel
    # member-filters, takes parallel-edge maxes, detects self-loops
    # and cycles internally)
    if local_max_edges:
        ep = graph.weighted_edges().select(
            "src",
            "dst",
            (F.col("weight") if weighted else F.lit(1.0)).alias("weight"),
        ).persist()
        if ep.count() <= local_max_edges:
            try:
                res = _local_longest_paths(
                    graph.vertices.select("id"), ep
                ).persist()
                meta = res.select("err").first()
                if meta is not None and meta["err"]:
                    res.unpersist()
                    raise GraphContainsCycle(
                        "self-loop"
                        if meta["err"] == 1
                        else "longest-path labels still growing (cycle)"
                    )
                return res.select("id", "dist")
            finally:
                ep.unpersist()
        ep.unpersist()

    edges = (
        graph.weighted_edges()
        .select(
            "src",
            "dst",
            (F.col("weight") if weighted else F.lit(1.0)).alias("w"),
        )
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.max("w").alias("w"))  # parallel edges: heaviest wins
        .join(graph.vertices.select(F.col("id").alias("src")), "src", "left_semi")
        .join(graph.vertices.select(F.col("id").alias("dst")), "dst", "left_semi")
        .repartition(num_partitions, "src")
        .persist()
    )
    if (
        graph.edges.where(F.col("src") == F.col("dst"))
        .join(graph.vertices.select(F.col("id").alias("src")), "src", "left_semi")
        .limit(1)
        .count()
    ):
        edges.unpersist()
        raise GraphContainsCycle("self-loop")
    edges.count()

    n = graph.vertices.count()
    d = (
        graph.vertices.select("id", F.lit(0.0).alias("dist"))
        .repartition(num_partitions, "id")
        .persist()
    )
    d.count()
    frontier = d
    try:
        rounds = 0
        while True:
            cand = (
                edges.join(frontier.select(F.col("id").alias("src"), "dist"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.max(F.col("dist") + F.col("w")).alias("nd"))
            )
            moved = (
                cand.join(d, "id")
                .where(F.col("nd") > F.col("dist"))
                .select("id", F.col("nd").alias("dist"))
                .localCheckpoint(eager=True)
            )
            n_moved = moved.count()
            if frontier is not d:
                frontier.unpersist()
            if n_moved == 0:
                moved.unpersist()
                return d
            rounds += 1
            if rounds > n:
                raise GraphContainsCycle(
                    f"longest-path labels still growing after {n} rounds"
                )
            new_d = (
                d.join(moved.select("id"), "id", "left_anti")
                .unionByName(moved)
                .repartition(num_partitions, "id")
                .localCheckpoint(eager=True)
            )
            d.unpersist()
            d = new_d
            frontier = moved
    finally:
        edges.unpersist()


def dag_longest_path(graph: LinkGraph, weighted: bool = False) -> DataFrame:
    """(pos BIGINT, id BIGINT) — one heaviest directed path, pos 0 at
    its start. Reference ``dag_longest_path`` (dag.py) returns an
    ARBITRARY argmax path (DFS/insertion order); this engine picks
    deterministically: endpoint = max dist, ties to smallest id;
    predecessor of v = the in-neighbor u with d(u) + w(u,v) = d(v)
    ("tight" edge), ties to smallest id. Documented divergence —
    always *a* maximum-weight path, stable across runs.

    Physical plan: one :func:`longest_path_lengths` pass, ONE join to
    pick every vertex's tight predecessor (no per-step lookups), then
    the endpoint's predecessor chain is materialized by pointer
    doubling over the tight-predecessor forest — O(log path-length)
    self-joins, never a driver-side walk.
    """
    dist = longest_path_lengths(graph, weighted=weighted).persist()
    dist.count()
    from pyspark.sql.window import Window

    end_row = dist.orderBy(F.col("dist").desc(), F.col("id").asc()).first()
    end_id, end_dist = end_row["id"], end_row["dist"]

    edges = (
        graph.weighted_edges()
        .select(
            "src",
            "dst",
            (F.col("weight") if weighted else F.lit(1.0)).alias("w"),
        )
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.max("w").alias("w"))
    )
    tight = (
        edges.join(dist.select(F.col("id").alias("src"), F.col("dist").alias("ds")), "src")
        .join(dist.select(F.col("id").alias("dst"), F.col("dist").alias("dd")), "dst")
        .where(F.col("ds") + F.col("w") == F.col("dd"))
    )
    w = Window.partitionBy("dst").orderBy(F.col("src").asc())
    pred = (
        tight.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(F.col("dst").alias("id"), F.col("src").alias("pred"))
    )
    dist.unpersist()

    # pointer doubling: chain(k) holds ancestors of the endpoint at
    # every back-offset reachable with jumps of stride < 2^k; jump is
    # the 2^(k-1)-step predecessor table. Rounds = ceil(log2(L)).
    spark = graph.spark
    # stable_checkpoint, not bare localCheckpoint: jump joins ITSELF
    # each round, so carried-over origin stats would square per round
    # (see plans/loop.py stable_checkpoint).
    chain = stable_checkpoint(
        spark.createDataFrame([(int(end_id), 0)], "id LONG, back LONG")
    )
    jump = pred.select("id", F.col("pred").alias("anc"), F.lit(1).alias("hops"))
    jump = stable_checkpoint(jump)
    while True:
        ext = stable_checkpoint(
            chain.join(jump, "id")
            .select(F.col("anc").alias("id"), (F.col("back") + F.col("hops")).alias("back"))
            .join(chain, ["id", "back"], "left_anti")
        )
        if ext.isEmpty():
            break
        chain = stable_checkpoint(chain.unionByName(ext))
        jump = stable_checkpoint(
            jump.join(
                jump.select(
                    F.col("id").alias("anc"),
                    F.col("anc").alias("anc2"),
                    F.col("hops").alias("hops2"),
                ),
                "anc",
            )
            .select("id", F.col("anc2").alias("anc"), (F.col("hops") + F.col("hops2")).alias("hops"))
        )
        if jump.isEmpty():
            # strides exhausted; remaining chain fills via 1-step jumps
            jump = stable_checkpoint(
                pred.select("id", F.col("pred").alias("anc"), F.lit(1).alias("hops"))
            )
    path_len = chain.agg(F.max("back")).first()[0]
    return chain.select(
        (F.lit(path_len) - F.col("back")).cast("long").alias("pos"), "id"
    )


def transitive_closure(graph: LinkGraph) -> DataFrame:
    """(src, dst) — every ordered pair with a directed path of length
    >= 1 (reference ``transitive_closure``, dag.py, reflexive=False —
    which still yields (u, u) whenever u lies on a CYCLE, since that
    is a real path of length >= 1; only zero-length trivial loops are
    excluded). Output is O(n·reach) — quadratic on dense DAGs; the
    per-query form is :func:`ancestor_closure`. Path doubling:
    C <- C ∪ C∘C, so rounds = ceil(log2(longest path)), each one
    equi-join + distinct."""
    # stable_checkpoint: c is referenced THREE times per round (path
    # doubling + anti-join), so origin stats would cube per round.
    c = stable_checkpoint(graph.edges.select("src", "dst").distinct())
    while True:
        ext = stable_checkpoint(
            c.join(
                c.select(F.col("src").alias("dst"), F.col("dst").alias("d2")),
                "dst",
            )
            .select("src", F.col("d2").alias("dst"))
            .distinct()
            .join(c, ["src", "dst"], "left_anti")
        )
        if ext.isEmpty():
            return c
        c = stable_checkpoint(c.unionByName(ext))


def transitive_reduction(graph: LinkGraph) -> DataFrame:
    """(src, dst) — the unique minimal edge set with the same
    reachability (reference ``transitive_reduction``, dag.py; DAG
    only — raises :class:`GraphContainsCycle` via the generations
    pass). An edge (u,v) is redundant iff some 2+-step path u→v
    exists, i.e. ∃w: (u,w) ∈ E, w ≠ v, w reaches v — one join of the
    edge table against the closure, then an anti-join."""
    topological_generations(graph)  # cycle check (cheap, O(depth))
    e = graph.edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    closure = transitive_closure(graph)
    via = (
        e.select("src", F.col("dst").alias("mid"))
        .join(
            closure.select(F.col("src").alias("mid"), "dst"),
            "mid",
        )
        .where(F.col("mid") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    return e.join(via, ["src", "dst"], "left_anti")


def lowest_common_ancestors(graph: LinkGraph, pairs: DataFrame) -> DataFrame:
    """(u, v, lca) for each queried pair that has a common ancestor
    (pairs without one are omitted, as the reference's
    all_pairs_lowest_common_ancestor yields nothing for them;
    dag.py:42,72 ancestors/descendants, lowest_common_ancestors.py).

    The reference returns an ARBITRARY lowest common ancestor (dict
    iteration order); this engine picks deterministically: the common
    ancestor with the maximum topological generation — any descendant
    of a common ancestor w has a strictly larger generation, so a
    max-generation common ancestor can have no common-ancestor
    descendant and is therefore lowest — with ties broken by smallest
    id. Documented divergence: always *a* valid LCA, stable across
    runs and engines.

    Physical plan: one ancestor closure (O(depth) lock-step rounds
    shared by ALL pair endpoints), one equi-join of the two closures
    on the ancestor, one per-pair top-1 window. Raises
    GraphContainsCycle on non-DAG input (via the generations pass,
    which the ranking needs anyway).
    """
    from pyspark.sql.window import Window

    gens = topological_generations(graph)
    qnodes = (
        pairs.select(F.col("u").alias("q"))
        .unionByName(pairs.select(F.col("v").alias("q")))
        .distinct()
    )
    closure = ancestor_closure(graph, qnodes)
    anc_u = closure.select(F.col("q").alias("u"), "anc")
    anc_v = closure.select(F.col("q").alias("v"), "anc")
    cand = (
        pairs.join(anc_u, "u")
        .join(anc_v, ["v", "anc"])
        .join(gens.select(F.col("id").alias("anc"), "generation"), "anc")
    )
    w = Window.partitionBy("u", "v").orderBy(
        F.col("generation").desc(), F.col("anc").asc()
    )
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("u", "v", F.col("anc").alias("lca"))
    )
