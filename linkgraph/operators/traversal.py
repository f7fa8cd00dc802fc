"""BFS as frontier-expansion DataFrame supersteps.

Reference: ``bfs_layers`` (networkx/algorithms/traversal/
breadth_first_search.py) yields lists of nodes at each depth from the
sources; ``descendants_at_distance`` (networkx/algorithms/distance_
measures.py area) is the single-layer form. The reference's queue BFS
(``_plain_bfs``, networkx/algorithms/components/connected.py:267-282)
is sequential; the distributed form expands a whole frontier per
superstep: O(diameter) joins, each a frontier-edges join + anti-join
against the visited set.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ._local import member_maps, run_local_kernel

# Size gate for the single-task MS-BFS kernel (same cost model as
# pagerank.py LOCAL_PR_MAX_EDGES): the distributed bitset plan pays
# one shuffle + persisted materialization per BFS depth. The kernel
# additionally bounds its dense bitset state (|V| x ceil(|S|/64)
# uint64 words) so a huge source sample never allocates unboundedly.
LOCAL_MSBFS_MAX_EDGES = 2_000_000


def _depths(max_depth: int | None):
    """Depth iterator: ``None`` = unbounded (a BFS frontier strictly
    shrinks the unvisited set, so the loop always drains — a finite
    default here silently truncated deep traversals, the round-4
    bounded-loop bug class); an int = the caller's explicit cutoff
    semantics (descendants_at_distance, cutoff= in path lengths)."""
    import itertools

    return itertools.count(1) if max_depth is None else range(1, max_depth + 1)
LOCAL_MSBFS_MAX_WORDS = 64_000_000


def _local_msbfs_counts(
    statics: DataFrame, edges: DataFrame, max_depth: int | None
) -> DataFrame:
    """Single-task MS-BFS: the same bitset technique as the
    distributed plan (Then et al. VLDB'15), with the (vertex, word)
    rows densified into a |V| x lanes uint64 matrix — per depth one
    ``np.bitwise_or.at`` scatter over the edge array, new bits counted
    via ``np.unpackbits``. Emits the identical (id, layer, n_src)
    rows: one layer-0 row per source, then per (vertex, depth) the
    number of sources first reaching it at that depth."""
    def kernel(ids, stat, es, ed, ew):
        import numpy as np

        nv = len(ids)
        # None = until the frontier drains; hop distance < |V| always
        depth_cap = int(max_depth) if max_depth is not None else max(nv, 1)
        si, di, ms, md = member_maps(ids, es, ed)
        keep = ms & md
        gs = si[keep].astype(np.int64)
        gd = di[keep].astype(np.int64)
        srcpos = np.nonzero(stat["is_src"] > 0)[0]
        ns = len(srcpos)
        out_id = [ids[srcpos]]
        out_layer = [np.zeros(ns, dtype=np.int32)]
        out_n = [np.ones(ns, dtype=np.int64)]
        if ns:
            lanes = (ns + 63) // 64
            state = np.zeros((nv, lanes), dtype=np.uint64)
            state[srcpos, np.arange(ns) // 64] = np.uint64(1) << (
                np.arange(ns, dtype=np.uint64) % np.uint64(64)
            )
            for depth in range(1, depth_cap + 1):
                new = np.zeros_like(state)
                np.bitwise_or.at(new, gd, state[gs])
                diff = new & ~state
                rows = np.nonzero(diff.any(axis=1))[0]
                if rows.size == 0:
                    break
                cnt = (
                    np.unpackbits(
                        np.ascontiguousarray(diff[rows]).view(np.uint8), axis=1
                    )
                    .sum(axis=1)
                    .astype(np.int64)
                )
                out_id.append(ids[rows])
                out_layer.append(np.full(rows.size, depth, dtype=np.int32))
                out_n.append(cnt)
                state |= diff
        return {
            "id": np.concatenate(out_id),
            "layer": np.concatenate(out_layer),
            "n_src": np.concatenate(out_n),
        }

    return run_local_kernel(
        edges, statics, ["is_src"], kernel, "id long, layer int, n_src long"
    )


def bfs_layers(
    graph: LinkGraph,
    sources: Iterable[int] | DataFrame,
    max_depth: int | None = None,
    directed: bool | None = None,
) -> DataFrame:
    """(id BIGINT, layer INT) — shortest hop distance from the source
    set; unreachable nodes are absent (matching the reference, which
    only yields reached nodes)."""
    spark = graph.spark
    num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if directed is None:
        directed = graph.directed
    # restrict endpoints to graph vertices: BFS yields nodes of G only
    # (edge rows may reference ids outside the vertex table, e.g.
    # links to uncrawled urls in a derived edge table)
    verts = graph.vertices.select("id")
    edges = (
        (graph.weighted_edges() if directed else graph.symmetrized_edges())
        .select("src", "dst")
        .distinct()
        .join(verts.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .repartition(num_partitions, "src")
        .persist()
    )
    edges.count()

    if isinstance(sources, DataFrame):
        frontier = sources.select("id").distinct()
    else:
        frontier = spark.createDataFrame([(int(s),) for s in sources], "id long")
    # only sources that exist in the graph (nbunch_iter membership
    # semantics, networkx/classes/graph.py:2013)
    frontier = frontier.join(graph.vertices.select("id"), "id", "left_semi").persist()

    visited = frontier.select("id", F.lit(0).alias("layer")).persist()
    visited.count()
    try:
        for depth in _depths(max_depth):
            # localCheckpoint (not bare persist): the frontier feeds the
            # next round's semi-join, so an unbroken lineage chain grows
            # one plan level per round — O(rounds) analysis cost and an
            # eventual driver OOM stringifying the plan on deep BFS over
            # graphs with window/union-shaped edge plans
            nxt = (
                edges.join(frontier.withColumnRenamed("id", "src"), "src", "left_semi")
                .select(F.col("dst").alias("id"))
                .distinct()
                .join(visited.select("id"), "id", "left_anti")
                .localCheckpoint(eager=True)
            )
            n = nxt.count()
            frontier.unpersist()
            frontier = nxt
            if n == 0:
                break
            new_visited = visited.unionByName(
                nxt.select("id", F.lit(depth).alias("layer"))
            ).localCheckpoint(eager=True)
            visited.unpersist()
            visited = new_visited
        return visited
    finally:
        edges.unpersist()
        frontier.unpersist()


def multi_source_bfs_layers(
    graph: LinkGraph,
    sources: Iterable[int] | DataFrame,
    max_depth: int | None = None,
    directed: bool | None = None,
) -> DataFrame:
    """(source BIGINT, id BIGINT, layer INT) — per-source hop
    distances with ALL sources advanced in lock-step: one
    frontier⋈edges shuffle per DEPTH, not per source (job count
    O(diameter), independent of |sources|).

    This is the batched substrate for source-sampled centrality
    (Eppstein–Wang style estimators) and Brandes sweeps — the
    reference runs one sequential BFS per source
    (networkx/algorithms/shortest_paths/unweighted.py); the
    distributed form vectorizes over sources, paying O(Σ_s reach(s))
    state keyed (source, id). The scale knob is the size of the
    source sample, not the graph.
    """
    spark = graph.spark
    num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if directed is None:
        directed = graph.directed
    verts = graph.vertices.select("id")
    edges = (
        (graph.weighted_edges() if directed else graph.symmetrized_edges())
        .select("src", "dst")
        .distinct()
        .join(verts.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .repartition(num_partitions, "src")
        .persist()
    )
    edges.count()

    if isinstance(sources, DataFrame):
        src_df = sources.select(F.col("id").alias("source")).distinct()
    else:
        src_df = spark.createDataFrame(
            [(int(s),) for s in sources], "source long"
        ).distinct()
    src_df = src_df.join(
        verts.withColumnRenamed("id", "source"), "source", "left_semi"
    )

    frontier = src_df.select("source", F.col("source").alias("id")).persist()
    visited = frontier.select("source", "id", F.lit(0).alias("layer")).persist()
    visited.count()
    try:
        for depth in _depths(max_depth):
            # localCheckpoint, not bare persist — see bfs_layers note
            nxt = (
                edges.join(frontier.withColumnRenamed("id", "src"), "src")
                .select("source", F.col("dst").alias("id"))
                .distinct()
                .join(visited.select("source", "id"), ["source", "id"], "left_anti")
                .localCheckpoint(eager=True)
            )
            n = nxt.count()
            frontier.unpersist()
            frontier = nxt
            if n == 0:
                break
            new_visited = visited.unionByName(
                nxt.select("source", "id", F.lit(depth).alias("layer"))
            ).localCheckpoint(eager=True)
            visited.unpersist()
            visited = new_visited
        return visited
    finally:
        edges.unpersist()
        frontier.unpersist()


def descendants_at_distance(graph: LinkGraph, source: int, distance: int) -> DataFrame:
    """Nodes exactly ``distance`` hops from source
    (networkx/algorithms/traversal/breadth_first_search.py
    ``descendants_at_distance``)."""
    layers = bfs_layers(graph, [source], max_depth=distance)
    return layers.where(F.col("layer") == distance).select("id")


def descendants(graph: LinkGraph, source: int) -> DataFrame:
    """(id) all nodes reachable FROM source, source excluded
    (networkx/algorithms/dag.py:42 ``descendants``)."""
    layers = bfs_layers(graph, [source])
    return layers.where(F.col("layer") > 0).select("id")


def ancestors(graph: LinkGraph, source: int) -> DataFrame:
    """(id) all nodes with a path TO source, source excluded
    (networkx/algorithms/dag.py:72 ``ancestors``) — descendants on
    the zero-cost reversed view."""
    g = graph.reverse() if graph.directed else graph
    return descendants(g, source)


def single_source_shortest_path_length(
    graph: LinkGraph, source: int, cutoff: int | None = None
) -> DataFrame:
    """(id, layer) — unweighted shortest path lengths
    (networkx/algorithms/shortest_paths/unweighted.py
    ``single_source_shortest_path_length``)."""
    return bfs_layers(graph, [source], max_depth=cutoff)


def multi_source_bfs_counts(
    graph: LinkGraph,
    sources: Iterable[int] | DataFrame,
    max_depth: int | None = None,
    directed: bool | None = None,
    local_max_edges: int = LOCAL_MSBFS_MAX_EDGES,
) -> DataFrame:
    """(id BIGINT, layer INT, n_src BIGINT) — for every vertex and
    depth ≥ 1, HOW MANY of the sampled sources are at exactly that hop
    distance (plus one layer-0 row per source vertex). Same
    information ``multi_source_bfs_layers`` carries for per-target
    estimators (harmonic / Eppstein–Wang closeness), at 1/64 the
    state: the reached-source SET per vertex is packed into 64-bit
    words (the MS-BFS bitset technique, Then et al. VLDB'15), kept as
    (id, word_idx, word) rows so every superstep is a plain
    ``bit_or`` hash aggregate — messages per depth are O(m·|S|/64)
    rows instead of O(m·|S|).

    ``sources`` is a SAMPLE (the estimator contract) — it is
    collected to the driver to assign bit positions; the graph side
    never leaves the cluster.
    """
    spark = graph.spark
    num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if directed is None:
        directed = graph.directed
    verts = graph.vertices.select("id")
    edges = (
        (graph.weighted_edges() if directed else graph.symmetrized_edges())
        .select("src", "dst")
        .distinct()
        .join(verts.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .repartition(num_partitions, "src")
        .persist()
    )
    edges.count()

    if isinstance(sources, DataFrame):
        src_ids = [r["id"] for r in sources.select("id").distinct().collect()]
    else:
        src_ids = list({int(s) for s in sources})
    present = {
        r["id"]
        for r in verts.join(
            spark.createDataFrame([(s,) for s in src_ids] or [(None,)], "id long"),
            "id",
            "left_semi",
        ).collect()
    }
    src_ids = sorted(s for s in src_ids if s in present)
    if not src_ids:
        edges.unpersist()
        return spark.createDataFrame([], "id long, layer int, n_src long")
    n_words = (len(src_ids) + 63) // 64

    # single-task numpy kernel below the size gates (edge count AND
    # dense bitset memory |V| x words)
    if local_max_edges and edges.count() <= local_max_edges:
        nv = verts.count()
        if nv * n_words <= LOCAL_MSBFS_MAX_WORDS:
            srcdf = spark.createDataFrame(
                [(s,) for s in src_ids], "id long"
            ).select("id", F.lit(1.0).alias("is_src"))
            statics = verts.join(srcdf, "id", "left").select(
                "id", F.coalesce("is_src", F.lit(0.0)).alias("is_src")
            )
            res = _local_msbfs_counts(
                statics,
                edges.select("src", "dst", F.lit(1.0).alias("weight")),
                max_depth,
            ).persist()
            res.count()
            edges.unpersist()
            return res

    # state: one row per (reached vertex, word) with the word's bits =
    # sources that have reached it; seeded with each source's own bit
    def _bit(b: int) -> int:
        # bit 63 is the sign bit of an int64
        return -(1 << 63) if b == 63 else (1 << b)

    state = spark.createDataFrame(
        [(s, i // 64, _bit(i % 64)) for i, s in enumerate(src_ids)],
        "id long, wi int, w long",
    ).repartition(num_partitions, "id").localCheckpoint(eager=True)

    out_parts = [
        state.groupBy("id").agg(
            F.sum(F.bit_count("w")).alias("n_src")
        ).select("id", F.lit(0).alias("layer"), "n_src")
    ]
    for depth in _depths(max_depth):
        msgs = (
            edges.join(state.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"), "wi")
            .agg(F.bit_or("w").alias("m"))
        )
        # one materialization per depth: state update, layer counts and
        # the termination check all read the same persisted join
        joined = msgs.join(state, ["id", "wi"], "full_outer").select(
            "id",
            "wi",
            F.coalesce("w", F.lit(0)).alias("w"),
            F.coalesce("m", F.lit(0))
            .bitwiseAND(F.bitwise_not(F.coalesce("w", F.lit(0))))
            .alias("diff"),
        ).persist()
        n_new = joined.where(F.col("diff") != 0).limit(1).count()
        if n_new == 0:
            joined.unpersist()
            break
        new_state = joined.select(
            "id", "wi", F.col("w").bitwiseOR(F.col("diff")).alias("w")
        ).where(F.col("w") != 0).repartition(num_partitions, "id").localCheckpoint(
            eager=True
        )
        layer = (
            joined.where(F.col("diff") != 0)
            .groupBy("id")
            .agg(F.sum(F.bit_count("diff")).alias("n_src"))
            .select("id", F.lit(depth).alias("layer"), "n_src")
            .localCheckpoint(eager=True)
        )
        joined.unpersist()
        state = new_state
        out_parts.append(layer)
    edges.unpersist()
    out = out_parts[0]
    for part in out_parts[1:]:
        out = out.unionByName(part)
    return out


def voronoi_cells(
    graph: LinkGraph,
    centers: Iterable[int] | DataFrame,
    max_depth: int | None = None,
) -> DataFrame:
    """(id, center, dist) — every reachable vertex assigned to its
    nearest center by hop distance (reference networkx voronoi.py
    ``voronoi_cells``, Erwig 2000; unweighted form). The reference
    breaks equidistant ties by its dijkstra's dict order — this engine
    picks the SMALLEST center id among nearest centers (deterministic,
    oracle-hashable; documented divergence). Unreachable vertices are
    absent (the reference collects them in an 'unreachable' cell —
    recoverable as an anti-join against the vertex table).

    Physical profile: identical to :func:`bfs_layers` (one semi-joined
    gather + min-aggregate per superstep, frontier localCheckpointed),
    with the center id riding the frontier as payload. All centers
    advance in lock-step, so rounds = graph eccentricity bound
    regardless of |centers|; equidistant arrivals for a vertex land in
    the same round, where groupBy-min resolves the tie."""
    spark = graph.spark
    if isinstance(centers, DataFrame):
        cdf = centers.select(F.col("id").cast("long"))
    else:
        rows = [(int(c),) for c in centers]
        if not rows:
            raise ValueError("center_nodes must not be empty")
        cdf = spark.createDataFrame(rows, "id long")
    cdf = cdf.join(graph.vertices.select("id"), "id", "left_semi")

    edges = (
        (graph.weighted_edges() if graph.directed else graph.symmetrized_edges())
        .select("src", "dst")
        .distinct()
        .join(
            graph.vertices.select(F.col("id").alias("dst")), "dst", "left_semi"
        )
        .persist()
    )
    edges.count()
    settled = cdf.select(
        "id", F.col("id").alias("center"), F.lit(0).alias("dist")
    ).localCheckpoint(eager=True)
    frontier = settled
    try:
        for depth in _depths(max_depth):
            nxt = (
                edges.join(frontier.select(F.col("id").alias("src"), "center"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("center").alias("center"))
                .join(settled.select("id"), "id", "left_anti")
                .withColumn("dist", F.lit(depth))
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            settled = settled.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt
        return settled
    finally:
        edges.unpersist()
