"""Connected components as an iterative DataFrame program.

Reference semantics (networkx/algorithms/components/connected.py):

* undirected only — ``@not_implemented_for("directed")`` at
  connected.py:16; web graphs are directed, so the engine computes
  components of the **symmetrized** edge set, which equals the
  reference's undirected semantics (== weakly connected components,
  networkx/algorithms/components/weakly_connected.py:15).
* a single isolated node is its own component (connected.py:30),
* null graph → ``is_connected`` raises (connected.py:204-207).

Physical strategy (Spark-first): the reference runs one BFS per
unseen node (connected.py:84-90, ``_plain_bfs`` 267-282) — inherently
sequential.  Here every vertex carries a candidate component label
(init: its own id) and each superstep does

    1. neighbor-min gather:  comp'[v] = min(comp[v], min comp[u] for
       u ~ v)            — one join + partial-agg groupBy, and
    2. pointer jumping:      comp''[v] = comp'[comp'[v]]
       (valid because comp is monotone-decreasing and always names a
       vertex in the same component),

so label distance covered doubles per superstep → O(log diameter)
iterations instead of O(diameter).  Termination: zero labels changed
(the distributed analog of BFS's "all seen" early exit,
connected.py:280-281).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.loop import SuperstepLoop


# Below this many edge rows the whole problem fits one Arrow batch on
# one executor core, where a vectorized numpy hash-to-min converges in
# milliseconds — the per-superstep distributed loop would pay multiple
# shuffle stages per iteration for data that is sub-task-sized. This is
# an adaptive PHYSICAL strategy (same spirit as Catalyst's broadcast-
# vs-shuffle join choice): identical output, size-based plan selection.
# The superstep loop below remains the at-scale path.
LOCAL_CC_MAX_EDGES = 4_000_000


def _local_components(graph: LinkGraph, ep: DataFrame) -> DataFrame:
    """Single-task vectorized CC: edges stream into one ``mapInPandas``
    task (Arrow batches, never the driver), labels converge by
    min-propagation + pointer jumping in numpy; isolated vertices
    rejoin as their own singleton component. ``ep`` is the (already
    materialized) (src, dst) projection."""
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
        ids, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
        m = len(src)
        s, d = inv[:m], inv[m:]
        lab = np.arange(len(ids))
        while True:
            old = lab
            lab = lab.copy()
            np.minimum.at(lab, d, lab[s])
            np.minimum.at(lab, s, lab[d])
            while True:
                nl = lab[lab]
                if np.array_equal(nl, lab):
                    break
                lab = nl
            if np.array_equal(lab, old):
                break
        # ids is ascending, so min internal index == min original id:
        # component representative matches the distributed path exactly
        yield pd.DataFrame({"id": ids, "component": ids[lab]})

    labels = ep.mapInPandas(fn, "id long, component long")
    return graph.vertices.select("id").join(labels, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )


def connected_components(
    graph: LinkGraph,
    max_iter: int = 64,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    lineage: bool = False,
    local_max_edges: int = LOCAL_CC_MAX_EDGES,
    labels_start: DataFrame | None = None,
    stats_out: dict | None = None,
    _level: int = 0,
) -> DataFrame:
    """Returns labels(id BIGINT, component BIGINT) — component is the
    minimum vertex id in the component (deterministic representative).

    Convergence strategy: up to ``max_iter`` neighbor-min + jump
    supersteps over the static salted adjacency (one O(n) label
    shuffle per round — the cheap path, and the only phase web-scale
    low-diameter graphs ever run), then star CONTRACTION on the
    partial labeling and recursion (``_level`` internal) for
    high-diameter graphs, where plain propagation is O(diameter) and
    previously returned a silently-wrong labeling on exhaustion.

    ``labels_start`` (id, component) warm-starts the superstep loop —
    the incremental-serving hook (streaming/incremental.py): each
    given label MUST name a vertex in the same component (true under
    edge APPENDS when labels come from a previous fixpoint; deletions
    void the contract). Every vertex's own id stays a candidate
    (init = least(id, warm)), so the fixpoint is the identical min-id
    labeling a cold run reaches — warm starts change superstep count,
    never the result. ``stats_out`` (optional dict) gets
    ``supersteps``.
    """
    spark = graph.spark
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # local path never engages when the caller asked for checkpointed /
    # resumable execution — that contract belongs to the superstep
    # loop (and a warm start is pointless inside one Arrow task). The
    # (src, dst) projection is persisted before counting so a derived
    # edge plan is computed once, whichever path runs.
    if local_max_edges and checkpoint_dir is None and labels_start is None:
        ep = graph.edges.select(
            F.col("src").cast("long"), F.col("dst").cast("long")
        ).persist()
        if ep.count() <= local_max_edges:
            return _local_components(graph, ep)
        ep.unpersist()

    # Static structure: the same salted CSR-block adjacency pagerank
    # gathers over (build_adjacency) — built ONCE from the symmetrized
    # edge set and persisted. Each superstep then shuffles only the
    # LABEL table (n rows) to the adjacency partitioning; the edges
    # never move again. The previous formulation joined the raw edge
    # table on src every superstep — an O(m) shuffle per iteration
    # that dominated at 40M+ edges. Self-loops are no-ops for CC and
    # parallel-edge duplicates cannot change a min, so the arrays skip
    # the (src,dst) coalescing shuffle entirely.
    sym = graph.symmetrized_edges().select(
        "src", "dst", F.lit(1.0).alias("weight")
    ).where(F.col("src") != F.col("dst"))
    from ..graph import build_adjacency

    adj = build_adjacency(
        sym,
        num_partitions=num_partitions,
        coalesce_parallel=False,
        normalize=False,
    ).persist()
    adj.count()

    if labels_start is None:
        labels = graph.vertices.select("id", F.col("id").alias("component"))
    else:
        labels = (
            graph.vertices.select("id")
            .join(
                labels_start.select("id", F.col("component").alias("warm")),
                "id",
                "left",
            )
            .select(
                "id",
                F.least(
                    F.col("id"), F.coalesce("warm", F.col("id"))
                ).alias("component"),
            )
        )
    loop = SuperstepLoop(
        spark,
        # each contraction level gets its own ledger name so the
        # levels' checkpoints never collide under one checkpoint_dir
        "connected_components" if _level == 0 else f"connected_components_l{_level}",
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        lineage=lineage,
    )
    labels = loop.start(labels.repartition(num_partitions, "id"))

    # Termination metric: labels are monotone non-increasing, so the
    # global sum strictly decreases until the fixpoint — comparing one
    # scalar per superstep replaces the old full prev⋈new changed-count
    # join (an extra O(n) shuffle + action per iteration). Decimal
    # accumulator: Σ id can overflow BIGINT under ANSI at web scale.
    def label_sum(prev: DataFrame, new: DataFrame) -> dict:
        s = new.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).first()["s"]
        return {"label_sum": str(s)}

    prev_sum = None
    try:
        for _it in range(max_iter):
            nbr_min = (
                adj.join(labels.withColumnRenamed("id", "src"), "src")
                .select(
                    F.explode(F.col("pairs")).alias("z"), F.col("component")
                )
                .select(F.col("z.dsts").alias("id"), F.col("component").alias("c"))
                .groupBy("id")
                .agg(F.min("c").alias("nbr_comp"))
            )
            stepped = (
                labels.join(nbr_min, "id", "left")
                .select(
                    "id",
                    F.least(
                        "component", F.coalesce("nbr_comp", F.col("component"))
                    ).alias("component"),
                )
            )
            # pointer jumping: component <- component(component) —
            # compresses shallow label chains; the representative side
            # is n rows (not m) and AQE's skew split absorbs the giant
            # component's hot key
            jumped = (
                stepped.alias("a")
                .join(
                    stepped.select(
                        F.col("id").alias("component"),
                        F.col("component").alias("jump"),
                    ).alias("b"),
                    "component",
                    "left",
                )
                .select(
                    F.col("a.id").alias("id"),
                    F.least(
                        F.col("component"), F.coalesce("jump", F.col("component"))
                    ).alias("component"),
                )
            )
            labels, m = loop.advance(jumped, metrics_fn=label_sum)
            if stats_out is not None:
                stats_out["supersteps"] = _it + 1
            if m["label_sum"] == prev_sum:
                return labels
            prev_sum = m["label_sum"]
        # Phase budget exhausted without a fixpoint: CONTRACT and
        # recurse (the star-contraction move of Kiveris et al. 2014 /
        # Shiloach–Vishkin, expressed as a quotient graph). Min-label
        # propagation advances a basin boundary ~1 step per round —
        # O(diameter) on high-diameter graphs (observed: a 600-node
        # id-permuted path still had 3 components after 64 rounds, a
        # wrong labeling the round-4 incremental-CC oracle caught when
        # it was silently returned). The partial labeling is always
        # VALID (each label names a member of the same component), so
        # the quotient graph on current labels has the same component
        # structure; its radius shrinks ~max_iter× per level, so a few
        # levels cover any diameter — and the contracted graph usually
        # falls under the LOCAL gate and finishes exactly in one task.
        # Each level = one O(m') edge-projection shuffle, m' falling
        # fast; the per-component min id survives contraction (the min
        # vertex always keeps its own label), so the composed result
        # is the identical min-id labeling a converged flat run
        # reaches.
        if _level >= 8:
            raise RuntimeError(
                "connected_components did not converge within "
                f"{max_iter} supersteps x {_level} contraction levels"
            )
        lbl = labels
        cedges = (
            sym.join(
                lbl.select(F.col("id").alias("src"), F.col("component").alias("cu")),
                "src",
            )
            .join(
                lbl.select(F.col("id").alias("dst"), F.col("component").alias("cv")),
                "dst",
            )
            .select(F.col("cu").alias("src"), F.col("cv").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .withColumn("weight", F.lit(1.0))
        )
        cverts = lbl.select(F.col("component").alias("id")).distinct()
        from ..graph import LinkGraph as _LG

        substats: dict = {}
        subcc = connected_components(
            _LG(vertices=cverts, edges=cedges, directed=False),
            max_iter=max_iter,
            num_partitions=num_partitions,
            # forward the durability contract: contraction levels write
            # their own ledgers (level-suffixed loop name) under the
            # same checkpoint_dir, so executor loss during a level
            # resumes that level's phase instead of restarting cold
            checkpoint_dir=checkpoint_dir,
            checkpoint_every=checkpoint_every,
            lineage=lineage,
            local_max_edges=local_max_edges,
            stats_out=substats,
            _level=_level + 1,
        )
        if stats_out is not None:
            stats_out["supersteps"] = stats_out.get("supersteps", 0) + substats.get(
                "supersteps", 0
            )
            stats_out["contraction_levels"] = (
                substats.get("contraction_levels", 0) + 1
            )
        return (
            lbl.join(
                subcc.select(
                    F.col("id").alias("component"), F.col("component").alias("root")
                ),
                "component",
            )
            .select("id", F.col("root").alias("component"))
        )
    finally:
        adj.unpersist()


def weakly_connected_components(graph: LinkGraph, **kwargs) -> DataFrame:
    """Weakly connected components of a directed graph
    (networkx/algorithms/components/weakly_connected.py:15): identical
    to components of the symmetrized edge set, which is exactly what
    :func:`connected_components` computes (it always symmetrizes)."""
    return connected_components(graph, **kwargs)


def number_connected_components(graph: LinkGraph, **kwargs) -> int:
    """Component count (networkx/algorithms/components/connected.py:103)."""
    return (
        connected_components(graph, **kwargs)
        .agg(F.countDistinct("component"))
        .first()[0]
    )


def is_connected(graph: LinkGraph, **kwargs) -> bool:
    """Raises ValueError on the null graph — parity with
    NetworkXPointlessConcept (connected.py:204-207)."""
    if graph.num_vertices() == 0:
        raise ValueError(
            "Connectivity is undefined for the null graph "
            "(NetworkXPointlessConcept parity)"
        )
    return number_connected_components(graph, **kwargs) == 1


def node_connected_component(graph: LinkGraph, node_id: int, **kwargs) -> DataFrame:
    """Vertices of the component containing ``node_id``
    (connected.py:226)."""
    labels = connected_components(graph, **kwargs)
    target = labels.where(F.col("id") == node_id).select(
        F.col("component").alias("c")
    )
    return labels.join(
        F.broadcast(target), labels.component == F.col("c"), "left_semi"
    ).select("id")
