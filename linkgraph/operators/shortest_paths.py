"""Weighted single-source shortest paths as frontier-relaxation
supersteps (distributed Bellman–Ford).

Reference semantics — ``single_source_bellman_ford_path_length``
(networkx/algorithms/shortest_paths/weighted.py:1935-2003 via
``_bellman_ford`` :2090-2230): distances from one source along
``weight``-weighted edges; unreachable nodes absent; a negative cycle
reachable from the source raises. Dijkstra
(``single_source_dijkstra_path_length``, weighted.py:733) returns the
same mapping on non-negative weights — the distributed frontier
relaxation below is label-correcting, so it covers both entry points
with one plan.

Physical strategy: the frontier (nodes whose distance improved last
round) is joined against the edge table partitioned by src — each
superstep relaxes only out-edges of improved nodes, exactly the
reference's queue discipline (weighted.py:2178 ``if u not in
in_queue``) lifted to sets. Per superstep: one equi-join shuffle +
one groupBy(dst) min with map-side partial aggregation; the
round count is bounded by the longest shortest-path hop count
(<= |V| - 1 on negative-free graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


class NegativeCycleError(ValueError):
    """Mirror of networkx NetworkXUnbounded (weighted.py:2152)."""


def single_source_bellman_ford_path_length(
    graph: LinkGraph,
    source: int,
    weight: bool = True,
    max_rounds: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """(id BIGINT, dist DOUBLE) — weighted shortest-path length from
    ``source``; unreachable nodes absent. ``weight=False`` counts hops
    (every edge = 1). Raises :class:`NegativeCycleError` if distances
    still improve after |V| rounds."""
    spark = graph.spark
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    base = graph.weighted_edges() if graph.directed else graph.symmetrized_edges()
    if not weight:
        base = base.select("src", "dst", F.lit(1.0).alias("weight"))
    # parallel edges: only the lightest can ever win a min-relaxation
    edges = (
        base.groupBy("src", "dst")
        .agg(F.min("weight").alias("weight"))
        .join(
            graph.vertices.select(F.col("id").alias("dst")), "dst", "left_semi"
        )
        .repartition(num_partitions, "src")
        .persist()
    )
    edges.count()

    n = graph.vertices.count()
    if max_rounds is None:
        max_rounds = n
    dist = spark.createDataFrame([(int(source), 0.0)], "id long, dist double").join(
        graph.vertices.select("id"), "id", "left_semi"
    )
    dist = dist.repartition(num_partitions, "id").persist()
    dist.count()
    frontier = dist

    try:
        rounds = 0
        while True:
            cand = (
                edges.join(
                    frontier.select(F.col("id").alias("src"), "dist"), "src"
                )
                .select(
                    F.col("dst").alias("id"),
                    (F.col("dist") + F.col("weight")).alias("nd"),
                )
                .groupBy("id")
                .agg(F.min("nd").alias("nd"))
            )
            # localCheckpoint (not bare persist) — breaks the per-round
            # lineage chain through the frontier (see dag.py note)
            improved = (
                cand.join(dist, "id", "left")
                .where(F.col("dist").isNull() | (F.col("nd") < F.col("dist")))
                .select("id", F.col("nd").alias("dist"))
                .localCheckpoint(eager=True)
            )
            n_improved = improved.count()
            if frontier is not dist:
                frontier.unpersist()
            if n_improved == 0:
                improved.unpersist()
                return dist
            rounds += 1
            if rounds > max_rounds:
                raise NegativeCycleError(
                    "distances still improving after "
                    f"{max_rounds} rounds — negative cycle reachable from {source}"
                )
            new_dist = (
                dist.join(improved.select("id"), "id", "left_anti")
                .unionByName(improved)
                .repartition(num_partitions, "id")
                .localCheckpoint(eager=True)
            )
            dist.unpersist()
            dist = new_dist
            frontier = improved
    finally:
        edges.unpersist()


def single_source_dijkstra_path_length(
    graph: LinkGraph, source: int, weight: bool = True
) -> DataFrame:
    """Alias on non-negative weights (weighted.py:733) — same result
    table as the Bellman–Ford relaxation."""
    return single_source_bellman_ford_path_length(graph, source, weight=weight)


def shortest_path_tree(
    graph: LinkGraph,
    source: int,
    weight: bool = True,
    **kwargs,
) -> DataFrame:
    """(id, dist, pred) — the single-source shortest-path TREE: the
    scalable artifact behind ``nx.shortest_path`` /
    ``single_source_shortest_path`` (shortest_paths/generic.py:64,
    unweighted.py:188): every reachable node's distance plus a
    deterministic predecessor; any individual path is reconstructed by
    walking ``pred`` (path length <= diameter), while ALL n paths are
    encoded in n rows — the right shape at 100 TB, where materializing
    explicit node sequences is O(n·diameter).

    ``pred(v)`` is chosen POST-HOC from the converged distance table:
    the minimum src among tight edges (dist(src) + w == dist(v)).
    Post-hoc selection keeps the choice independent of relaxation
    arrival order (bit-deterministic, oracle-checkable) and costs one
    extra join instead of carrying predecessors through every
    superstep. The tight-edge float comparison is exact: the winning
    relaxation computed dist(v) AS dist(src) + w, so equality holds
    bitwise. With zero-weight edges the min-src rule can in principle
    pick preds forming a 0-weight cycle; on positive weights (the
    link-graph case) dist(pred) < dist(v) strictly, so the result is
    a proper tree. pred is NULL at the source.
    """
    dist = single_source_bellman_ford_path_length(
        graph, source, weight=weight, **kwargs
    )
    base = graph.weighted_edges() if graph.directed else graph.symmetrized_edges()
    if not weight:
        base = base.select("src", "dst", F.lit(1.0).alias("weight"))
    ew = base.groupBy("src", "dst").agg(F.min("weight").alias("weight"))
    tight = (
        ew.join(
            dist.select(F.col("id").alias("src"), F.col("dist").alias("ds")), "src"
        )
        .join(dist.select(F.col("id").alias("dst"), F.col("dist").alias("dd")), "dst")
        .where(F.col("ds") + F.col("weight") == F.col("dd"))
        .groupBy(F.col("dst").alias("id"))
        .agg(F.min("src").alias("pred"))
    )
    return dist.join(tight, "id", "left").select(
        "id",
        "dist",
        F.when(F.col("id") == int(source), F.lit(None).cast("long"))
        .otherwise(F.col("pred"))
        .alias("pred"),
    )
