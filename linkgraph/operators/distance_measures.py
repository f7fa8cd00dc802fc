"""Distance measures over sampled pivots — eccentricity, diameter /
radius bounds, global efficiency (networkx/algorithms/
distance_measures.py:200 ``eccentricity``, :293 ``diameter``, :388
``radius``; networkx/algorithms/efficiency_measures.py:60
``global_efficiency``).

The reference computes these with one BFS per node (exact, O(n·m)).
At web scale the standard practice is pivot sampling: run the batched
multi-source BFS from a deterministic sample S, read eccentricity
per pivot, and bound diameter/radius from the sample (diameter ≥
max ecc — a lower bound that iFUB-style refinement tightens; exact
when S = V on a connected graph). All of it is one O(diameter)-job
sweep (``multi_source_bfs_layers``) plus scalar aggregates.

Divergence from the reference: nx raises on disconnected input;
web graphs are never connected, so eccentricity here is over the
REACHABLE set of each pivot (documented, standard for link graphs).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from .traversal import multi_source_bfs_layers


def eccentricity_sampled(
    graph: LinkGraph,
    sources: Iterable[int] | DataFrame,
    directed: bool | None = None,
) -> DataFrame:
    """(source BIGINT, ecc INT, n_reached BIGINT) — max hop distance
    from each sampled pivot to its reachable set (0 for a pivot that
    reaches nothing but itself)."""
    msb = multi_source_bfs_layers(graph, sources, directed=directed)
    return msb.groupBy("source").agg(
        F.max("layer").alias("ecc"),
        F.count(F.lit(1)).alias("n_reached"),
    )


def distance_summary_sampled(
    graph: LinkGraph,
    sources: Iterable[int] | DataFrame,
    directed: bool | None = None,
) -> DataFrame:
    """One row: (diameter_lb INT, radius_ub INT, global_efficiency
    DOUBLE) — diameter lower bound = max pivot eccentricity, radius
    upper bound = min pivot eccentricity, and the sampled global
    efficiency  (1/|S|)·Σ_{s∈S} Σ_{t≠s} 1/d(s,t) / (n-1)  (exact
    nx.global_efficiency when S = V on the symmetrized graph)."""
    spark = graph.spark
    n = graph.vertices.count()
    msb = multi_source_bfs_layers(graph, sources, directed=directed).persist()
    try:
        ecc = msb.groupBy("source").agg(F.max("layer").alias("ecc"))
        bounds = ecc.agg(
            F.max("ecc").alias("diameter_lb"),
            F.min("ecc").alias("radius_ub"),
        )
        k = msb.select("source").distinct().count()
        eff = msb.where(F.col("layer") > 0).agg(
            (
                F.coalesce(F.sum(1.0 / F.col("layer")), F.lit(0.0))
                / F.lit(float(max(k, 1)) * max(n - 1, 1))
            ).alias("global_efficiency")
        )
        row = bounds.crossJoin(F.broadcast(eff)).persist()
        row.count()
        return row
    finally:
        msb.unpersist()


def wiener_index_sampled(
    graph: LinkGraph,
    sources: Iterable[int] | DataFrame,
    directed: bool | None = None,
) -> DataFrame:
    """One row (dist_sum BIGINT, wiener_est DOUBLE) — pivot-sampled
    Wiener index (reference: networkx/algorithms/wiener.py:12
    ``wiener_index``; the reference is exact-all-pairs and returns inf
    on disconnected input — at web scale the standard estimator sums
    distances from a pivot sample over each pivot's REACHABLE set,
    exact ×1 when S = V on a connected graph).

    ``dist_sum = Σ_{s∈S} Σ_t d(s,t)``;
    ``wiener_est = (n/|S|) · dist_sum / 2`` (the unordered-pair form —
    exactly nx.wiener_index when S = V and the graph is connected
    undirected). One bitset multi-source sweep, no per-pair state.
    """
    from .traversal import multi_source_bfs_counts

    n = graph.vertices.count()
    if isinstance(sources, DataFrame):
        k = sources.select("id").distinct().count()
    else:
        sources = list({int(s) for s in sources})
        k = len(sources)
    msb = multi_source_bfs_counts(graph, sources, directed=directed)
    return msb.where(F.col("layer") > 0).agg(
        F.coalesce(
            F.sum(F.col("layer").cast("long") * F.col("n_src")), F.lit(0)
        ).alias("dist_sum"),
        (
            F.coalesce(
                F.sum(F.col("layer").cast("double") * F.col("n_src")), F.lit(0.0)
            )
            * F.lit(float(n) / float(max(k, 1)) / 2.0)
        ).alias("wiener_est"),
    )


def barycenter(graph: LinkGraph) -> DataFrame:
    """(id, total_dist) — the barycenter (median) node set: vertices
    minimizing the sum of shortest-path distances to all others
    (reference networkx/algorithms/distance_measures.py
    ``barycenter``; raises ValueError on disconnected input like the
    reference's NetworkXNoPath). Exact via the bitset MS-BFS with
    S = V (state O(n²/64) words — the same contract as the exact
    eccentricity facade; sample S for the estimator at scale)."""
    from .traversal import multi_source_bfs_counts

    n = graph.num_vertices()
    counts = multi_source_bfs_counts(graph, graph.vertices.select("id"))
    per_id = (
        graph.vertices.select("id")
        .join(
            counts.groupBy("id").agg(
                F.sum(F.col("layer") * F.col("n_src")).alias("total_dist"),
                F.sum("n_src").alias("_reached"),
            ),
            "id",
            "left",
        )
        .select(
            "id",
            F.coalesce("total_dist", F.lit(0)).alias("total_dist"),
            F.coalesce("_reached", F.lit(0)).alias("_reached"),
        )
        .persist()
    )
    bad = per_id.where(F.col("_reached") < n).limit(1).count()
    if bad:
        per_id.unpersist()
        raise ValueError("barycenter: graph is disconnected (NetworkXNoPath parity)")
    mn = per_id.agg(F.min("total_dist").alias("_mn"))
    out = (
        per_id.crossJoin(F.broadcast(mn))
        .where(F.col("total_dist") == F.col("_mn"))
        .select("id", "total_dist")
        .localCheckpoint(eager=True)  # survives the per_id unpersist
    )
    per_id.unpersist()
    return out
