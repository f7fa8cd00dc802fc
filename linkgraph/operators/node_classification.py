"""Semi-supervised node classification as iterative label spreading.

Reference: networkx/algorithms/node_classification.py
(``harmonic_function`` — Zhu, Ghahramani & Lafferty 2003;
``local_and_global_consistency`` — Zhou et al. 2004). The reference
iterates a dense n×c score matrix ``F = P @ F + B``; this engine keeps
F in sparse long format (id, label_id, mass) — rows exist only where
mass is nonzero, so state stays O(reached nodes × present classes)
instead of O(n × c), which is what makes the same algorithm run at
web scale.

Per iteration: one gather join of scores against the symmetrized edge
table + a groupBy(node, label) partial-aggregated sum — the pagerank
superstep shuffle profile. Labeled seeds are clamped (harmonic) or
blended (local-and-global consistency) by construction: the seed
one-hot block and the propagated block are disjoint unions (harmonic)
or a unioned sum (LGC), never a second shuffle.

Parity notes: label ids are assigned by first appearance in ascending
node-id order (the reference's node-iteration-order dict); prediction
is argmax with the reference's first-max tie-break → (mass desc,
label_id asc). Zero-degree divisors become 1 (reference
``degrees[degrees == 0] = 1``); nodes never reached by any mass
predict label_id 0, the reference's ``argmax`` of an all-zero row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..graph import LinkGraph


def _prep(graph: LinkGraph, seeds: DataFrame):
    """Shared setup: symmetrized weighted edges, clamped degrees,
    (id, lid) seed table and (lid, label) dictionary."""
    if graph.directed:
        raise ValueError(
            "node classification requires an undirected graph "
            "(reference @not_implemented_for('directed'))"
        )
    e = graph.symmetrized_edges().select(
        "src", "dst", F.coalesce("weight", F.lit(1.0)).alias("w")
    )
    deg = (
        graph.vertices.select("id")
        .join(e.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("_d")), "id", "left")
        .select(
            "id",
            F.when(F.coalesce("_d", F.lit(0.0)) == 0.0, F.lit(1.0))
            .otherwise(F.col("_d"))
            .alias("deg"),
        )
    )
    label_dict = (
        seeds.groupBy("label")
        .agg(F.min("id").alias("_first"))
        .select(
            "label",
            (F.row_number().over(Window.orderBy("_first", "label")) - 1).alias("lid"),
        )
    )
    seed_lids = seeds.join(label_dict, "label").select("id", "lid")
    return e, deg, label_dict, seed_lids


def _predict(
    graph: LinkGraph, scores: DataFrame, label_dict: DataFrame
) -> DataFrame:
    """argmax per node with the reference tie-break; unreached nodes
    get label_id 0 (argmax of the zero row)."""
    w = Window.partitionBy("id").orderBy(
        F.round("mass", 9).desc(), F.col("lid").asc()
    )
    best = (
        scores.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("id", "lid")
    )
    return (
        graph.vertices.select("id")
        .join(best, "id", "left")
        .select("id", F.coalesce("lid", F.lit(0)).alias("lid"))
        .join(label_dict, "lid")
        .select("id", "label")
    )


def harmonic_function(
    graph: LinkGraph,
    seeds: DataFrame,
    max_iter: int = 30,
    checkpoint_every: int = 4,
) -> DataFrame:
    """(id, label) for every vertex. ``seeds`` is (id, label) for the
    labeled nodes. F starts at the seed one-hot block (the reference's
    first iteration from F=0 yields exactly B) and runs the remaining
    ``max_iter - 1`` spreads; labeled rows are clamped every step."""
    if seeds.isEmpty():
        raise ValueError("No labeled seed nodes (reference NetworkXError)")
    e, deg, label_dict, seed_lids = _prep(graph, seeds)
    e = e.join(deg.withColumnRenamed("id", "src"), "src").persist()
    seed_block = seed_lids.select("id", "lid", F.lit(1.0).alias("mass")).persist()
    unlabeled_gather = e.join(seed_lids.select(F.col("id").alias("src")), "src", "left_anti")
    scores = seed_block
    for it in range(1, max_iter):
        spread = (
            unlabeled_gather.join(
                scores.select(F.col("id").alias("dst"), "lid", "mass"), "dst"
            )
            .groupBy(F.col("src").alias("id"), "lid")
            .agg(F.sum(F.col("mass") * F.col("w") / F.col("deg")).alias("mass"))
        )
        scores = seed_block.unionByName(spread)
        if it % checkpoint_every == 0:
            scores = scores.localCheckpoint(eager=False)
    return _predict(graph, scores, label_dict)


def local_and_global_consistency(
    graph: LinkGraph,
    seeds: DataFrame,
    alpha: float = 0.99,
    max_iter: int = 30,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Zhou et al. 2004: P = alpha * D^-1/2 X D^-1/2, B = (1-alpha)
    one-hot; F = P F + B iterated from F = B, no clamping."""
    if seeds.isEmpty():
        raise ValueError("No labeled seed nodes (reference NetworkXError)")
    e, deg, label_dict, seed_lids = _prep(graph, seeds)
    e = (
        e.join(deg.select(F.col("id").alias("src"), F.sqrt("deg").alias("_ds")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.sqrt("deg").alias("_dd")), "dst")
        .select("src", "dst", (F.col("w") / (F.col("_ds") * F.col("_dd"))).alias("p"))
        .persist()
    )
    seed_block = seed_lids.select(
        "id", "lid", F.lit(1.0 - alpha).alias("mass")
    ).persist()
    scores = seed_block
    for it in range(1, max_iter):
        spread = (
            e.join(scores.select(F.col("id").alias("dst"), "lid", "mass"), "dst")
            .groupBy(F.col("src").alias("id"), "lid")
            .agg((F.lit(alpha) * F.sum(F.col("mass") * F.col("p"))).alias("mass"))
        )
        scores = (
            seed_block.unionByName(spread)
            .groupBy("id", "lid")
            .agg(F.sum("mass").alias("mass"))
        )
        if it % checkpoint_every == 0:
            scores = scores.localCheckpoint(eager=False)
    return _predict(graph, scores, label_dict)
