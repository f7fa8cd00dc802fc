"""k-core decomposition by iterative peeling.

Reference semantics (networkx/algorithms/core.py): ``k_core(G, k)`` is
the maximal subgraph where every node has degree >= k; ``core_number``
assigns each node the largest k of a k-core containing it. The
reference peels via a sequential bucket sort (core.py ``core_number``,
O(m)); distributed peeling removes ALL sub-k nodes each round —
O(rounds) joins, rounds <= peeling depth (tiny for web graphs whose
degree distribution is heavy-tailed).

Self-loop note: the reference raises on self-loops for core_number;
here they are dropped up front (consistent with the triangles
operator's handling, networkx/algorithms/cluster.py:62).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def _simple_undirected_edges(graph: LinkGraph) -> DataFrame:
    """Canonical simple undirected edge set, self-loops removed."""
    e = graph.edges.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    )
    return e.where(F.col("src") != F.col("dst")).distinct()


def k_core(graph: LinkGraph, k: int, max_rounds: int = 200) -> LinkGraph:
    """Maximal subgraph with all degrees >= k (networkx/algorithms/core.py
    ``k_core``). Returns a LinkGraph over the surviving vertices and
    canonical undirected edges."""
    spark = graph.spark
    num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = _simple_undirected_edges(graph).repartition(num_partitions, "src").persist()
    n_edges = edges.count()

    for _ in range(max_rounds):
        if n_edges == 0:
            break
        deg = (
            edges.select(F.col("src").alias("id"))
            .unionAll(edges.select(F.col("dst").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.where(F.col("deg") >= k).select("id").persist()
        # localCheckpoint truncates lineage: each round's plan references
        # the previous round's edges ~5x (once directly, twice per
        # semi-join through keep->deg), so without truncation the
        # logical plan grows 5^rounds and planning OOMs.
        new_edges = (
            edges.join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        n_new = new_edges.count()
        edges.unpersist()
        keep.unpersist()
        edges = new_edges
        if n_new == n_edges:
            break
        n_edges = n_new

    survivors = (
        edges.select(F.col("src").alias("id"))
        .unionAll(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    vertices = graph.vertices.join(survivors, "id", "left_semi")
    return LinkGraph(
        vertices=vertices,
        edges=edges.withColumn("weight", F.lit(1.0)),
        directed=False,
    )


def core_number(graph: LinkGraph, max_k: int = 64) -> DataFrame:
    """(id, core) — the largest k such that id is in the k-core
    (networkx/algorithms/core.py ``core_number``).

    Distributed form: repeated peeling with increasing k; each node's
    core number is the last k at which it survived. O(k_max) peels —
    fine for web graphs (k_max is small); a single-pass distributed
    core-number algorithm is the documented upgrade path.
    """
    spark = graph.spark
    result = graph.vertices.select("id", F.lit(0).alias("core"))
    g = graph
    for k in range(1, max_k + 1):
        sub = k_core(g, k)
        surv = sub.vertices.select("id").persist()
        if surv.count() == 0:
            surv.unpersist()
            break
        result = (
            result.join(surv.withColumn("in_core", F.lit(k)), "id", "left")
            .select(
                "id", F.coalesce("in_core", F.col("core")).alias("core")
            )
        )
        # persist result each round to keep lineage bounded
        result = result.localCheckpoint(eager=True)
        surv.unpersist()
        g = sub
    return result
