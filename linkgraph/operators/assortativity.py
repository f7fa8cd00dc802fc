"""Degree assortativity — degree-degree Pearson correlation.

Parity target: ``degree_assortativity_coefficient``
(networkx/algorithms/assortativity/correlation.py:15) — the Pearson
correlation of degrees at either end of an edge. The reference builds
a discrete mixing matrix; numerically that equals plain Pearson r over
the edge-endpoint degree pairs, which is how a DataFrame engine wants
it: ONE edges⋈degrees join per endpoint and a single ``corr``
aggregate (map-side partial moments, no driver math).

Semantics notes (SURVEY §2.10 extension, engine conventions):
* undirected — each edge contributes BOTH orientations (u,v) and
  (v,u), exactly the reference's ``node_degree_xy`` enumeration;
  computed over the canonical simple edge set with self-loops dropped
  (consistent with the triangles/core operators).
* directed — x = out-degree of src, y = in-degree of dst over the
  distinct directed edge set (the reference's x='out', y='in'
  default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def _edge_degree_pairs(g: LinkGraph) -> DataFrame:
    """(x DOUBLE, y DOUBLE) degree pairs, one row per ordered edge."""
    if g.directed:
        e = g.edges.select("src", "dst").distinct()
        dout = e.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("xd")
        )
        din = e.groupBy(F.col("dst").alias("id")).agg(
            F.count(F.lit(1)).alias("yd")
        )
        return (
            e.join(dout.withColumnRenamed("id", "src"), "src")
            .join(din.withColumnRenamed("id", "dst"), "dst")
            .select(
                F.col("xd").cast("double").alias("x"),
                F.col("yd").cast("double").alias("y"),
            )
        )
    canon = g.edges.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).where(F.col("src") != F.col("dst")).distinct()
    sym = canon.unionByName(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    return (
        sym.join(deg.withColumnRenamed("id", "src").withColumnRenamed("d", "xd"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("d", "yd"), "dst")
        .select(
            F.col("xd").cast("double").alias("x"),
            F.col("yd").cast("double").alias("y"),
        )
    )


def degree_assortativity_coefficient(g: LinkGraph) -> float:
    """Pearson r of edge-endpoint degrees (correlation.py:15).

    Computed from explicit co-moments rather than ``F.corr``: under
    Spark 4 ANSI mode ``corr`` raises DIVIDE_BY_ZERO on zero-variance
    input (any regular graph — cycles, cliques), where the reference
    returns nan. One aggregate row either way."""
    row = _edge_degree_pairs(g).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).first()
    n = row["n"]
    if not n:
        return float("nan")
    num = n * row["sxy"] - row["sx"] * row["sy"]
    den2 = (n * row["sxx"] - row["sx"] ** 2) * (n * row["syy"] - row["sy"] ** 2)
    if den2 <= 0:
        return float("nan")
    return float(num / den2**0.5)


def average_neighbor_degree(graph: LinkGraph) -> DataFrame:
    """(id BIGINT, avg_nbr_degree DOUBLE) — mean degree of each node's
    neighbors (networkx/algorithms/assortativity/neighbor_degree.py:12
    ``average_neighbor_degree``, source/target defaults).

    Undirected: neighbors via both orientations of the canonical
    simple edge set. Directed: the reference's defaults
    (source="out", target="out") — neighbors are successors and the
    measured degree is the successor's out-degree. One degrees
    aggregate + one join + one avg, no iteration. Nodes with no
    neighbors get 0.0 (reference emits 0). Self-loops: counted once
    in degree (the reference's undirected degree counts them twice —
    divergence documented, matching the other operators' self-loop
    handling).
    """
    if graph.directed:
        e = graph.edges.select("src", "dst").distinct()
        deg = e.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("deg")
        )
    else:
        canon = (
            graph.edges.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
            )
            .distinct()
        )
        e = canon.unionByName(
            canon.where(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        deg = e.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("deg")
        )
    # LEFT join: a neighbor with no edges of its own still counts in
    # the mean, with degree 0 (the reference averages over ALL of
    # G[n], not just neighbors that have out-edges)
    nbr_deg = (
        e.join(deg.withColumnRenamed("id", "dst"), "dst", "left")
        .groupBy(F.col("src").alias("id"))
        .agg(F.avg(F.coalesce("deg", F.lit(0))).alias("avg_nbr_degree"))
    )
    return (
        graph.vertices.select("id")
        .join(nbr_deg, "id", "left")
        .select(
            "id", F.coalesce("avg_nbr_degree", F.lit(0.0)).alias("avg_nbr_degree")
        )
    )
