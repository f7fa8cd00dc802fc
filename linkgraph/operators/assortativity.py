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


def average_degree_connectivity(graph: LinkGraph) -> DataFrame:
    """(degree BIGINT, avg_connectivity DOUBLE) — for each degree value
    k, the mean neighbor degree over all half-edges leaving degree-k
    nodes (networkx/algorithms/assortativity/connectivity.py:12
    ``average_degree_connectivity``, unweighted undirected defaults):
    result[k] = (Σ_{n:deg=k} Σ_{nbr∈G[n]} deg(nbr)) / (k · #{n:deg=k}).

    Over the canonical simple undirected edge set (self-loops dropped,
    consistent with the assortativity coefficient above). Two hash
    aggregates + one join — map-side partials throughout; isolated
    degree classes (k=0) are skipped exactly as the reference's dnorm
    guard does (0/0 → value 0 rows never materialize: degree-0 nodes
    have no half-edges).
    """
    canon = (
        graph.edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    sym = canon.unionByName(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    pairs = sym.join(
        deg.withColumnRenamed("id", "src").withColumnRenamed("deg", "src_deg"), "src"
    ).join(
        deg.withColumnRenamed("id", "dst").withColumnRenamed("deg", "nbr_deg"), "dst"
    )
    return (
        pairs.groupBy(F.col("src_deg").alias("degree"))
        .agg(
            (
                F.sum("nbr_deg").cast("double") / F.sum(F.lit(1)).cast("double")
            ).alias("avg_connectivity")
        )
    )


def attribute_assortativity_coefficient(
    graph: LinkGraph, attr: str
) -> float:
    """Categorical attribute assortativity r = (Σe_ii − Σa_i·b_i) /
    (1 − Σa_i·b_i) over the normalized attribute mixing matrix
    (networkx/algorithms/assortativity/correlation.py:120
    ``attribute_assortativity_coefficient``; mixing matrix
    ``attribute_mixing_matrix`` mixing.py:29).

    ``attr`` names a column on graph.vertices. Undirected graphs count
    each edge in both orientations (the reference symmetrizes the
    mixing matrix); directed use the edge direction. Three aggregate
    scalars from one doubly-joined edge table — no driver-side matrix:
      M       = total endpoint-pair count
      trace   = pairs with equal attributes
      Σa·b    = Σ over attr values of (row mass × column mass) / M²
    """
    va = graph.vertices.select("id", F.col(attr).alias("_attr"))
    e = graph.edges.select("src", "dst")
    if graph.directed:
        e = e.distinct()
    else:
        canon = e.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        ).distinct()
        e = canon.unionByName(
            canon.where(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
    pairs = (
        e.join(
            va.select(F.col("id").alias("src"), F.col("_attr").alias("xa")), "src"
        )
        .join(va.select(F.col("id").alias("dst"), F.col("_attr").alias("ya")), "dst")
        .select("xa", "ya")
    )
    m_trace = pairs.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.when(F.col("xa") == F.col("ya"), 1).otherwise(0)).alias("tr"),
    ).first()
    m, tr = m_trace["m"], m_trace["tr"]
    if not m:
        return float("nan")
    row_mass = pairs.groupBy(F.col("xa").alias("v")).agg(F.count(F.lit(1)).alias("a"))
    col_mass = pairs.groupBy(F.col("ya").alias("v")).agg(F.count(F.lit(1)).alias("b"))
    sab = (
        row_mass.join(col_mass, "v", "full")
        .agg(
            F.sum(
                F.coalesce("a", F.lit(0)).cast("double")
                * F.coalesce("b", F.lit(0)).cast("double")
            ).alias("s")
        )
        .first()["s"]
    ) / (float(m) * float(m))
    trace_frac = tr / float(m)
    if sab == 1.0:
        return float("nan")
    return float((trace_frac - sab) / (1.0 - sab))


def numeric_assortativity_coefficient(graph: LinkGraph, attr: str) -> float:
    """Numeric attribute assortativity
    (networkx/algorithms/assortativity/correlation.py:190
    ``numeric_assortativity_coefficient``): the Pearson correlation of
    (x(src), x(dst)) over endpoint pairs — the reference computes it
    on the value mixing matrix, which is algebraically the same
    correlation. Undirected edges count in both orientations, mirror
    of ``attribute_assortativity_coefficient``. One doubly-joined
    edge scan + a corr aggregate (JVM-side, no mixing matrix)."""
    va = graph.vertices.select("id", F.col(attr).cast("double").alias("_x"))
    e = graph.edges.select("src", "dst")
    if graph.directed:
        e = e.distinct()
    else:
        canon = e.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        ).distinct()
        e = canon.unionByName(
            canon.where(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
    row = (
        e.join(va.select(F.col("id").alias("src"), F.col("_x").alias("xv")), "src")
        .join(va.select(F.col("id").alias("dst"), F.col("_x").alias("yv")), "dst")
        .agg(F.corr("xv", "yv").alias("r"))
        .first()
    )
    return float("nan") if row["r"] is None else float(row["r"])
