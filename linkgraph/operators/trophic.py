"""Trophic levels / differences / incoherence — directed food-web
analysis as the engine's fifth power-iteration instance.

Reference: networkx/algorithms/centrality/trophic.py
(``trophic_levels``:12, ``trophic_differences``:72,
``trophic_incoherence_parameter``:103). The reference solves
s = (I − P)⁻¹·1 + 1 with a dense matrix inverse over the non-basal
subsystem, where row u of P is in-edge weights of u divided by u's
TOTAL weighted in-strength, with columns belonging to basal nodes
(unweighted in-degree 0) dropped AFTER normalization — i.e. basal
prey contribute to the denominator but not to the spread. Basal
nodes themselves have level 1.

Spark-first shape: the inverse is replaced by the Jacobi fixpoint
s ← 1 + P·s over the non-basal nodes — one gather join + map-side
partial-agg groupBy per superstep, the pagerank shuffle profile. On a
DAG it reaches the exact solution in depth(G) supersteps; on cyclic
graphs it converges iff spectral_radius(P) < 1 and raises after
``max_iter`` otherwise (mirroring the reference's LinAlgError on a
singular I − P).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def trophic_levels(
    graph: LinkGraph,
    max_iter: int = 100,
    tol: float = 1e-12,
    checkpoint_every: int = 8,
) -> DataFrame:
    """(id, level) for every vertex; basal nodes (in-degree 0) get
    exactly 1.0. Raises ValueError on undirected input (reference
    @not_implemented_for('undirected')) and RuntimeError when the
    fixpoint has not converged after ``max_iter`` supersteps (the
    reference's singular-matrix case)."""
    if not graph.directed:
        raise ValueError(
            "trophic_levels is not defined for undirected graphs "
            "(reference @not_implemented_for('undirected'))"
        )
    # parallel edges sum (reference adjacency_matrix coalescing)
    e = (
        graph.weighted_edges()
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("w"))
    )
    instr = e.groupBy(F.col("dst").alias("id")).agg(
        F.sum("w").alias("_rs"), F.count(F.lit(1)).alias("_din")
    )
    basal = graph.vertices.select("id").join(instr, "id", "left_anti")
    nonbasal = instr.select("id").persist()
    # P rows: normalize by FULL in-strength, then drop basal columns
    p = (
        e.join(instr.select(F.col("id").alias("dst"), "_rs"), "dst")
        .join(nonbasal.select(F.col("id").alias("src")), "src", "left_semi")
        .select(
            F.col("dst").alias("id"),
            F.col("src").alias("_prey"),
            (F.col("w") / F.col("_rs")).alias("_p"),
        )
        .persist()
    )
    s = nonbasal.select("id", F.lit(1.0).alias("level")).localCheckpoint()
    for it in range(1, max_iter + 1):
        gathered = (
            p.join(
                s.select(F.col("id").alias("_prey"), F.col("level").alias("_sl")),
                "_prey",
            )
            .groupBy("id")
            .agg(F.sum(F.col("_p") * F.col("_sl")).alias("_g"))
        )
        new = nonbasal.join(gathered, "id", "left").select(
            "id", (F.lit(1.0) + F.coalesce("_g", F.lit(0.0))).alias("level")
        )
        if it % checkpoint_every == 0:
            new = new.localCheckpoint()
        delta = (
            new.join(s.select("id", F.col("level").alias("_o")), "id")
            .agg(F.max(F.abs(F.col("level") - F.col("_o"))))
            .first()[0]
        )
        s = new
        if delta is None or delta < tol:
            break
    else:
        raise RuntimeError(
            f"trophic_levels did not converge in {max_iter} supersteps "
            "(I - P is singular or near-singular; reference raises "
            "LinAlgError here)"
        )
    # reference: y = (I − P)⁻¹·1 + 1 — the fixpoint t = 1 + P·t above
    # is (I − P)⁻¹·1, so non-basal levels are t + 1
    return basal.select("id", F.lit(1.0).alias("level")).unionByName(
        s.select("id", (F.col("level") + F.lit(1.0)).alias("level"))
    )


def trophic_differences(graph: LinkGraph, **kwargs) -> DataFrame:
    """(src, dst, diff) per edge with diff = level(dst) − level(src)
    (reference trophic.py:72)."""
    lv = trophic_levels(graph, **kwargs)
    return (
        graph.edges.select("src", "dst")
        .join(lv.select(F.col("id").alias("src"), F.col("level").alias("_ls")), "src")
        .join(lv.select(F.col("id").alias("dst"), F.col("level").alias("_ld")), "dst")
        .select("src", "dst", (F.col("_ld") - F.col("_ls")).alias("diff"))
    )


def trophic_incoherence_parameter(graph: LinkGraph, **kwargs) -> float:
    """Population std-dev of the edge trophic differences
    (reference trophic.py:103, np.std with ddof=0). Driver-side
    one-row scalar."""
    row = (
        trophic_differences(graph, **kwargs)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("diff").alias("m"),
            F.avg(F.col("diff") * F.col("diff")).alias("m2"),
        )
        .first()
    )
    if row["n"] == 0:
        raise ValueError("trophic_incoherence_parameter of an edgeless graph")
    var = row["m2"] - row["m"] * row["m"]
    return float(max(var, 0.0) ** 0.5)
