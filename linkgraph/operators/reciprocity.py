"""Reciprocity of a directed graph.

Reference semantics — networkx/algorithms/reciprocity.py:

* ``overall_reciprocity`` (:121-140): the ratio of reciprocated
  directed edges to all directed edges, computed in the reference as
  ``(n_all - n_undirected) * 2 / n_all``. Algebraically that counts
  every non-self-loop edge (u, v) whose reverse (v, u) is also
  present; a self-loop is NOT counted as reciprocated (it collapses
  to one undirected edge, contributing zero overlap). Raises on an
  empty edge set.
* ``reciprocity`` (:13-77) per node: with P = predecessor set and
  S = successor set, r(v) = 2|P ∩ S| / (|P| + |S|). A self-loop puts
  v in both sets, so here it DOES count. Isolated nodes are undefined
  (the reference raises mid-iteration).

Both are single-scan + one self-join programs: distinct edges,
semi-joined against their own reverse — no iteration, fully
Catalyst-optimizable, shuffle keyed on (src, dst) / id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def _distinct_edges(graph: LinkGraph) -> DataFrame:
    """Simple-graph view: parallel rows collapse (the reference's
    DiGraph cannot hold parallel edges at all)."""
    return graph.edges.select("src", "dst").distinct()


def overall_reciprocity(graph: LinkGraph) -> float:
    """Scalar reciprocity of the whole graph (reciprocity.py:121)."""
    e = _distinct_edges(graph)
    counts = (
        e.agg(
            F.count(F.lit(1)).alias("n_all"),
            F.sum(F.when(F.col("src") != F.col("dst"), 1).otherwise(0)).alias(
                "n_nonself"
            ),
        )
    ).first()
    if counts["n_all"] == 0:
        raise ValueError("Not defined for empty graphs")
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    n_recip = (
        e.where(F.col("src") != F.col("dst"))
        .join(rev, ["src", "dst"], "left_semi")
        .count()
    )
    return float(n_recip) / float(counts["n_all"])


def reciprocity(graph: LinkGraph, nodes: DataFrame | None = None) -> DataFrame:
    """(id BIGINT, reciprocity DOUBLE) per node — 2|P∩S| / (|P|+|S|)
    (reciprocity.py:46-66). Nodes with no in- or out-edges are absent
    from the result (the reference raises for them; a distributed
    operator returns the defined subset instead). ``nodes`` optionally
    restricts output via a semi-join."""
    e = _distinct_edges(graph)
    succ = e.select(F.col("src").alias("id"), F.col("dst").alias("nbr"))
    pred = e.select(F.col("dst").alias("id"), F.col("src").alias("nbr"))
    n_succ = succ.groupBy("id").agg(F.count(F.lit(1)).alias("ns"))
    n_pred = pred.groupBy("id").agg(F.count(F.lit(1)).alias("np"))
    overlap = (
        succ.join(pred, ["id", "nbr"], "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("no"))
    )
    out = (
        n_succ.join(n_pred, "id", "full_outer")
        .join(overlap, "id", "left")
        .select(
            "id",
            (
                2.0
                * F.coalesce("no", F.lit(0))
                / (F.coalesce("ns", F.lit(0)) + F.coalesce("np", F.lit(0)))
            ).alias("reciprocity"),
        )
    )
    if nodes is not None:
        out = out.join(nodes.select("id"), "id", "left_semi")
    return out
