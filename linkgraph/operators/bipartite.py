"""Bipartite projections.

Reference semantics — networkx/algorithms/bipartite/projection.py:

* ``projected_graph`` (:12-100): given a bipartite graph and one node
  set U, connect u1, u2 in U iff they share a neighbor on the other
  side.
* ``weighted_projected_graph`` (:120-200): edge weight = number of
  shared neighbors (``ratio=False``); ``ratio=True`` divides by the
  size of the opposite node set.

Physical plan: the projection is ONE self-equi-join of the membership
table on the opposite-side key (u1 < u2 to emit each pair once) plus a
groupBy count — the same wedge shape as common_neighbors. Skew lives
in popular opposite-side keys (a hub document shared by many); AQE
skew-join splitting covers it, and the canonical mitigation at 100 TB
(drop opposite-side keys with degree above a cap before the join) is a
single pre-filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def weighted_projected_graph(
    membership: DataFrame,
    u_col: str,
    v_col: str,
    ratio: bool = False,
) -> DataFrame:
    """Project a bipartite membership table (u side = ``u_col``,
    opposite side = ``v_col``) onto the u side:
    (u1 BIGINT, u2 BIGINT, weight DOUBLE) with u1 < u2.

    ``ratio=True`` scales by 1/|distinct v| (projection.py:185).
    """
    m = membership.select(
        F.col(u_col).alias("u"), F.col(v_col).alias("v")
    ).distinct()
    a = m.select(F.col("u").alias("u1"), "v")
    b = m.select(F.col("u").alias("u2"), "v")
    pairs = (
        a.join(b, "v")
        .where(F.col("u1") < F.col("u2"))
        .groupBy("u1", "u2")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )
    if ratio:
        nv = m.select("v").distinct().count()
        pairs = pairs.withColumn("weight", F.col("weight") / F.lit(float(nv)))
    return pairs


def projected_graph(membership: DataFrame, u_col: str, v_col: str) -> DataFrame:
    """Unweighted projection (projection.py:12): (u1, u2), u1 < u2."""
    return weighted_projected_graph(membership, u_col, v_col).select("u1", "u2")
