"""VoteRank influential-spreader selection.

Reference: ``nx.voterank``
(networkx/algorithms/centrality/voterank_alg.py:9, Zhang et al. 2016).
Semantics preserved exactly:

  * score(u) = sum over edge rows (u, v) of ability(v); undirected
    graphs additionally credit ability(u) to v (i.e. score = sum of
    neighbor abilities, each parallel edge voting independently);
  * elected nodes are score-zeroed (never re-elected) and lose all
    voting ability;
  * after electing n, every out-neighbor (undirected: neighbor) loses
    1/avgDegree ability PER connecting edge row, floored at 0 — the
    batch form ``greatest(ab - cnt/avgd, 0)`` equals the reference's
    per-edge sequential floor because the decrements are equal and
    positive;
  * avgDegree = m/n directed, 2m/n undirected;
  * tie-break = smallest id (the reference's ``max`` over dict
    iteration order returns the first maximal node);
  * election stops early when the top score hits 0.

Distributed shape: the election loop is inherently sequential (that
is VoteRank — each seed's vote redistribution must precede the next
argmax), so the driver runs k rounds; each round is ONE gather
shuffle (edges ⋈ abilities, map-side partial sum), one top-1 sort
(`orderBy.limit(1)` — Spark runs this as a per-partition top-1 +
driver merge, no global sort), and one broadcast-filtered ability
update over the elected node's edge rows. State (abilities) is a
vertex-sized DF, localCheckpointed per round to keep lineage flat.
k is the user's seed budget (top-k spreaders), typically tiny
relative to the graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def voterank(graph: LinkGraph, number_of_nodes: int | None = None) -> DataFrame:
    """(seed_rank, id) — elected spreaders in election order
    (seed_rank starts at 1)."""
    n = graph.vertices.count()
    if n == 0:
        return graph.spark.createDataFrame([], "seed_rank long, id long")
    e = graph.edges.select("src", "dst")
    m = e.count()
    if graph.directed:
        votes = e  # (scored, voter) = (src, dst)
        avgd = m / n
    else:
        votes = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        avgd = 2.0 * m / n
    k = n if number_of_nodes is None or number_of_nodes > n else number_of_nodes

    ab = graph.vertices.select("id", F.lit(1.0).alias("ab")).localCheckpoint(
        eager=True
    )
    votes = votes.localCheckpoint(eager=True)
    elected: list[int] = []
    for _ in range(k):
        scores = (
            votes.join(
                ab.select(F.col("id").alias("dst"), F.col("ab").alias("abv")),
                "dst",
            )
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("abv").alias("sc"))
        )
        cand = (
            graph.vertices.select("id")
            .join(scores, "id", "left")
            .select("id", F.coalesce("sc", F.lit(0.0)).alias("sc"))
        )
        if elected:
            cand = cand.where(~F.col("id").isin(elected))
        top = cand.orderBy(F.col("sc").desc(), F.col("id")).limit(1).collect()
        if not top or top[0]["sc"] <= 0:
            break
        node = top[0]["id"]
        elected.append(node)
        # out-edge rows of the elected node; for undirected graphs the
        # symmetrized votes table yields each incident edge exactly
        # once with src == node (reference's G.edges(n))
        dec = (
            votes.where(F.col("src") == node)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        ab = (
            ab.join(dec, "id", "left")
            .select(
                "id",
                F.when(F.col("id") == node, F.lit(0.0))
                .otherwise(
                    F.greatest(
                        F.col("ab")
                        - F.coalesce("cnt", F.lit(0)) / F.lit(float(avgd)),
                        F.lit(0.0),
                    )
                )
                .alias("ab"),
            )
            .localCheckpoint(eager=True)
        )
    rows = [(i + 1, v) for i, v in enumerate(elected)]
    return graph.spark.createDataFrame(rows or [], "seed_rank long, id long")
