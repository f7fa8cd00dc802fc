"""SNAP graph summarization as synchronous partition refinement.

Reference: networkx/algorithms/summarization.py ``snap_aggregation``
(Tian, Hankins & Patel, SIGMOD'08): group nodes by attribute values,
then split groups until every group's members have edges of the same
types to the same set of groups — the unique maximal AR-compatible
grouping.

The reference splits ONE eligible group per step (a driver-sequential
loop). The maximal AR-compatible partition is the coarsest stable
refinement of the attribute partition, which synchronous refinement
reaches too: each superstep recomputes every node's signature — the
SET of (neighbor-group, edge-type) pairs — at once, exactly the
Paige–Tarjan-style relational-coarsest-partition iteration. Same
fixpoint, O(#refinement-depth) supersteps instead of O(#groups)
sequential splits. Group identity differs from the reference's
insertion-order ids (groups here are canonicalized to their minimum
member id); the PARTITION is identical, which is what tests compare.

Shape per superstep: one gather join + groupBy(node) with a
sorted-distinct-concat aggregate — the WL-hashing shuffle profile
(graph_hashing.py), with md5 labels for DuckDB-oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def snap_groups(
    graph: LinkGraph,
    node_attrs: DataFrame,
    edge_types: DataFrame | None = None,
    rounds: int | None = None,
    max_rounds: int = 64,
) -> DataFrame:
    """(id, group BIGINT) — the maximal AR-compatible grouping;
    ``group`` is the minimum member id. ``node_attrs`` is (id,
    attr STRING); ``edge_types`` optionally (src, dst, etype STRING)
    (absent edges get type '', matching the reference's
    ``edge_attributes=()`` single-type default).

    ``rounds=None`` iterates to the fixpoint (#groups stops growing);
    a fixed ``rounds`` runs exactly that many refinement supersteps
    (the oracle-unrollable form — refinement is monotone, so extra
    rounds past the fixpoint never change the partition)."""
    if graph.directed:
        e = graph.edges.select("src", "dst")
    else:
        e = graph.symmetrized_edges().select("src", "dst")
    e = e.distinct()
    if edge_types is not None:
        et = edge_types.select("src", "dst", F.col("etype").cast("string"))
        if not graph.directed:
            et = et.unionByName(
                et.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst"), "etype"
                )
            ).distinct()
        e = e.join(et, ["src", "dst"], "left").select(
            "src", "dst", F.coalesce("etype", F.lit("")).alias("etype")
        )
    else:
        e = e.withColumn("etype", F.lit(""))
    e = e.localCheckpoint(eager=True)

    labels = (
        graph.vertices.select("id")
        .join(node_attrs.select("id", F.col("attr").cast("string")), "id", "left")
        .select("id", F.md5(F.coalesce("attr", F.lit(""))).alias("label"))
        .localCheckpoint(eager=True)
    )
    prev_n = labels.select("label").distinct().count()
    r = 0
    while True:
        if rounds is not None and r >= rounds:
            break
        sig = (
            e.join(
                labels.select(F.col("id").alias("dst"), F.col("label").alias("_nl")),
                "dst",
            )
            .select(
                F.col("src").alias("id"),
                F.concat_ws(":", "_nl", "etype").alias("_pair"),
            )
            .groupBy("id")
            .agg(
                F.array_join(
                    F.array_sort(F.array_distinct(F.collect_list("_pair"))), "|"
                ).alias("_sig")
            )
        )
        labels = (
            labels.join(sig, "id", "left")
            .select(
                "id",
                F.md5(
                    F.concat(F.col("label"), F.lit("|"), F.coalesce("_sig", F.lit("")))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        r += 1
        if rounds is None:
            n = labels.select("label").distinct().count()
            if n == prev_n:
                break
            prev_n = n
            if r >= max_rounds:
                raise RuntimeError(
                    f"snap refinement still splitting after {max_rounds} rounds"
                )
    canon = labels.groupBy("label").agg(F.min("id").alias("group"))
    return labels.join(canon, "label").select("id", "group")
