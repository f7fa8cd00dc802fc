"""Community quality metrics — modularity (and the cut/volume pieces
it is built from).

Reference: networkx/algorithms/community/quality.py:81 ``modularity``:

    Q = Σ_c [ L_c/m − γ·(deg_c / (2m))² ]

with L_c = intra-community edge count (a self-loop counts once),
deg_c = Σ degrees of c's members (a self-loop contributes 2), m =
total edge count. One labels⋈edges join and two hash aggregates — no
iteration; composes with any labeling (connected components, LPA, an
external assignment column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def modularity(
    graph: LinkGraph,
    labels: DataFrame,
    gamma: float = 1.0,
    weighted: bool = False,
) -> DataFrame:
    """One row (modularity DOUBLE). ``labels`` is (id, label) — every
    vertex must be labeled exactly once (reference raises
    NotAPartition otherwise; here unlabeled vertices simply
    contribute nothing, documented divergence for the
    web-scale case where labeling a strict superset is common).
    ``weighted=False`` is the reference's ``weight=None`` unit form;
    ``weighted=True`` uses edge weights (parallel edges pre-summed by
    ``undirected_edges``), matching ``weight="weight"``."""
    e = (
        graph.undirected_edges()
        .select(
            "src",
            "dst",
            (F.col("weight") if weighted else F.lit(1.0)).alias("wt"),
        )
        .join(
            labels.select(F.col("id").alias("src"), F.col("label").alias("ls")),
            "src",
        )
        .join(
            labels.select(F.col("id").alias("dst"), F.col("label").alias("ld")),
            "dst",
        )
    )
    m_df = e.agg(F.sum("wt").alias("m"))
    intra = (
        e.where(F.col("ls") == F.col("ld"))
        .groupBy(F.col("ls").alias("label"))
        .agg(F.sum("wt").alias("lc"))
    )
    # degree per label: each non-loop edge adds its weight to both
    # endpoints' communities; a self-loop adds 2x to its community
    deg = (
        e.select(F.col("ls").alias("label"), F.col("wt").alias("d"))
        .unionByName(e.select(F.col("ld").alias("label"), F.col("wt").alias("d")))
        .groupBy("label")
        .agg(F.sum("d").alias("degc"))
    )
    per_label = deg.join(intra, "label", "left").select(
        "label", F.coalesce("lc", F.lit(0)).alias("lc"), "degc"
    )
    return per_label.crossJoin(F.broadcast(m_df)).agg(
        F.sum(
            F.col("lc") / F.col("m")
            - F.lit(gamma)
            * (F.col("degc") / (F.lit(2.0) * F.col("m"))) ** 2
        ).alias("modularity")
    )


def partition_quality(graph: LinkGraph, labels: DataFrame) -> DataFrame:
    """One row (coverage DOUBLE, performance DOUBLE) — reference
    community/quality.py ``partition_quality``:

    * coverage = intra-community edges / total edges
    * performance = (intra edges + absent inter pairs) / C(n, 2)

    Simple-undirected semantics (the reference's performance formula
    assumes a simple graph): the canonical deduped undirected edge set
    with self-loops excluded. Never enumerates non-edges — absent
    inter pairs come from label sizes alone:
    inter_possible = C(n,2) − Σ_c C(n_c,2);
    inter_non_edges = inter_possible − (m − intra). Two label joins +
    three hash aggregates, all combiner-friendly."""
    e = (
        graph.undirected_edges()
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .join(
            labels.select(F.col("id").alias("src"), F.col("label").alias("ls")),
            "src",
        )
        .join(
            labels.select(F.col("id").alias("dst"), F.col("label").alias("ld")),
            "dst",
        )
    )
    counts = e.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.when(F.col("ls") == F.col("ld"), 1).otherwise(0)).alias("intra"),
    )
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("nc"))
    pair_sums = sizes.agg(
        F.sum("nc").alias("n"),
        F.sum(F.col("nc") * (F.col("nc") - 1) / 2).alias("intra_possible"),
    )
    return counts.crossJoin(F.broadcast(pair_sums)).select(
        (F.col("intra") / F.col("m")).alias("coverage"),
        (
            (
                F.col("intra")
                + (
                    F.col("n") * (F.col("n") - 1) / 2
                    - F.col("intra_possible")
                    - (F.col("m") - F.col("intra"))
                )
            )
            / (F.col("n") * (F.col("n") - 1) / 2)
        ).alias("performance"),
    )
