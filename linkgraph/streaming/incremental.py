"""Incremental PageRank over a page stream — foreachBatch + warm start.

Not a reference feature (networkx has no streaming surface) — the
composition the north rule's deployment implies: pages arrive
continuously, the link graph grows, and per-url ranks must stay fresh
without recomputing from a cold uniform vector each time.

Design (all existing engine pieces, no new algorithm):

* each micro-batch of pages is appended to a parquet page store
  (exactly-once via the stream checkpoint when driven by
  ``ingest.write_edge_stream``-style sinks, or by the foreachBatch
  epoch id here);
* the full accumulated page set rebuilds the graph
  (``graph_from_pages`` — the dense-id dictionary is recomputed, so
  ids are NOT stable across batches);
* PageRank runs warm-started from the previous serving table via
  ``nstart`` — keyed by URL, not id, exactly because ids remap as the
  vertex set grows; new urls enter with mass 0 and the vector is
  re-normalized by ``_vector_df`` (pagerank_alg.py:139 semantics);
* converged ranks overwrite the serving table as (url, rank).

Warm-starting matters at scale: after an incremental crawl the prior
fixpoint is close to the new one, so supersteps-to-tol drop (asserted
in tests/test_incremental.py) while the result is the SAME fixpoint a
cold run reaches (power iteration converges from any start vector).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import graph_from_pages
from ..operators.pagerank import pagerank


def refresh_ranks(
    spark: SparkSession,
    pages_path: str,
    ranks_path: str,
    alpha: float = 0.85,
    tol: float = 1.0e-6,
    stats_out: dict | None = None,
    **pagerank_kwargs,
) -> DataFrame:
    """One serving refresh: read ALL pages under ``pages_path``, build
    the graph, warm-start from ``ranks_path`` if it exists, write the
    new (url, rank) serving table atomically (write-new + rename is
    the caller's concern on object stores; local parquet overwrite
    here). Returns the serving DataFrame."""
    pages = spark.read.parquet(pages_path)
    g = graph_from_pages(pages)
    nstart = None
    if os.path.isdir(ranks_path):
        prev = spark.read.parquet(ranks_path)
        seeded = g.vertices.join(prev, "url", "inner").select("id", "rank")
        # only warm-start when the previous table overlaps the new
        # vertex set (a zero-sum vector would raise, pagerank_alg:148)
        if seeded.limit(1).count() > 0:
            nstart = seeded
    ranks = pagerank(
        g, alpha=alpha, tol=tol, nstart=nstart, stats_out=stats_out,
        **pagerank_kwargs,
    )
    serving = g.vertices.join(ranks, "id").select("url", "rank")
    serving.write.mode("overwrite").parquet(ranks_path + "._tmp")
    out = spark.read.parquet(ranks_path + "._tmp")
    out.write.mode("overwrite").parquet(ranks_path)
    return spark.read.parquet(ranks_path)


def incremental_pagerank_sink(
    spark: SparkSession,
    pages_path: str,
    ranks_path: str,
    alpha: float = 0.85,
    tol: float = 1.0e-6,
    **pagerank_kwargs,
):
    """foreachBatch callback for a page stream: append the batch to
    the page store, then refresh the serving ranks warm-started from
    the previous epoch. Usage::

        q = (read_page_stream(spark, drop_dir)
             .writeStream
             .foreachBatch(incremental_pagerank_sink(spark, store, ranks))
             .option("checkpointLocation", ckpt)
             .start())
    """

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("append").parquet(pages_path)
        refresh_ranks(
            spark, pages_path, ranks_path, alpha=alpha, tol=tol,
            **pagerank_kwargs,
        )

    return _sink


def refresh_components(
    spark: SparkSession,
    pages_path: str,
    labels_path: str,
    stats_out: dict | None = None,
    **cc_kwargs,
) -> DataFrame:
    """Incremental CONNECTED-COMPONENTS serving (the CC analog of
    :func:`refresh_ranks`): read ALL pages, build the graph, warm-start
    the label superstep loop from the previous serving table, write the
    new serving table as (url, component_url).

    URL keying is load-bearing twice: member urls AND the component
    representative are stored as urls because dense ids remap as the
    vertex set grows — on refresh both sides re-resolve through the new
    id dictionary. Under page APPENDS previously-connected vertices
    stay connected, so each warm label still names a vertex of the same
    component — exactly the ``labels_start`` contract of
    ``connected_components``; the warm fixpoint is bit-identical to a
    cold run (own-id stays a candidate), only the superstep count
    drops (asserted in tests/test_incremental.py)."""
    pages = spark.read.parquet(pages_path)
    g = graph_from_pages(pages)
    labels_start = None
    if os.path.isdir(labels_path):
        prev = spark.read.parquet(labels_path)
        ids = g.vertices.select("url", "id")
        seeded = (
            prev.join(ids, "url", "inner")
            .join(
                ids.select(
                    F.col("url").alias("component_url"),
                    F.col("id").alias("component"),
                ),
                "component_url",
                "inner",
            )
            .select("id", "component")
        )
        if seeded.limit(1).count() > 0:
            labels_start = seeded

    from ..operators.components import connected_components

    labels = connected_components(
        g, labels_start=labels_start, stats_out=stats_out, **cc_kwargs
    )
    serving = (
        labels.join(g.vertices.select("url", "id"), "id")
        .join(
            g.vertices.select(
                F.col("id").alias("component"),
                F.col("url").alias("component_url"),
            ),
            "component",
        )
        .select("url", "component_url")
    )
    serving.write.mode("overwrite").parquet(labels_path + "._tmp")
    out = spark.read.parquet(labels_path + "._tmp")
    out.write.mode("overwrite").parquet(labels_path)
    return spark.read.parquet(labels_path)


def incremental_components_sink(
    spark: SparkSession,
    pages_path: str,
    labels_path: str,
    **cc_kwargs,
):
    """foreachBatch callback: append the page batch, refresh the CC
    serving table warm-started from the previous epoch (mirror of
    :func:`incremental_pagerank_sink`)."""

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("append").parquet(pages_path)
        refresh_components(spark, pages_path, labels_path, **cc_kwargs)

    return _sink
