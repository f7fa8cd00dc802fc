"""Structured Streaming ingest: a growing crawl -> continuously
maintained edge table.

The reference has NO streaming surface (no watermarks/windows/stateful
operators anywhere in the package — SURVEY.md §2.8); its ingest is an
eager per-line loop. The batch analog here is ``graph_from_pages``.
This module is the engine's forward-looking stream form of the same
contract: the SAME extraction UDF (identical code object — so the
byte-identical-text invariant carries over) applied under
``readStream``, so a continuously arriving Common-Crawl-style dump
becomes an append-only ``(src_url, dst_url, warc_ts)`` edge stream.

Scale notes:
* The extraction pandas UDF is stateless → no shuffle before the sink;
  each micro-batch is embarrassingly parallel.
* ``crawl_rate`` shows the watermark/window form: late pages (warc_ts
  older than the watermark) are dropped after ``late_threshold``.
* Iterative algorithms stay batch (supersteps over a snapshot): the
  north rule's temporal requirement is checkpoint/resume of the
  superstep loop, not streaming graph maintenance. A periodic batch
  PageRank over the latest edge snapshot is the intended composition
  (stream ingests, batch ranks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.corpus import PAGES_SCHEMA
from ..sources.extract import extract_udf


def read_page_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """Stream of page rows from a directory of parquet drops with the
    mandated input schema (url, warc_ts, html, text, lang)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def edge_stream(pages: DataFrame) -> DataFrame:
    """pages stream -> (src_url, dst_url, warc_ts) edge stream using
    the SAME vectorized extraction UDF as the batch path
    (linkgraph/sources/extract.py)."""
    ext = pages.select(
        "url", "warc_ts", extract_udf(F.col("html"), F.col("url")).alias("ex")
    )
    return ext.select(
        F.col("url").alias("src_url"),
        F.explode("ex.links").alias("dst_url"),
        "warc_ts",
    )


def write_edge_stream(
    edges: DataFrame, out_path: str, checkpoint_path: str, trigger_seconds: int = 10
):
    """Append-only parquet sink; exactly-once via the stream checkpoint.
    Returns the StreamingQuery (caller owns awaitTermination/stop)."""
    return (
        edges.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .outputMode("append")
        .start()
    )


def crawl_rate(
    pages: DataFrame, window: str = "1 minute", late_threshold: str = "5 minutes"
) -> DataFrame:
    """Windowed crawl-rate aggregation with late-data handling:
    pages/window keyed by lang, watermarked on warc_ts."""
    return (
        pages.withWatermark("warc_ts", late_threshold)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
        )
    )
