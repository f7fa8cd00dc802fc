"""Deterministic synthetic web-page corpus generator.

Renders any fixture graph as Common-Crawl-style pages with the exact
``BASELINE.json`` input_hint schema::

    pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)

One ``<a href>`` per out-edge; repeated hrefs encode parallel edges
(multigraph fixtures). The ``text`` column is produced by running the
engine's own extractor (:mod:`linkgraph.sources.extract`) on the
rendered html under plain pandas, so "byte-identical extracted text
per url" is a checkable invariant rather than an accident.

Everything is seeded/deterministic — no wall clock, no global RNG.
"""

from __future__ import annotations

import datetime as dt
import random
from typing import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .extract import extract_one

BASE = "https://test.example"

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu crawl index link graph rank node edge web page"
).split()


def node_url(graph: str, node) -> str:
    return f"{BASE}/{graph}/{node}"


def _body_text(graph: str, node) -> str:
    rng = random.Random(f"{graph}/{node}")
    return " ".join(rng.choice(_WORDS) for _ in range(12))


def render_page(graph: str, node, out_nodes: Sequence) -> bytes:
    title = f"{graph} page {node}"
    anchors = "".join(
        f'<a href="{node_url(graph, d)}">to {d}</a> ' for d in out_nodes
    )
    html = (
        f"<html><head><title>{title}</title>"
        f"<script>var x = 1 &amp;&amp; 2;</script>"
        f"<style>.a {{color: red}}</style></head>"
        f"<body><!-- crawl fixture --><h1>{title}</h1>"
        f"<p>{_body_text(graph, node)}</p>{anchors}</body></html>"
    )
    return html.encode("utf-8")


def pages_pdf(graph: str, edges: Iterable[tuple], nodes: Iterable = ()) -> pd.DataFrame:
    """Build the pages table as pandas (fixture scale).

    ``edges`` are (u, v) pairs over arbitrary hashable node names;
    ``nodes`` adds isolated nodes. warc_ts = epoch + row-index seconds.
    """
    adj: dict = {}
    for n in nodes:
        adj.setdefault(n, [])
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, [])
    rows = []
    epoch = dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc)
    for i, n in enumerate(sorted(adj, key=str)):
        url = node_url(graph, n)
        html = render_page(graph, n, adj[n])
        text, _links = extract_one(html, url)
        rows.append(
            {
                "url": url,
                "warc_ts": epoch + dt.timedelta(seconds=i),
                "html": html,
                "text": text,
                "lang": "en",
            }
        )
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def pages_df(spark: SparkSession, graph: str, edges, nodes=()) -> DataFrame:
    return spark.createDataFrame(pages_pdf(graph, edges, nodes), schema=PAGES_SCHEMA)


def zipf_edges(spark: SparkSession, n: int, avg_out: int = 10,
               exponent: float = 0.7, partitions: int = 32) -> DataFrame:
    """Deterministic Zipf-skewed (src, dst) edge table — THE shared
    generator behind every at-scale measurement (cc/hyperball/anchor/
    incremental scaling tools and :func:`zipf_pages`): per-page
    out-degree 1..2·avg_out−1 from a hash, target ids power-law-skewed
    toward 0 (hub in-link skew). Pure ``spark.range`` + hash
    arithmetic — identical rows at any parallelism, never touches the
    driver. Self-loops dropped; parallel edges possible (multigraph
    semantics, callers dedup as their operator requires)."""
    ids = spark.range(0, n, 1, partitions)
    k = ids.select(
        "id",
        F.explode(
            F.sequence(F.lit(0), F.pmod(F.xxhash64("id"), F.lit(avg_out * 2 - 1)))
        ).alias("k"),
    )
    u = (F.pmod(F.xxhash64("id", "k"), F.lit(1_000_000_007)) + 1) / 1_000_000_008.0
    dst = F.least(
        F.lit(n - 1), F.floor(F.pow(u, F.lit(1.0 / (1.0 - exponent))) * n)
    ).cast("long")
    return (
        k.select(F.col("id").alias("src"), dst.alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )


def zipf_pages(
    spark: SparkSession,
    n: int,
    avg_out: int = 10,
    exponent: float = 0.7,
    name: str = "sf",
    partitions: int = 32,
) -> DataFrame:
    """Scale corpus: n pages, Zipf-skewed out-links, fully distributed.

    Generated with arithmetic on ``spark.range`` — deterministic across
    partitionings and cluster sizes, never touches the driver. Link k of
    page i targets ``floor(n * u^(1/(1-exponent)))`` where u is a hash-
    derived uniform — a power-law target distribution that concentrates
    in-links on low ids (hub skew, exercises salting/AQE paths).
    """
    ids = spark.range(0, n, 1, partitions)
    links = zipf_edges(
        spark, n, avg_out=avg_out, exponent=exponent, partitions=partitions
    ).select(F.col("src").alias("id"), "dst")
    url = F.concat(F.lit(f"{BASE}/{name}/"), F.col("id"))
    dst_url = F.concat(F.lit(f"{BASE}/{name}/"), F.col("dst"))
    body = links.groupBy("id").agg(
        F.concat_ws(
            "", F.collect_list(F.format_string('<a href="%s">l</a>', dst_url))
        ).alias("anchors")
    )
    page = ids.join(body, "id", "left").select(
        url.alias("url"),
        F.timestamp_seconds(F.lit(1577836800) + F.col("id")).alias("warc_ts"),
        F.encode(
            F.format_string(
                "<html><head><title>p%s</title></head><body><h1>p%s</h1>%s</body></html>",
                F.col("id"),
                F.col("id"),
                F.coalesce(F.col("anchors"), F.lit("")),
            ),
            "utf-8",
        ).alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit("en").alias("lang"),
    )
    return page


def _escape_html(c):
    """Minimal HTML escaping for rendered text content (the five
    characters python's ``html.escape`` handles; ``&`` first so later
    entities aren't double-escaped). ``html.unescape`` on the parse
    side is the exact inverse."""
    c = F.replace(c, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    c = F.replace(c, F.lit(">"), F.lit("&gt;"))
    c = F.replace(c, F.lit('"'), F.lit("&quot;"))
    return F.replace(c, F.lit("'"), F.lit("&#x27;"))


def pages_from_edges(
    vertices: DataFrame,
    edges: DataFrame,
    name: str = "g",
    anchor_col: str | None = None,
) -> DataFrame:
    """Render a pages table from an arbitrary named edge table, fully
    distributed and JVM-only (no UDF, no driver collection).

    ``vertices(name STRING)`` — one page per vertex, rendered even when
    it has no out-links; ``edges(src_name STRING, dst_name STRING)`` —
    one ``<a href>`` per row (parallel rows => repeated anchors =>
    multigraph ingest, matching :func:`render_page`). Unlike
    :func:`pages_pdf` this renderer never touches the driver, so it is
    the shape a 100 TB re-crawl simulation would use: one groupBy(src)
    shuffle + one left join against the vertex table.

    The whole render is Catalyst column arithmetic (concat/collect_list/
    format_string) — whole-stage codegen end to end. ``text`` is left
    NULL (the extractor recomputes it downstream); body text is a fixed
    sentence so the page content is reproducible from (vertices, edges)
    alone — which is what lets a SQL oracle skip the html round-trip and
    derive the same graph straight from the edge table.

    ``anchor_col`` (optional) names a STRING column on ``edges`` used
    as the link's visible anchor text instead of the constant ``l`` —
    the hook for anchor-text workloads (extract.anchors_from_pages):
    the anchor stream stays derivable from the edge table alone, so a
    SQL oracle can check the full render→parse round-trip. Anchor text
    is HTML-ESCAPED at render time (&, <, >, ", ' → entities), and the
    extractor's entity unescape inverts it exactly, so markup
    characters round-trip render→parse byte-identically. (An oracle
    deriving anchors straight from the edge table needs no inverse —
    escape∘unescape is the identity on the anchor stream.) The one
    remaining normalization is the extractor's whitespace contract:
    runs of whitespace collapse to single spaces on parse.
    """
    url = F.concat(F.lit(f"{BASE}/{name}/"), F.col("name"))
    dst_url = F.concat(F.lit(f"{BASE}/{name}/"), F.col("dst_name"))
    anchor_text = (
        _escape_html(F.col(anchor_col)) if anchor_col else F.lit("l")
    )
    body = edges.groupBy(F.col("src_name").alias("name")).agg(
        F.concat_ws(
            "",
            F.array_sort(
                F.collect_list(
                    F.format_string('<a href="%s">%s</a>', dst_url, anchor_text)
                )
            ),
        ).alias("anchors")
    )
    return vertices.join(body, "name", "left").select(
        url.alias("url"),
        F.timestamp_seconds(F.lit(1577836800)).alias("warc_ts"),
        F.encode(
            F.format_string(
                "<html><head><title>%s %s</title></head>"
                "<body><h1>%s %s</h1><p>crawl fixture page</p>%s</body></html>",
                F.lit(name),
                F.col("name"),
                F.lit(name),
                F.col("name"),
                F.coalesce(F.col("anchors"), F.lit("")),
            ),
            "utf-8",
        ).alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit("en").alias("lang"),
    )
