"""HTML -> (text, out-links) extraction.

The north rule mandates: "vectorized Arrow UDFs parse HTML to
byte-identical extracted text per url, emit (src, dst) edges".

Design: ONE pure-pandas function (:func:`extract_batch`) is the single
source of truth. The Spark path wraps it in a vectorized
``pandas_udf`` (Arrow batch transfer, no per-row Python in the Spark
plan); the oracle path calls the very same function on a plain pandas
frame — byte-identical extracted text per url is then a per-row
invariant the tests assert directly (see tests/test_extract.py).

Reference parity note: NetworkX has no HTML ingestion; this operator
is mandated by BASELINE.json input_hint. The edge-emission that
follows it replaces graph construction via ``add_edges_from``
(networkx/classes/graph.py:986 — dict-of-dict writes) with
``posexplode(links)`` into an edge table.
"""

from __future__ import annotations

import html as _htmlmod
import re
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Tag stripping order matters and is part of the byte-level contract:
# 1. drop <script>/<style> subtrees, 2. drop comments, 3. drop tags,
# 4. unescape entities, 5. collapse all whitespace runs to single
# spaces and strip. Pure regex on the decoded string: deterministic,
# no external parser dependency, vectorizes cleanly.
_SCRIPT_RE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")
_HREF_RE = re.compile(r"""<a\s[^>]*?href\s*=\s*["']([^"']+)["']""", re.IGNORECASE)


def extract_one(html_bytes: bytes, base_url: str) -> tuple[str, list[str]]:
    """Extract (text, out-links) from one page. Pure, deterministic."""
    raw = html_bytes.decode("utf-8", errors="replace")
    links = [urljoin(base_url, h) for h in _HREF_RE.findall(raw)]
    no_script = _SCRIPT_RE.sub(" ", raw)
    no_comment = _COMMENT_RE.sub(" ", no_script)
    no_tags = _TAG_RE.sub(" ", no_comment)
    text = _WS_RE.sub(" ", _htmlmod.unescape(no_tags)).strip()
    return text, links


def extract_batch(html: pd.Series, url: pd.Series) -> pd.DataFrame:
    """Batch form of :func:`extract_one` — shared by Spark and oracle."""
    out_text, out_links = [], []
    for h, u in zip(html, url):
        t, l = extract_one(h if isinstance(h, (bytes, bytearray)) else bytes(h), u)
        out_text.append(t)
        out_links.append(l)
    return pd.DataFrame({"text": out_text, "links": out_links})


_EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("links", T.ArrayType(T.StringType())),
    ]
)


@F.pandas_udf(_EXTRACT_SCHEMA)
def extract_udf(html: pd.Series, url: pd.Series) -> pd.DataFrame:
    return extract_batch(html, url)


def extract_pages(pages_df):
    """pages(url, warc_ts, html, text, lang) -> url, extracted struct.

    Column-pruned: only (url, html) reach the UDF; Catalyst prunes the
    rest out of the parquet scan.
    """
    return pages_df.select(
        "url", extract_udf(F.col("html"), F.col("url")).alias("x")
    ).select("url", F.col("x.text").alias("extracted_text"), F.col("x.links").alias("links"))


_ANCHOR_RE = re.compile(
    r"""<a\s[^>]*?href\s*=\s*["']([^"']+)["'][^>]*>(.*?)</a\s*>""",
    re.IGNORECASE | re.DOTALL,
)


def anchors_one(html_bytes: bytes, base_url: str) -> list[tuple[str, str]]:
    """Extract (dst_url, anchor_text) pairs from one page.

    Anchor text goes through the same cleanup contract as body text
    (strip nested tags, unescape entities, collapse whitespace) so the
    pair stream is byte-deterministic. Pure, shared by the Spark UDF
    and the test oracle like :func:`extract_one`.
    """
    raw = html_bytes.decode("utf-8", errors="replace")
    out = []
    for href, inner in _ANCHOR_RE.findall(raw):
        text = _WS_RE.sub(" ", _htmlmod.unescape(_TAG_RE.sub(" ", inner))).strip()
        out.append((urljoin(base_url, href), text))
    return out


_ANCHORS_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("dst_url", T.StringType()),
            T.StructField("anchor", T.StringType()),
        ]
    )
)


@F.pandas_udf(_ANCHORS_SCHEMA)
def anchors_udf(html: pd.Series, url: pd.Series) -> pd.Series:
    return pd.Series(
        [
            anchors_one(h if isinstance(h, (bytes, bytearray)) else bytes(h), u)
            for h, u in zip(html, url)
        ]
    )


def anchors_from_pages(pages_df):
    """pages -> (src_url, dst_url, anchor) rows — the in-link anchor
    text stream search indexers aggregate per target page. Vectorized
    Arrow UDF + posexplode, column-pruned to (url, html) like
    :func:`extract_pages`."""
    return (
        pages_df.select("url", anchors_udf(F.col("html"), F.col("url")).alias("a"))
        .select(F.col("url").alias("src_url"), F.explode("a").alias("p"))
        .select("src_url", F.col("p.dst_url").alias("dst_url"), F.col("p.anchor").alias("anchor"))
    )


def anchor_text_profile(anchors_df):
    """Per-target anchor-text profile: (dst_url, n_inlinks,
    n_unique_anchors, top_anchor, top_anchor_n).

    ``top_anchor`` is the most frequent in-link anchor string with a
    deterministic tie-break (higher count first, then lexicographic) —
    the aggregate web indexers attach to the TARGET page's document
    (anchor text describes the target better than its own body; the
    signal behind classic anchor-text ranking). Two hash aggregations,
    both with map-side partial agg; no window over the full stream.
    """
    per_anchor = anchors_df.groupBy("dst_url", "anchor").agg(
        F.count(F.lit(1)).alias("n")
    )
    return per_anchor.groupBy("dst_url").agg(
        F.sum("n").alias("n_inlinks"),
        F.count(F.lit(1)).alias("n_unique_anchors"),
        F.min_by(
            F.struct(F.col("anchor").alias("anchor"), F.col("n").alias("n")),
            F.struct((-F.col("n")).alias("neg"), F.col("anchor").alias("anchor")),
        ).alias("top"),
    ).select(
        "dst_url",
        "n_inlinks",
        "n_unique_anchors",
        F.col("top.anchor").alias("top_anchor"),
        F.col("top.n").alias("top_anchor_n"),
    )


def edges_from_pages(pages_df):
    """pages -> (src_url, dst_url) edge rows via posexplode(links).

    Multi-edges are preserved (repeated hrefs => parallel edges), to
    match MultiGraph ingestion; downstream ops coalesce weights when
    an algorithm requires it (pagerank sums parallel edge weights,
    networkx/convert_matrix.py:490 CSR coalescing semantics).
    """
    ex = extract_pages(pages_df)
    return ex.select(
        F.col("url").alias("src_url"),
        F.explode(F.col("links")).alias("dst_url"),
    )
