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
