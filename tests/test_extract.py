"""Extraction invariant: byte-identical text per url, Spark vs pandas oracle.

Mandated by BASELINE.json input_hint ("per-row invariant vs the
reference: byte-identical extracted text per url").
"""

import pandas as pd

from linkgraph.sources import corpus
from linkgraph.sources.extract import edges_from_pages, extract_batch, extract_pages

P1_EDGES = [(1, 2), (1, 3), (3, 1), (3, 2), (3, 5), (4, 5), (4, 6), (5, 4), (5, 6), (6, 4)]


def test_text_byte_identical(spark):
    pages = corpus.pages_df(spark, "p1", P1_EDGES)
    got = extract_pages(pages).orderBy("url").toPandas()
    ref = pages.select("url", "html", "text").orderBy("url").toPandas()
    oracle = extract_batch(ref["html"], ref["url"])
    assert list(got["extracted_text"]) == list(oracle["text"])
    # and equals the stored oracle column byte-for-byte
    assert list(got["extracted_text"]) == list(ref["text"])
    # text must not leak markup / script / comments
    joined = " ".join(got["extracted_text"])
    assert "<" not in joined and "script" not in joined and "crawl fixture" not in joined
    # entity unescape happened outside scripts only
    assert "&amp;" not in joined


def test_edges_roundtrip(spark):
    pages = corpus.pages_df(spark, "p1", P1_EDGES)
    got = {
        (r["src_url"].rsplit("/", 1)[-1], r["dst_url"].rsplit("/", 1)[-1])
        for r in edges_from_pages(pages).collect()
    }
    assert got == {(str(u), str(v)) for u, v in P1_EDGES}


def test_parallel_links_preserved(spark):
    pages = corpus.pages_df(spark, "m", [(1, 2), (1, 2), (2, 3)])
    rows = edges_from_pages(pages).collect()
    assert len(rows) == 3  # repeated href = parallel edge rows


def test_relative_href_resolution():
    text, links = __import__("linkgraph.sources.extract", fromlist=["extract_one"]).extract_one(
        b'<html><body><a href="child">c</a><a href="/abs">a</a></body></html>',
        "https://test.example/g/1",
    )
    assert links == ["https://test.example/g/child", "https://test.example/abs"]
    assert text == "c a"
