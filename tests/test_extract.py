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


def test_anchors_one_pure():
    from linkgraph.sources.extract import anchors_one

    html = (
        b'<html><body>'
        b'<a href="child">plain text</a>'
        b'<a class="x" href="/abs">has <b>nested</b> tags</a>'
        b'<a href="e">ent &amp; ity</a>'
        b'<a href="ws">  lots \n of   space </a>'
        b"</body></html>"
    )
    got = anchors_one(html, "https://test.example/g/1")
    assert got == [
        ("https://test.example/g/child", "plain text"),
        ("https://test.example/abs", "has nested tags"),
        ("https://test.example/g/e", "ent & ity"),
        ("https://test.example/g/ws", "lots of space"),
    ]


def test_anchors_from_pages_fixture(spark):
    # render_page writes "to {d}" anchors; the UDF must get them back
    from linkgraph.sources.extract import anchors_from_pages

    pages = corpus.pages_df(spark, "p1", P1_EDGES)
    got = {
        (
            r["src_url"].rsplit("/", 1)[-1],
            r["dst_url"].rsplit("/", 1)[-1],
            r["anchor"],
        )
        for r in anchors_from_pages(pages).collect()
    }
    assert got == {(str(u), str(v), f"to {v}") for u, v in P1_EDGES}


def test_anchor_text_profile_tiebreak(spark):
    from linkgraph.sources.extract import anchor_text_profile

    rows = [
        ("s1", "d", "beta"),
        ("s2", "d", "beta"),
        ("s3", "d", "alpha"),
        ("s4", "d", "alpha"),  # tie 2-2 -> lexicographic winner "alpha"
        ("s5", "d", "gamma"),
        ("s6", "e", "only"),
    ]
    df = spark.createDataFrame(rows, "src_url string, dst_url string, anchor string")
    got = {r["dst_url"]: r for r in anchor_text_profile(df).collect()}
    assert got["d"]["n_inlinks"] == 5
    assert got["d"]["n_unique_anchors"] == 3
    assert got["d"]["top_anchor"] == "alpha" and got["d"]["top_anchor_n"] == 2
    assert got["e"]["top_anchor"] == "only" and got["e"]["n_inlinks"] == 1


def test_pages_from_edges_anchor_col_roundtrip(spark):
    from linkgraph.sources.corpus import pages_from_edges
    from linkgraph.sources.extract import anchors_from_pages

    verts = spark.createDataFrame([("1",), ("2",), ("3",)], "name string")
    edges = spark.createDataFrame(
        [("1", "2", "two links"), ("1", "3", "three"), ("2", "3", "three")],
        "src_name string, dst_name string, label string",
    )
    pages = pages_from_edges(verts, edges, name="ax", anchor_col="label")
    got = {
        (r["src_url"].rsplit("/", 1)[-1], r["dst_url"].rsplit("/", 1)[-1], r["anchor"])
        for r in anchors_from_pages(pages).collect()
    }
    assert got == {("1", "2", "two links"), ("1", "3", "three"), ("2", "3", "three")}


def test_pages_from_edges_markup_anchor_roundtrip(spark):
    """Anchor strings containing markup characters (&, <, >, quotes,
    even a literal '</a>') must survive render->parse byte-identically:
    the renderer HTML-escapes at render time and the extractor's entity
    unescape inverts it (corpus.py _escape_html)."""
    from linkgraph.sources.corpus import pages_from_edges
    from linkgraph.sources.extract import anchors_from_pages

    nasty = [
        "A & B",
        "5 < 6 > 4",
        'say "hi"',
        "it's fine",
        "</a> breaker",
        "<b>bold</b>",
        "&amp; already escaped",
    ]
    verts = spark.createDataFrame([("0",)] + [(str(i + 1),) for i in range(len(nasty))], "name string")
    edges = spark.createDataFrame(
        [("0", str(i + 1), s) for i, s in enumerate(nasty)],
        "src_name string, dst_name string, label string",
    )
    pages = pages_from_edges(verts, edges, name="mk", anchor_col="label")
    got = {
        (r["dst_url"].rsplit("/", 1)[-1], r["anchor"])
        for r in anchors_from_pages(pages).collect()
    }
    assert got == {(str(i + 1), s) for i, s in enumerate(nasty)}
    # body text round-trip is unaffected: the page still parses and the
    # fixture sentence survives
    from linkgraph.sources.extract import extract_pages

    texts = {r["url"].rsplit("/", 1)[-1]: r["extracted_text"] for r in extract_pages(pages).collect()}
    assert "crawl fixture page" in texts["0"]
