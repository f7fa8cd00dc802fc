"""Edge-list / adjacency-list / node-link readers and writers
(ported behaviors from networkx/readwrite/tests: comments stripped,
weights parsed, roundtrips preserve the edge set)."""

import pytest

from pyspark.sql import functions as F

from linkgraph.graph import graph_from_edge_names
from linkgraph.sources import edgelist as el


def edge_set(df):
    return {(r["su"], r["sv"]) for r in df.select("su", "sv").collect()}


def test_parse_edgelist_comments_and_weights(spark):
    lines = ["# header", "a b 2.0", "b c 3.5 # trailing", "", "c a 1.0"]
    df = el.parse_edgelist(spark, lines, weighted=True)
    rows = {(r["su"], r["sv"]): r["weight"] for r in df.collect()}
    assert rows == {("a", "b"): 2.0, ("b", "c"): 3.5, ("c", "a"): 1.0}


def test_parse_edgelist_unweighted(spark):
    df = el.parse_edgelist(spark, ["1 2", "2 3"])
    assert edge_set(df) == {("1", "2"), ("2", "3")}
    assert df.where(F.col("weight").isNotNull()).count() == 0


def test_edgelist_roundtrip(spark, tmp_path):
    src = el.parse_edgelist(spark, ["a b 1.0", "b c 2.0", "c d 3.0"], weighted=True)
    path = str(tmp_path / "el")
    el.write_edgelist(src, path)
    back = el.read_edgelist(spark, path, weighted=True)
    assert edge_set(back) == edge_set(src)
    assert {r["weight"] for r in back.collect()} == {1.0, 2.0, 3.0}


def test_adjlist_parse_and_roundtrip(spark, tmp_path):
    lines = ["a b c", "b c", "d"]  # d is isolated
    df = el.parse_adjlist(spark, lines)
    pairs = {(r["su"], r["sv"]) for r in df.collect()}
    assert pairs == {("a", "b"), ("a", "c"), ("b", "c"), ("d", None)}
    path = str(tmp_path / "adj")
    el.write_adjlist(df.where(F.col("sv").isNotNull()), path)
    back = el.read_adjlist(spark, path)
    assert {(r["su"], r["sv"]) for r in back.collect()} == {
        ("a", "b"), ("a", "c"), ("b", "c")}


def test_node_link_json_roundtrip(spark, tmp_path):
    g_edges = el.parse_edgelist(spark, ["a b", "b c"], weighted=False)
    nodes = spark.createDataFrame([("a",), ("b",), ("c",), ("z",)], "su string")
    path = str(tmp_path / "nl")
    el.write_node_link_json(nodes, g_edges, path)
    n2, e2 = el.read_node_link_json(spark, path)
    assert {r["su"] for r in n2.collect()} == {"a", "b", "c", "z"}
    assert edge_set(e2) == {("a", "b"), ("b", "c")}


def test_reader_feeds_graph_pipeline(spark):
    df = el.parse_edgelist(spark, ["u v", "v w", "w u"])
    edges = [(r["su"], r["sv"]) for r in df.collect()]
    g = graph_from_edge_names(spark, edges, directed=True)
    assert g.vertices.count() == 3
    assert g.edges.count() == 3
