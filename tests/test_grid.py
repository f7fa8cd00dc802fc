"""2D (grid) partitioned PageRank gather — exact parity with the
default 1D src-hash layout on fixtures, including dangling nodes,
weights, and hub salting interplay."""

import networkx as nx
import pytest

from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph, graph_from_edge_names
from linkgraph.operators.pagerank import pagerank


def ranks(df):
    return {r["id"]: r["rank"] for r in df.collect()}


def test_grid_pagerank_matches_default_karate(spark):
    g = graph_from_edge_names(spark, list(nx.karate_club_graph().edges()), directed=False)
    base = ranks(pagerank(g, alpha=0.85, tol=1e-10))
    grid = ranks(pagerank(g, alpha=0.85, tol=1e-10, dst_blocks=4))
    assert set(base) == set(grid)
    for k, v in base.items():
        assert grid[k] == pytest.approx(v, abs=1e-12), k


def test_grid_pagerank_matches_default_directed_dangling(spark):
    # 6 edges; node 5 dangling; weights vary; hub_chunk tiny to force
    # salting inside grid cells too
    edf = spark.createDataFrame(
        [(0, 1, 2.0), (0, 2, 1.0), (1, 3, 1.0), (2, 3, 5.0), (3, 5, 1.0), (4, 0, 1.0)],
        "src long, dst long, weight double",
    )
    vdf = spark.createDataFrame([(i,) for i in range(6)], "id long")
    g = LinkGraph(vertices=vdf, edges=edf, directed=True)
    base = ranks(pagerank(g, alpha=0.9, tol=1e-12))
    grid = ranks(pagerank(g, alpha=0.9, tol=1e-12, dst_blocks=3, hub_chunk=1))
    for k, v in base.items():
        assert grid[k] == pytest.approx(v, abs=1e-12), k


def test_grid_pagerank_fixed_iter_zipf(spark):
    # mid-size deterministic zipf-ish graph, fixed supersteps
    n = 2000
    ids = spark.range(n)
    edges = ids.select(
        F.col("id").alias("src"),
        F.explode(
            F.sequence(F.lit(0), F.pmod(F.xxhash64("id"), F.lit(7)))
        ).alias("k"),
    ).select(
        "src",
        F.pmod(F.xxhash64("src", "k"), F.lit(n)).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    g = LinkGraph(vertices=ids.select("id"), edges=edges, directed=True)
    base = ranks(pagerank(g, fixed_iter=8))
    grid = ranks(pagerank(g, fixed_iter=8, dst_blocks=4))
    assert len(base) == n
    for k, v in base.items():
        assert grid[k] == pytest.approx(v, rel=1e-9), k
