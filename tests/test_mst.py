"""Distributed Borůvka minimum spanning forest vs live networkx
Kruskal (networkx/algorithms/tree/mst.py)."""

import networkx as nx
import pandas as pd
import pytest
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.operators.mst import (
    minimum_spanning_forest,
    minimum_spanning_tree,
)


def _lg(spark, n, wedges):
    return LinkGraph(
        vertices=spark.range(n).select("id"),
        edges=spark.createDataFrame(
            pd.DataFrame(wedges, columns=["src", "dst", "weight"])
        ).select(
            F.col("src").cast("long"), F.col("dst").cast("long"),
            F.col("weight").cast("double"),
        ),
        directed=False,
    )


def _distinct_weights(edges):
    # deterministic, all-distinct weights
    return [(u, v, 1.0 + ((u * 131 + v * 17) % 997) / 7.0 + (u * 31 + v) * 1e-6)
            for u, v in edges]


def test_unique_mst_matches_kruskal_exactly(spark):
    G0 = nx.gnm_random_graph(40, 120, seed=21)
    wedges = _distinct_weights(list(G0.edges()))
    G = nx.Graph()
    G.add_weighted_edges_from(wedges)
    g = _lg(spark, 40, wedges)
    ours = {(r["a"], r["b"]) for r in minimum_spanning_forest(g).collect()}
    ref = {(min(u, v), max(u, v))
           for u, v, _ in nx.minimum_spanning_edges(G, data=True, keys=False)}
    assert ours == ref


def test_forest_on_disconnected_graph(spark):
    # two components + an isolated vertex -> n - #components edges
    edges = [(0, 1), (1, 2), (0, 2), (4, 5), (5, 6), (4, 6)]
    wedges = _distinct_weights(edges)
    g = _lg(spark, 8, wedges)
    out = minimum_spanning_forest(g).collect()
    assert len(out) == 4  # 2 + 2 (components {0,1,2}, {4,5,6}; 3,7 isolated)
    G = nx.Graph()
    G.add_weighted_edges_from(wedges)
    ref_w = sum(d["weight"] for _, _, d in
                nx.minimum_spanning_edges(G, data=True))
    assert sum(r["w"] for r in out) == pytest.approx(ref_w, abs=1e-9)


def test_ties_give_valid_msf_weight(spark):
    # many equal weights: edge sets may differ from Kruskal's
    # insertion-order choice, but every MSF has the same total weight
    G0 = nx.gnm_random_graph(30, 90, seed=33)
    wedges = [(u, v, float((u + v) % 4)) for u, v in G0.edges()]
    G = nx.Graph()
    G.add_weighted_edges_from(wedges)
    g = _lg(spark, 30, wedges)
    out = minimum_spanning_forest(g).collect()
    T = nx.minimum_spanning_tree(G)
    assert len(out) == T.number_of_edges()
    assert sum(r["w"] for r in out) == pytest.approx(
        T.size(weight="weight"), abs=1e-9
    )
    # and ours must itself be spanning + acyclic
    H = nx.Graph((r["a"], r["b"]) for r in out)
    H.add_nodes_from(G)
    assert nx.number_connected_components(H) == nx.number_connected_components(G) + (30 - G.number_of_nodes())


def test_parallel_edges_and_self_loops(spark):
    wedges = [(0, 1, 5.0), (1, 0, 2.0), (1, 1, 0.1), (1, 2, 3.0)]
    g = _lg(spark, 3, wedges)
    out = {(r["a"], r["b"]): r["w"] for r in minimum_spanning_forest(g).collect()}
    assert out == {(0, 1): 2.0, (1, 2): 3.0}


def test_tree_facade(spark):
    wedges = _distinct_weights([(0, 1), (1, 2), (2, 3), (3, 0)])
    t = minimum_spanning_tree(_lg(spark, 4, wedges))
    assert t.edges.count() == 3 and not t.directed
