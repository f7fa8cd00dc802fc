"""Clique-percolation communities vs live networkx
(community/kclique.py k_clique_communities)."""

import networkx as nx
import pandas as pd
import pytest
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.operators.kclique import k_clique_communities


def _lg(spark, n, edges):
    return LinkGraph(
        vertices=spark.range(n).select("id"),
        edges=spark.createDataFrame(
            pd.DataFrame(edges, columns=["src", "dst"])
        ).select(
            F.col("src").cast("long"), F.col("dst").cast("long"),
            F.lit(1.0).alias("weight"),
        ),
        directed=False,
    )


def _collect_communities(rows):
    comms = {}
    for r in rows:
        comms.setdefault((r["ca"], r["cb"], r["cc"]), set()).add(r["id"])
    return set(frozenset(v) for v in comms.values())


def test_two_overlapping_triangle_communities(spark):
    # triangles {0,1,2} and {1,2,3} share edge (1,2) -> one community;
    # triangle {5,6,7} is separate; node 4 bridges but is in none
    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3),
             (3, 4), (4, 5), (5, 6), (5, 7), (6, 7)]
    g = _lg(spark, 8, edges)
    got = _collect_communities(k_clique_communities(g, 3).collect())
    assert got == {frozenset({0, 1, 2, 3}), frozenset({5, 6, 7})}


@pytest.mark.parametrize("seed", [1, 7])
def test_matches_networkx_on_random_graph(spark, seed):
    G = nx.gnm_random_graph(30, 110, seed=seed)
    g = _lg(spark, 30, list(G.edges()))
    got = _collect_communities(k_clique_communities(g, 3).collect())
    ref = set(frozenset(c) for c in nx.community.k_clique_communities(G, 3))
    assert got == ref


def test_k2_is_connected_components_of_nonisolated(spark):
    edges = [(0, 1), (1, 2), (4, 5)]
    g = _lg(spark, 7, edges)
    rows = k_clique_communities(g, 2).collect()
    comms = {}
    for r in rows:
        comms.setdefault(r["community"], set()).add(r["id"])
    assert set(frozenset(v) for v in comms.values()) == {
        frozenset({0, 1, 2}), frozenset({4, 5})
    }
    ref = set(frozenset(c) for c in nx.community.k_clique_communities(
        nx.Graph(edges), 2))
    assert set(frozenset(v) for v in comms.values()) == ref


def test_k4_raises(spark):
    g = _lg(spark, 3, [(0, 1)])
    with pytest.raises(ValueError):
        k_clique_communities(g, 4)
