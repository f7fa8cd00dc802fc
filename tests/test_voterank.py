"""nx-parity tests for VoteRank."""

import networkx as nx
import pytest

from linkgraph.graph import LinkGraph
from linkgraph.operators.voterank import voterank


def _g(spark, edges, n, directed=False):
    e = spark.createDataFrame(
        [(a, b, None) for a, b in edges], "src long, dst long, weight double"
    )
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    return LinkGraph(vertices=v, edges=e, directed=directed)


def _ranked(df):
    return [r["id"] for r in df.orderBy("seed_rank").collect()]


def test_voterank_docstring_undirected(spark):
    edges = [(0, 1), (0, 2), (0, 3), (1, 4)]
    g = _g(spark, edges, 5)
    assert _ranked(voterank(g)) == nx.voterank(nx.Graph(edges))


def test_voterank_docstring_directed(spark):
    edges = [(0, 1), (2, 1), (2, 3), (3, 4)]
    g = _g(spark, edges, 5, directed=True)
    assert _ranked(voterank(g)) == nx.voterank(nx.DiGraph(edges))


def test_voterank_karate_topk(spark):
    G = nx.karate_club_graph()
    g = _g(spark, list(G.edges()), 34)
    for k in (3, 7):
        assert _ranked(voterank(g, k)) == nx.voterank(G, k)


@pytest.mark.parametrize("directed", [False, True])
def test_voterank_random_gnp(spark, directed):
    G = nx.gnp_random_graph(30, 0.12, seed=7, directed=directed)
    G.add_nodes_from(range(30))
    g = _g(spark, list(G.edges()), 30, directed=directed)
    assert _ranked(voterank(g, 6)) == nx.voterank(G, 6)
