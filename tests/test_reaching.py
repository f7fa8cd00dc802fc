"""Reaching centrality vs the live networkx oracle
(centrality/reaching.py, unweighted directed form)."""

import networkx as nx
import pytest

from linkgraph.graph import graph_from_edge_names
from linkgraph.operators.reaching import (
    global_reaching_centrality,
    local_reaching_centrality,
)

from nx_oracle import nx_graph


def names(g):
    return {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}


EDGES = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (5, 0), (4, 6), (7, 7)]


def test_local_reaching_vs_nx(spark):
    g = graph_from_edge_names(spark, EDGES, directed=True)
    nm = names(g)
    got = {nm[r["id"]]: r["lrc"] for r in local_reaching_centrality(g).collect()}
    G = nx_graph(EDGES, directed=True)
    for v in G.nodes:
        want = nx.local_reaching_centrality(G, v)
        assert got[str(v)] == pytest.approx(want, abs=1e-9)


def test_global_reaching_vs_nx(spark):
    g = graph_from_edge_names(spark, EDGES, directed=True)
    got = global_reaching_centrality(g).first()["grc"]
    want = nx.global_reaching_centrality(nx_graph(EDGES, directed=True))
    assert got == pytest.approx(want, abs=1e-9)


def test_reaching_star_is_one(spark):
    star = [(0, i) for i in range(1, 6)]
    g = graph_from_edge_names(spark, star, directed=True)
    got = global_reaching_centrality(g).first()["grc"]
    assert got == pytest.approx(1.0)
