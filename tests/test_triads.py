"""Triadic census vs the live networkx oracle."""

import networkx as nx
import pytest

from linkgraph.graph import graph_from_edge_names
from linkgraph.operators.triads import TRIAD_CLASSES, triadic_census


def census_dict(df):
    return {r["triad_type"]: r["n_triads"] for r in df.collect()}


def test_triadic_census_small_fixture(spark):
    edges = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (3, 4), (0, 4), (4, 0)]
    g = graph_from_edge_names(spark, edges, directed=True)
    got = census_dict(triadic_census(g))
    G = nx.DiGraph(edges)
    want = nx.triadic_census(G)
    assert got == want
    assert set(got) == set(TRIAD_CLASSES)


@pytest.mark.parametrize("seed,p", [(1, 0.08), (2, 0.2), (3, 0.5)])
def test_triadic_census_random_vs_nx(spark, seed, p):
    G = nx.gnp_random_graph(16, p, seed=seed, directed=True)
    g = graph_from_edge_names(
        spark, list(G.edges()), nodes=list(G.nodes), directed=True
    )
    got = census_dict(triadic_census(g))
    want = nx.triadic_census(G)
    assert got == want


def test_triadic_census_counts_sum_to_choose3(spark):
    G = nx.gnp_random_graph(12, 0.3, seed=5, directed=True)
    g = graph_from_edge_names(
        spark, list(G.edges()), nodes=list(G.nodes), directed=True
    )
    got = census_dict(triadic_census(g))
    n = 12
    assert sum(got.values()) == n * (n - 1) * (n - 2) // 6


def test_triadic_census_rejects_undirected(spark):
    g = graph_from_edge_names(spark, [(0, 1)], directed=False)
    with pytest.raises(ValueError):
        triadic_census(g)


def test_triadic_census_empty_edges(spark):
    g = graph_from_edge_names(spark, [], nodes=[0, 1, 2, 3], directed=True)
    got = census_dict(triadic_census(g))
    assert got["003"] == 4
    assert sum(got.values()) == 4
