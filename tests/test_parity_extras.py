"""Small parity completions vs live networkx: moral_graph,
is_regular / is_k_regular, barycenter."""

import networkx as nx
import pytest

from linkgraph.graph import graph_from_edge_names
from linkgraph.operators.degrees import is_k_regular, is_regular
from linkgraph.operators.distance_measures import barycenter
from linkgraph.operators.minors import moral_graph_edges

from nx_oracle import nx_graph


def names(g):
    return {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}


def test_moral_graph_vs_nx(spark):
    edges = [(0, 3), (1, 3), (2, 3), (3, 4), (1, 4), (5, 4)]
    g = graph_from_edge_names(spark, edges, directed=True)
    nm = names(g)
    got = {
        tuple(sorted((nm[r["src"]], nm[r["dst"]])))
        for r in moral_graph_edges(g).collect()
    }
    M = nx.moral_graph(nx_graph(edges, directed=True))
    want = {tuple(sorted((str(u), str(v)))) for u, v in M.edges()}
    assert got == want


@pytest.mark.parametrize(
    "edges,directed,expected",
    [
        ([(0, 1), (1, 2), (2, 0)], False, True),    # cycle: 2-regular
        ([(0, 1), (1, 2)], False, False),           # path: degrees 1,2,1
        ([(0, 1), (1, 2), (2, 0)], True, True),     # directed cycle
        ([(0, 1), (0, 2), (1, 2)], True, False),    # uneven in/out
    ],
)
def test_is_regular_vs_nx(spark, edges, directed, expected):
    G = nx_graph(edges, directed=directed)
    assert nx.is_regular(G) is expected
    g = graph_from_edge_names(spark, edges, directed=directed)
    assert is_regular(g) is expected


def test_is_k_regular(spark):
    cyc = graph_from_edge_names(spark, [(0, 1), (1, 2), (2, 0)], directed=False)
    assert is_k_regular(cyc, 2) is True
    assert is_k_regular(cyc, 3) is False


def test_barycenter_vs_nx(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (2, 5)]  # star-ish tree
    G = nx_graph(edges, directed=False)
    want = {str(v) for v in nx.barycenter(G)}
    g = graph_from_edge_names(spark, edges, directed=False)
    nm = names(g)
    got = {nm[r["id"]] for r in barycenter(g).collect()}
    assert got == want


def test_barycenter_disconnected_raises(spark):
    g = graph_from_edge_names(spark, [(0, 1), (2, 3)], directed=False)
    with pytest.raises(ValueError):
        barycenter(g)
