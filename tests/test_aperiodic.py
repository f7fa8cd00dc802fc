"""is_aperiodic vs the live networkx oracle."""

import networkx as nx
import pytest

from linkgraph.graph import graph_from_edge_names
from linkgraph.operators.strongly_connected import is_aperiodic

from nx_oracle import nx_graph

CASES = [
    [(1, 2), (2, 1)],                                   # 2-cycle: periodic
    [(1, 2), (2, 3), (3, 1), (1, 4), (4, 1)],           # 3+2 coprime: aperiodic
    [(1, 2), (2, 3), (3, 1)],                           # 3-cycle: periodic
    [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)],           # 4-cycle + chord
    [(1, 1)],                                           # self-loop: aperiodic
    [(1, 2), (2, 3), (3, 1), (2, 1)],                   # 3 + 2 overlap
]


@pytest.mark.parametrize("edges", CASES)
def test_is_aperiodic_vs_nx(spark, edges):
    G = nx_graph(edges, directed=True)
    want = nx.is_aperiodic(G)
    g = graph_from_edge_names(spark, edges, directed=True)
    assert is_aperiodic(g) is want


def test_is_aperiodic_not_strongly_connected_raises(spark):
    g = graph_from_edge_names(spark, [(1, 2), (2, 3)], directed=True)
    with pytest.raises(ValueError):
        is_aperiodic(g)


def test_is_aperiodic_undirected_raises(spark):
    g = graph_from_edge_names(spark, [(1, 2)], directed=False)
    with pytest.raises(ValueError):
        is_aperiodic(g)
