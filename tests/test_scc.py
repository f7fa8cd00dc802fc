"""Strongly connected components vs the live networkx oracle
(ported fixture shapes from networkx/algorithms/components/tests/
test_strongly_connected.py: cycles, chains of SCCs, self-loops,
singletons)."""

import networkx as nx
import pytest

from linkgraph.graph import graph_from_edge_names
from linkgraph.operators.strongly_connected import (
    condensation_edges,
    is_strongly_connected,
    number_strongly_connected_components,
    strongly_connected_components,
)

from nx_oracle import nx_graph


def scc_sets(spark_g):
    nm = {r["id"]: r["url"].rsplit("/", 1)[-1] for r in spark_g.vertices.collect()}
    comps = {}
    for r in strongly_connected_components(spark_g).collect():
        comps.setdefault(r["component"], set()).add(nm[r["id"]])
    return {frozenset(c) for c in comps.values()}


def oracle_sets(edges, nodes=()):
    g = nx_graph(edges, nodes=nodes, directed=True)
    return {frozenset(str(n) for n in c) for c in nx.strongly_connected_components(g)}


CASES = [
    # two cycles joined by a one-way bridge + a tail
    ([(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3), (5, 6)], []),
    # pure DAG: every node its own SCC
    ([(0, 1), (0, 2), (1, 3), (2, 3)], []),
    # single big cycle
    ([(i, (i + 1) % 6) for i in range(6)], []),
    # self-loop node + isolated node
    ([(0, 0), (0, 1)], [7]),
    # nested: 2-cycle inside a structure reaching another 2-cycle
    ([(1, 2), (2, 1), (2, 3), (3, 4), (4, 3), (4, 5)], []),
]


@pytest.mark.parametrize("edges,nodes", CASES)
def test_scc_vs_oracle(spark, edges, nodes):
    g = graph_from_edge_names(spark, edges, nodes=nodes, directed=True)
    assert scc_sets(g) == oracle_sets(edges, nodes)


def test_number_and_is_strongly_connected(spark):
    cyc = [(i, (i + 1) % 4) for i in range(4)]
    g = graph_from_edge_names(spark, cyc, directed=True)
    assert number_strongly_connected_components(g) == 1
    assert is_strongly_connected(g)
    dag = graph_from_edge_names(spark, [(0, 1)], directed=True)
    assert not is_strongly_connected(dag)


def test_condensation_edges(spark):
    edges = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2)]
    g = graph_from_edge_names(spark, edges, directed=True)
    nm = {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}
    scc = {r["id"]: r["component"] for r in strongly_connected_components(g).collect()}
    ce = {(r["src"], r["dst"]) for r in condensation_edges(g).collect()}
    # exactly one condensation edge: {0,1} -> {2,3}
    assert len(ce) == 1
    (s, d), = ce
    assert {nm[i] for i, c in scc.items() if c == s} == {"0", "1"}
    assert {nm[i] for i, c in scc.items() if c == d} == {"2", "3"}
