"""Biconnected components / articulation points / bridges vs the live
networkx oracle — both the single-task Hopcroft–Tarjan fast path and
the distributed Tarjan–Vishkin path (forced via local_max_edges=0)."""

import networkx as nx
import pytest

from linkgraph.graph import graph_from_edge_names
from linkgraph.operators.biconnected import (
    articulation_points,
    biconnected_components,
    bridges,
)

KARATE = list(nx.karate_club_graph().edges())
# two cycles sharing a vertex + a pendant path + an isolated edge
GADGET = [
    (0, 1), (1, 2), (2, 0),
    (2, 3), (3, 4), (4, 2),
    (4, 5), (5, 6),
    (7, 8),
]


def names(g):
    return {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}


def edge_partition(g, df):
    nm = names(g)
    blocks = {}
    for r in df.collect():
        key = (r["bc_src"], r["bc_dst"])
        a, b = nm[r["src"]], nm[r["dst"]]
        blocks.setdefault(key, set()).add((min(a, b), max(a, b)))
    return {frozenset(v) for v in blocks.values()}


def nx_edge_partition(nxg):
    out = set()
    for comp in nx.biconnected_component_edges(nxg):
        out.add(
            frozenset((min(str(u), str(v)), max(str(u), str(v))) for u, v in comp)
        )
    return out


@pytest.mark.parametrize("local_max", [200_000, 0])
def test_biconnected_karate(spark, local_max):
    g = graph_from_edge_names(spark, KARATE, directed=False)
    got = edge_partition(g, biconnected_components(g, local_max_edges=local_max))
    want = nx_edge_partition(nx.karate_club_graph())
    assert got == want


@pytest.mark.parametrize("local_max", [200_000, 0])
def test_biconnected_gadget(spark, local_max):
    g = graph_from_edge_names(spark, GADGET, directed=False)
    got = edge_partition(g, biconnected_components(g, local_max_edges=local_max))
    want = nx_edge_partition(nx.Graph(GADGET))
    assert got == want


@pytest.mark.parametrize("local_max", [200_000, 0])
def test_biconnected_random_gnm(spark, local_max):
    nxg = nx.gnm_random_graph(60, 90, seed=7)
    edges = list(nxg.edges())
    g = graph_from_edge_names(spark, edges, directed=False)
    got = edge_partition(g, biconnected_components(g, local_max_edges=local_max))
    want = nx_edge_partition(nxg)
    assert got == want


@pytest.mark.parametrize("local_max", [200_000, 0])
def test_articulation_points(spark, local_max):
    for edges, nxg in [
        (KARATE, nx.karate_club_graph()),
        (GADGET, nx.Graph(GADGET)),
        (list(nx.gnm_random_graph(50, 70, seed=3).edges()),
         nx.gnm_random_graph(50, 70, seed=3)),
    ]:
        g = graph_from_edge_names(spark, edges, directed=False)
        nm = names(g)
        got = {nm[r["id"]] for r in
               articulation_points(g, local_max_edges=local_max).collect()}
        want = {str(v) for v in nx.articulation_points(nxg)}
        assert got == want


@pytest.mark.parametrize("local_max", [200_000, 0])
def test_bridges(spark, local_max):
    for edges, nxg in [
        (GADGET, nx.Graph(GADGET)),
        (list(nx.gnm_random_graph(40, 50, seed=11).edges()),
         nx.gnm_random_graph(40, 50, seed=11)),
    ]:
        g = graph_from_edge_names(spark, edges, directed=False)
        nm = names(g)
        got = {
            frozenset((nm[r["src"]], nm[r["dst"]]))
            for r in bridges(g, local_max_edges=local_max).collect()
        }
        want = {frozenset((str(u), str(v))) for u, v in nx.bridges(nxg)}
        assert got == want


def test_biconnected_ignores_selfloops_and_duplicates(spark):
    edges = [(0, 1), (1, 2), (2, 0), (1, 1), (0, 1)]
    g = graph_from_edge_names(spark, edges, directed=False)
    got = edge_partition(g, biconnected_components(g))
    want = nx_edge_partition(nx.Graph([(0, 1), (1, 2), (2, 0)]))
    assert got == want
