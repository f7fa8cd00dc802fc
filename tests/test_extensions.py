"""Extension operators beyond the four north-rule algorithms: HITS,
k-core, BFS layers — each checked against the live networkx oracle
(same-substrate extensions listed in SURVEY.md §2.10)."""

import networkx as nx
import pytest

from networkx.algorithms.link_analysis.hits_alg import _hits_python

from pyspark.sql import functions as F

from linkgraph.graph import graph_from_edge_names
from linkgraph.operators.core import core_number, k_core
from linkgraph.operators.hits import hits
from linkgraph.operators.traversal import bfs_layers, descendants_at_distance
from linkgraph.plans.loop import PowerIterationFailedConvergence

from nx_oracle import nx_graph


def names(g):
    return {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}


# ----------------------------------------------------------------- HITS
HITS_EDGES = [(1, 3), (1, 5), (2, 1), (3, 5), (5, 4), (5, 3), (6, 5)]


def test_hits_vs_oracle_directed(spark):
    g = graph_from_edge_names(spark, HITS_EDGES, directed=True)
    got = hits(g, tol=1e-10)
    nm = names(g)
    hub = {nm[r["id"]]: r["hub"] for r in got.collect()}
    auth = {nm[r["id"]]: r["authority"] for r in got.collect()}
    oh, oa = _hits_python(nx_graph(HITS_EDGES, directed=True), tol=1e-10)
    for k, v in oh.items():
        assert hub[str(k)] == pytest.approx(v, abs=1e-6)
    for k, v in oa.items():
        assert auth[str(k)] == pytest.approx(v, abs=1e-6)


def test_hits_undirected_path(spark):
    edges = [(0, 1), (1, 2), (2, 3)]
    g = graph_from_edge_names(spark, edges, directed=False)
    got = hits(g, tol=1e-10)
    nm = names(g)
    hub = {nm[r["id"]]: r["hub"] for r in got.collect()}
    oh, _ = _hits_python(nx_graph(edges, directed=False), tol=1e-10)
    for k, v in oh.items():
        assert hub[str(k)] == pytest.approx(v, abs=1e-6)


def test_hits_nonconvergence_raises(spark):
    g = graph_from_edge_names(spark, HITS_EDGES, directed=True)
    with pytest.raises(PowerIterationFailedConvergence):
        hits(g, max_iter=0)


# --------------------------------------------------------------- k-core
CORE_EDGES = list(nx.karate_club_graph().edges())


def test_k_core_vs_oracle(spark):
    g = graph_from_edge_names(spark, CORE_EDGES, directed=False)
    nm = names(g)
    for k in (2, 3, 4):
        sub = k_core(g, k)
        got_nodes = {nm[r["id"]] for r in sub.vertices.collect()}
        ref = nx.k_core(nx_graph(CORE_EDGES), k)
        assert got_nodes == {str(n) for n in ref.nodes}
        assert sub.edges.count() == ref.number_of_edges()


def test_core_number_vs_oracle(spark):
    g = graph_from_edge_names(spark, CORE_EDGES, directed=False)
    nm = names(g)
    got = {nm[r["id"]]: r["core"] for r in core_number(g).collect()}
    ref = nx.core_number(nx_graph(CORE_EDGES))
    assert got == {str(k): v for k, v in ref.items()}


# ------------------------------------------------------------------ BFS
def test_bfs_layers_vs_oracle(spark):
    edges = [(0, 1), (1, 2), (2, 3), (0, 4), (4, 5), (9, 9)]
    g = graph_from_edge_names(spark, edges, nodes=[7], directed=False)
    nm = names(g)
    src = next(i for i, n in nm.items() if n == "0")
    got = {nm[r["id"]]: r["layer"] for r in bfs_layers(g, [src]).collect()}
    ref = {str(n): d for layer_nodes in
           enumerate(nx.bfs_layers(nx_graph(edges, nodes=[7]), 0))
           for d, ns in [layer_nodes] for n in ns}
    assert got == ref
    assert "7" not in got and "9" not in got  # unreachable absent


def test_bfs_directed_respects_direction(spark):
    edges = [(0, 1), (1, 2), (3, 0)]
    g = graph_from_edge_names(spark, edges, directed=True)
    nm = names(g)
    src = next(i for i, n in nm.items() if n == "0")
    got = {nm[r["id"]]: r["layer"] for r in bfs_layers(g, [src]).collect()}
    assert got == {"0": 0, "1": 1, "2": 2}  # 3 unreachable forward


def test_descendants_at_distance(spark):
    edges = [(0, 1), (1, 2), (0, 3), (3, 4), (2, 4)]
    g = graph_from_edge_names(spark, edges, directed=False)
    nm = names(g)
    src = next(i for i, n in nm.items() if n == "0")
    got = {nm[r["id"]] for r in descendants_at_distance(g, src, 2).collect()}
    ref = nx.descendants_at_distance(nx_graph(edges), 0, 2)
    assert got == {str(n) for n in ref}


def test_k_core_zero_keeps_isolates(spark):
    """nx.k_core(G, 0) is the whole graph, isolates included
    (ADVICE r1 item 4)."""
    g = graph_from_edge_names(
        spark, [(0, 1), (1, 2)], nodes=[9], directed=False
    )
    sub = k_core(g, 0)
    assert sub.vertices.count() == 4
    assert sub.edges.count() == 2


def test_core_number_path_and_isolate(spark):
    """h-index iteration handles the slow-convergence path shape and
    assigns core 0 to isolates."""
    edges = [(i, i + 1) for i in range(12)]
    g = graph_from_edge_names(spark, edges, nodes=[99], directed=False)
    nm = names(g)
    got = {nm[r["id"]]: r["core"] for r in core_number(g).collect()}
    ref = nx.core_number(nx_graph(edges))
    ref["99"] = 0
    assert got == {str(k): v for k, v in ref.items()}
