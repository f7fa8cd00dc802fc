"""Property-based parity: hypothesis-generated random graphs checked
against live networkx for the core operator family. Small graphs,
bounded example counts — the point is adversarial STRUCTURE (self
loops, parallel edges, isolates, disconnected pieces), not scale."""

import networkx as nx
import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from linkgraph.graph import LinkGraph
from linkgraph.operators.components import connected_components
from linkgraph.operators.degrees import degrees
from linkgraph.operators.triangles import triangles

edge_lists = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),
    min_size=0,
    max_size=18,
)

N = 10
_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _g(spark, edges):
    e = spark.createDataFrame(
        [(a, b, None) for a, b in edges] or [],
        "src long, dst long, weight double",
    )
    v = spark.createDataFrame([(i,) for i in range(N)], "id long")
    return LinkGraph(vertices=v, edges=e, directed=False)


def _G(edges):
    G = nx.Graph()
    G.add_nodes_from(range(N))
    G.add_edges_from(edges)
    return G


@settings(**_SETTINGS)
@given(edge_lists)
def test_cc_partition_matches_nx(spark, edges):
    g = _g(spark, edges)
    got = {}
    for r in connected_components(g).collect():
        got.setdefault(r["component"], set()).add(r["id"])
    want = {frozenset(c) for c in nx.connected_components(_G(edges))}
    assert {frozenset(c) for c in got.values()} == want


@settings(**_SETTINGS)
@given(edge_lists)
def test_degrees_match_nx_multigraph(spark, edges):
    # edge rows are parallel edges (multigraph semantics, SURVEY §1.2)
    # — the right oracle is nx.MultiGraph, not nx.Graph
    g = _g(spark, edges)
    got = {r["id"]: int(r["degree"]) for r in degrees(g).collect()}
    G = nx.MultiGraph()
    G.add_nodes_from(range(N))
    G.add_edges_from(edges)
    assert got == dict(G.degree())


@settings(**_SETTINGS)
@given(edge_lists)
def test_triangles_match_nx(spark, edges):
    g = _g(spark, edges)
    got = {r["id"]: r["triangles"] for r in triangles(g).collect()}
    assert got == nx.triangles(_G(edges))


def _dg(spark, edges):
    e = spark.createDataFrame(
        [(a, b, None) for a, b in edges] or [],
        "src long, dst long, weight double",
    )
    v = spark.createDataFrame([(i,) for i in range(N)], "id long")
    return LinkGraph(vertices=v, edges=e, directed=True)


def _DG(edges):
    G = nx.DiGraph()
    G.add_nodes_from(range(N))
    G.add_edges_from(edges)
    return G


@given(edges=edge_lists)
@settings(**_SETTINGS)
def test_transitive_closure_matches_nx(spark, edges):
    from linkgraph.operators.dag import transitive_closure

    got = {
        (r["src"], r["dst"]) for r in transitive_closure(_dg(spark, edges)).collect()
    }
    want = set(nx.transitive_closure(_DG(edges)).edges())
    assert got == want


@given(edges=edge_lists)
@settings(**_SETTINGS)
def test_longest_path_lengths_match_nx_on_dags(spark, edges):
    from linkgraph.operators.dag import GraphContainsCycle, longest_path_lengths

    dag_edges = [(a, b) for a, b in edges if a < b]  # forced acyclic
    got = {
        r["id"]: r["dist"]
        for r in longest_path_lengths(_dg(spark, dag_edges)).collect()
    }
    G = _DG(dag_edges)
    dist = {v: 0 for v in G.nodes}
    for v in nx.topological_sort(G):
        for u in G.predecessors(v):
            dist[v] = max(dist[v], dist[u] + 1)
    assert got == {k: float(v) for k, v in dist.items()}


@given(edges=edge_lists)
@settings(**_SETTINGS)
def test_attracting_components_match_nx(spark, edges):
    from linkgraph.operators.strongly_connected import attracting_components

    got = {}
    for r in attracting_components(_dg(spark, edges)).collect():
        got.setdefault(r["component"], set()).add(r["id"])
    want = [set(c) for c in nx.attracting_components(_DG(edges))]
    assert sorted(map(sorted, got.values())) == sorted(map(sorted, want))


@given(edges=edge_lists)
@settings(**_SETTINGS)
def test_voronoi_assignments_are_nearest(spark, edges):
    from linkgraph.operators.traversal import voronoi_cells

    centers = [0, 5]
    G = _G(edges)
    dist = {c: nx.single_source_shortest_path_length(G, c) for c in centers}
    rows = voronoi_cells(_g(spark, edges), centers).collect()
    seen = set()
    big = 10**9
    for r in rows:
        v, c, d = r["id"], r["center"], r["dist"]
        seen.add(v)
        best = min(dist[cc].get(v, big) for cc in centers)
        assert d == best and dist[c].get(v, big) == best
        assert c == min(cc for cc in centers if dist[cc].get(v, big) == best)
    assert seen == {v for cc in centers for v in dist[cc]}


@settings(**_SETTINGS)
@given(edge_lists)
def test_core_number_matches_nx(spark, edges):
    """Montresor h-index loop (round-3 histogram form, no window) vs
    nx.core_number on adversarial structure. nx raises on self loops;
    the engine's canonical simple-graph projection drops them, so
    strip them from both sides."""
    from linkgraph.operators.core import core_number

    simple = [(a, b) for a, b in edges if a != b]
    g = _g(spark, simple)
    got = {r["id"]: r["core"] for r in core_number(g).collect()}
    want = nx.core_number(_G(simple))
    assert got == want


@settings(**_SETTINGS)
@given(edge_lists, st.integers(0, 2))
def test_lpa_distributed_reaches_prec_max_fixpoint(spark, edges, warmup):
    """The Luby-accept distributed LPA (round-3 rewrite) must land on
    a VALID Prec-Max fixpoint on adversarial structure for any warmup
    depth: every node's label has maximal frequency in its
    neighborhood (label_propagation.py:297-307 _labeling_complete),
    isolated nodes keep their own label, and communities partition
    the vertex set. WHICH fixpoint is schedule-dependent (docstring),
    so parity is on the invariant, not the labeling."""
    from collections import Counter

    from linkgraph.operators.label_propagation import (
        label_propagation_communities,
    )

    simple = [(a, b) for a, b in edges if a != b]
    g = _g(spark, simple)
    rows = label_propagation_communities(
        g, local_max_edges=0, warmup_rounds=warmup
    ).collect()
    lab = {r["id"]: r["label"] for r in rows}
    assert set(lab) == set(range(N))  # total labeling, isolates included
    G = _G(simple)
    for u in range(N):
        nbrs = [v for v in G[u] if v != u]
        if not nbrs:
            assert lab[u] == u  # label_propagation.py:318
            continue
        freq = Counter(lab[v] for v in nbrs)
        assert freq[lab[u]] == max(freq.values()), (u, lab[u], dict(freq))
