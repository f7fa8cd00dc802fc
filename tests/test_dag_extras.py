"""DAG extras: longest path, transitive closure / reduction —
checked against the live networkx oracle (dag.py dag_longest_path /
transitive_closure / transitive_reduction)."""

import networkx as nx
import pytest

from pyspark.sql import functions as F

from linkgraph.graph import graph_from_edge_names
from linkgraph.operators.dag import (
    GraphContainsCycle,
    dag_longest_path,
    longest_path_lengths,
    transitive_closure,
    transitive_reduction,
)

from nx_oracle import nx_graph


def names(g):
    return {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}


DAG_EDGES = [
    (0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (2, 5), (5, 6), (6, 4),
    (7, 8),  # separate short component
]
W_EDGES = [(0, 1, 5.0), (0, 2, 1.0), (1, 3, 1.0), (2, 3, 2.0), (3, 4, 2.0), (2, 5, 9.0)]


def test_longest_path_lengths_vs_nx(spark):
    g = graph_from_edge_names(spark, DAG_EDGES, directed=True)
    nm = names(g)
    got = {
        nm[r["id"]]: r["dist"]
        for r in longest_path_lengths(g).collect()
    }
    G = nx_graph(DAG_EDGES, directed=True)
    # nx longest path ENDING at v = max over topological predecessors
    order = list(nx.topological_sort(G))
    dist = {v: 0 for v in order}
    for v in order:
        for u in G.predecessors(v):
            dist[v] = max(dist[v], dist[u] + 1)
    for k, v in dist.items():
        assert got[str(k)] == pytest.approx(v)


def test_dag_longest_path_unweighted(spark):
    g = graph_from_edge_names(spark, DAG_EDGES, directed=True)
    nm = names(g)
    rows = sorted(dag_longest_path(g).collect(), key=lambda r: r["pos"])
    path = [nm[r["id"]] for r in rows]
    G = nx_graph(DAG_EDGES, directed=True)
    # engine path must be a real path of maximum length
    assert len(path) - 1 == len(nx.dag_longest_path(G)) - 1
    for a, b in zip(path, path[1:]):
        assert G.has_edge(int(a), int(b))


def test_dag_longest_path_weighted(spark):
    g = graph_from_edge_names(spark, W_EDGES, directed=True)
    nm = names(g)
    lp = {nm[r["id"]]: r["dist"] for r in longest_path_lengths(g, weighted=True).collect()}
    G = nx_graph(W_EDGES, directed=True)
    best = nx.dag_longest_path_length(G, weight="weight")
    assert max(lp.values()) == pytest.approx(best)
    rows = sorted(dag_longest_path(g, weighted=True).collect(), key=lambda r: r["pos"])
    path = [int(nm[r["id"]]) for r in rows]
    w = sum(G[a][b]["weight"] for a, b in zip(path, path[1:]))
    assert w == pytest.approx(best)


def test_longest_path_cycle_raises(spark):
    g = graph_from_edge_names(spark, [(0, 1), (1, 2), (2, 0)], directed=True)
    with pytest.raises(GraphContainsCycle):
        longest_path_lengths(g)


def test_transitive_closure_vs_nx(spark):
    g = graph_from_edge_names(spark, DAG_EDGES, directed=True)
    nm = names(g)
    got = {(nm[r["src"]], nm[r["dst"]]) for r in transitive_closure(g).collect()}
    G = nx_graph(DAG_EDGES, directed=True)
    want = {(str(u), str(v)) for u, v in nx.transitive_closure(G).edges()}
    assert got == want


def test_transitive_closure_on_cycle(spark):
    # cycles: every node reaches every node INCLUDING itself via the
    # cycle — the reference emits (u, u) for any length >= 1 path
    g = graph_from_edge_names(spark, [(0, 1), (1, 2), (2, 0)], directed=True)
    nm = names(g)
    got = {(nm[r["src"]], nm[r["dst"]]) for r in transitive_closure(g).collect()}
    G = nx_graph([(0, 1), (1, 2), (2, 0)], directed=True)
    want = {(str(u), str(v)) for u, v in nx.transitive_closure(G).edges()}
    assert got == want == {(str(a), str(b)) for a in range(3) for b in range(3)}


def test_transitive_reduction_vs_nx(spark):
    extra = DAG_EDGES + [(0, 3), (0, 4), (2, 4)]  # redundant shortcuts
    g = graph_from_edge_names(spark, extra, directed=True)
    nm = names(g)
    got = {(nm[r["src"]], nm[r["dst"]]) for r in transitive_reduction(g).collect()}
    G = nx_graph(extra, directed=True)
    want = {(str(u), str(v)) for u, v in nx.transitive_reduction(G).edges()}
    assert got == want


def test_transitive_reduction_cycle_raises(spark):
    g = graph_from_edge_names(spark, [(0, 1), (1, 0)], directed=True)
    with pytest.raises(GraphContainsCycle):
        transitive_reduction(g)
