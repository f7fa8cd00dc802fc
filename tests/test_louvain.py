"""Louvain community detection — quality/invariant tests.

The reference's sequential random-order schedule is not reproducible
distributed (any greedy-modularity local optimum is valid, exactly
the LPA situation), so tests assert: the output is a valid partition,
modularity is close to nx.louvain_communities' on the same graph, and
planted community structure is recovered.
"""

import networkx as nx
import pytest

from linkgraph.graph import graph_from_edge_names
from linkgraph.operators.louvain import louvain_communities


def partition_of(g, df):
    rows = df.collect()
    part = {}
    for r in rows:
        part.setdefault(r["community"], set()).add(r["id"])
    ids = {r["id"] for r in rows}
    return part, ids


def nx_modularity(G, part):
    return nx.community.modularity(G, list(part.values()))


def to_nx_partition(g, df):
    nm = {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}
    part = {}
    for r in df.collect():
        part.setdefault(r["community"], set()).add(nm[r["id"]])
    return part


def test_louvain_karate_quality(spark):
    G0 = nx.karate_club_graph()
    G = nx.relabel_nodes(G0, {n: str(n) for n in G0.nodes})
    g = graph_from_edge_names(spark, list(G0.edges()), directed=False)
    out = louvain_communities(g)
    part = to_nx_partition(g, out)
    # valid partition over all nodes
    allmem = [n for s in part.values() for n in s]
    assert sorted(allmem) == sorted(G.nodes)
    q = nx_modularity(G, part)
    ref = nx.community.modularity(
        G, nx.community.louvain_communities(G, seed=1)
    )
    # within 0.08 modularity of the reference heuristic, and clearly
    # better than the trivial singleton partition (q=~-0.05)
    assert q > ref - 0.08, (q, ref)
    assert 2 <= len(part) <= 8


def test_louvain_planted_partition_recovered(spark):
    # two dense cliques joined by one edge -> must split into >= 2
    # communities separating the cliques
    edges = (
        [(a, b) for a in range(6) for b in range(a + 1, 6)]
        + [(a, b) for a in range(10, 16) for b in range(a + 1, 16)]
        + [(5, 10)]
    )
    g = graph_from_edge_names(spark, edges, directed=False)
    nm = {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}
    comm = {nm[r["id"]]: r["community"] for r in louvain_communities(g).collect()}
    left = {comm[str(n)] for n in range(6)}
    right = {comm[str(n)] for n in range(10, 16)}
    assert len(left) == 1 and len(right) == 1
    assert left != right


def test_louvain_random_vs_nx_modularity(spark):
    G0 = nx.gnp_random_graph(60, 0.08, seed=21)
    G = nx.relabel_nodes(G0, {n: str(n) for n in G0.nodes})
    g = graph_from_edge_names(
        spark, list(G0.edges()), nodes=list(G0.nodes), directed=False
    )
    part = to_nx_partition(g, louvain_communities(g))
    q = nx_modularity(G, part)
    ref = nx.community.modularity(
        G, nx.community.louvain_communities(G, seed=3)
    )
    assert q > ref - 0.12, (q, ref)


def test_louvain_distributed_path_planted(spark):
    # force the superstep path (local_max_edges=0): the two planted
    # cliques must still separate and the loop must terminate
    edges = (
        [(a, b) for a in range(6) for b in range(a + 1, 6)]
        + [(a, b) for a in range(10, 16) for b in range(a + 1, 16)]
        + [(5, 10)]
    )
    g = graph_from_edge_names(spark, edges, directed=False)
    nm = {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}
    out = louvain_communities(
        g, local_max_edges=0, max_rounds_per_level=6, max_levels=3
    )
    comm = {nm[r["id"]]: r["community"] for r in out.collect()}
    left = {comm[str(n)] for n in range(6)}
    right = {comm[str(n)] for n in range(10, 16)}
    assert len(left) == 1 and len(right) == 1
    assert left != right


def test_louvain_rejects_directed(spark):
    g = graph_from_edge_names(spark, [(0, 1)], directed=True)
    with pytest.raises(ValueError):
        louvain_communities(g)


def test_louvain_isolated_nodes_kept(spark):
    g = graph_from_edge_names(
        spark, [(0, 1), (1, 2)], nodes=[0, 1, 2, 9], directed=False
    )
    out = louvain_communities(g)
    assert out.count() == 4
