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


# ---------------------------------------------------------------- CNM facade
def test_greedy_modularity_karate_nx_parity(spark):
    """Exact reference parity on karate: CNM is deterministic
    (largest-ΔQ merge, smallest-(u,v) tie-break), so the partition
    must equal nx.community.greedy_modularity_communities verbatim —
    including the largest-first output order's content."""
    from linkgraph import nxapi

    G = nx.karate_club_graph()
    want = [set(map(str, c))
            for c in nx.community.greedy_modularity_communities(G)]
    got = nxapi.greedy_modularity_communities(spark, list(G.edges()))
    assert sorted(map(sorted, got)) == sorted(map(sorted, want))
    assert sorted(len(c) for c in got) == sorted(len(c) for c in want)


def test_greedy_modularity_cutoff_best_n(spark):
    """cutoff / best_n stopping parity with the reference on karate,
    plus resolution sensitivity (higher resolution -> no fewer
    communities)."""
    from linkgraph import nxapi

    G = nx.karate_club_graph()
    edges = list(G.edges())
    for kw in ({"cutoff": 5}, {"best_n": 2}, {"cutoff": 2, "best_n": 2}):
        want = [set(map(str, c))
                for c in nx.community.greedy_modularity_communities(G, **kw)]
        got = nxapi.greedy_modularity_communities(spark, edges, **kw)
        assert sorted(map(sorted, got)) == sorted(map(sorted, want)), kw
    n_lo = len(nxapi.greedy_modularity_communities(spark, edges, resolution=0.5))
    n_hi = len(nxapi.greedy_modularity_communities(spark, edges, resolution=2.0))
    assert n_lo <= n_hi


def test_greedy_modularity_weighted_and_guards(spark):
    """Weighted parity on a small weighted fixture; directed input and
    the scale gate raise with the documented redirect."""
    from linkgraph import nxapi
    from linkgraph.operators.louvain import greedy_modularity_communities

    wedges = [("a", "b", 5.0), ("b", "c", 5.0), ("a", "c", 5.0),
              ("d", "e", 5.0), ("e", "f", 5.0), ("d", "f", 5.0),
              ("c", "d", 1.0)]
    G = nx.Graph()
    G.add_weighted_edges_from(wedges)
    want = [set(c) for c in
            nx.community.greedy_modularity_communities(G, weight="weight")]
    g = graph_from_edge_names(spark, wedges, directed=False)
    nm = {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}
    comms: dict = {}
    for r in greedy_modularity_communities(g).collect():
        comms.setdefault(r["community"], set()).add(nm[r["id"]])
    assert sorted(map(sorted, comms.values())) == sorted(map(sorted, want))

    gd = graph_from_edge_names(spark, [("a", "b")], directed=True)
    with pytest.raises(ValueError, match="undirected"):
        greedy_modularity_communities(gd)
    gu = graph_from_edge_names(spark, [("a", "b"), ("b", "c")], directed=False)
    with pytest.raises(ValueError, match="louvain_communities"):
        greedy_modularity_communities(gu, max_edges=1)


def test_greedy_modularity_isolates_and_empty(spark):
    """Isolated nodes stay singleton communities; an edgeless graph
    returns all-singletons (reference: ``if not G.size(): return
    [{n} for n in G]``)."""
    from linkgraph.operators.louvain import greedy_modularity_communities

    g = graph_from_edge_names(
        spark, [("a", "b")], nodes=["z"], directed=False
    )
    got = {r["id"]: r["community"] for r in
           greedy_modularity_communities(g).collect()}
    assert len(got) == 3
    gz = graph_from_edge_names(spark, [], nodes=["x", "y"], directed=False)
    gotz = {r["id"]: r["community"] for r in
            greedy_modularity_communities(gz).collect()}
    assert all(k == v for k, v in gotz.items()) and len(gotz) == 2
