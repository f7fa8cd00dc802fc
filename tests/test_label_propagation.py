"""Ported LPA suite (networkx/algorithms/community/tests/
test_label_propagation.py) — fixtures L1-L4 of FIXTURES.md."""

import networkx as nx
import pytest

from linkgraph.graph import graph_from_edge_names, graph_from_pages
from linkgraph.operators.label_propagation import (
    communities,
    greedy_coloring,
    label_propagation_communities,
)
from linkgraph.sources import corpus


def named_communities(graph, **kw):
    id_to_name = {r["id"]: r["url"].rsplit("/", 1)[-1] for r in graph.vertices.collect()}
    return {frozenset(id_to_name[i] for i in c) for c in communities(graph, **kw)}


def test_l1_two_triangles(spark):
    # edges ac,ad,dc,be,ef,fb -> exactly {{a,c,d},{b,e,f}}
    edges = [("a", "c"), ("a", "d"), ("d", "c"), ("b", "e"), ("e", "f"), ("f", "b")]
    pages = corpus.pages_df(spark, "l1", edges)
    g = graph_from_pages(pages, directed=False)
    got = named_communities(g)
    assert got == {frozenset("acd"), frozenset("bef")}


def test_l2_two_cliques_multiple_truths(spark):
    # two K5s + bridge (a,1), pair (x,y), isolated z
    c1 = list("abcde")
    c2 = ["1", "2", "3", "4", "5"]
    edges = (
        [(u, v) for i, u in enumerate(c1) for v in c1[i + 1:]]
        + [(u, v) for i, u in enumerate(c2) for v in c2[i + 1:]]
        + [("a", "1"), ("x", "y")]
    )
    g = graph_from_edge_names(spark, edges, nodes=["z"], directed=False)
    got = named_communities(g)
    accepted = [
        {frozenset(c1), frozenset(c2), frozenset("xy"), frozenset("z")},
        {frozenset(c1 + c2), frozenset("xy"), frozenset("z")},
    ]
    assert got in accepted


def test_l3_singletons_and_directed_raises(spark):
    g = graph_from_edge_names(spark, [], nodes=["a"], directed=False)
    assert named_communities(g) == {frozenset("a")}
    gd = graph_from_edge_names(spark, [("a", "b")], directed=True)
    with pytest.raises(ValueError):
        label_propagation_communities(gd)


def test_l4_termination_karate(spark):
    kg = nx.karate_club_graph()
    edges = [(f"{u:02d}", f"{v:02d}") for u, v in kg.edges()]
    g = graph_from_edge_names(spark, edges, directed=False)
    got = named_communities(g)
    # must terminate and be a partition of all 34 nodes
    all_nodes = set().union(*got)
    assert all_nodes == {f"{n:02d}" for n in kg.nodes()}
    assert sum(len(c) for c in got) == 34
    # communities must be internally connected
    for c in got:
        sub = kg.subgraph(int(n) for n in c)
        assert nx.is_connected(sub)


def test_l4_caveman_termination(spark):
    cg = nx.caveman_graph(2, 10)
    cg.add_edges_from([(0, 20), (20, 10)])
    # node "20" doesn't exist in caveman(2,10) (nodes 0..19) — nx test
    # adds it as a bridge node; replicate exactly
    edges = [(f"{u:02d}", f"{v:02d}") for u, v in cg.edges()]
    g = graph_from_edge_names(spark, edges, directed=False)
    got = named_communities(g)
    assert sum(len(c) for c in got) == len(cg.nodes())


def test_coloring_is_proper(spark):
    kg = nx.karate_club_graph()
    edges = [(f"{u:02d}", f"{v:02d}") for u, v in kg.edges()]
    g = graph_from_edge_names(spark, edges, directed=False)
    from pyspark.sql import functions as F

    sym = g.symmetrized_edges().select("src", "dst").distinct()
    col = greedy_coloring(sym, g.vertices.select("id"))
    # every node colored, no adjacent pair shares a color
    assert col.where(F.col("color").isNull()).count() == 0
    bad = (
        sym.join(col.withColumnRenamed("id", "src").withColumnRenamed("color", "c1"), "src")
        .join(col.withColumnRenamed("id", "dst").withColumnRenamed("color", "c2"), "dst")
        .where(F.col("c1") == F.col("c2"))
        .count()
    )
    assert bad == 0


def test_l1_distributed_path(spark):
    """Force the distributed JP-coloring sweep loop (local_max_edges=0)
    on L1 — must converge to the same two-triangle split."""
    edges = [("a", "c"), ("a", "d"), ("d", "c"), ("b", "e"), ("e", "f"), ("f", "b")]
    pages = corpus.pages_df(spark, "l1d", edges)
    g = graph_from_pages(pages, directed=False)
    got = named_communities(g, local_max_edges=0)
    assert got == {frozenset("acd"), frozenset("bef")}


def test_l4_karate_distributed_path(spark):
    kg = nx.karate_club_graph()
    edges = [(f"{u:02d}", f"{v:02d}") for u, v in kg.edges()]
    g = graph_from_edge_names(spark, edges, directed=False)
    got = named_communities(g, local_max_edges=0)
    assert sum(len(c) for c in got) == 34
    for c in got:
        sub = kg.subgraph(int(n) for n in c)
        assert nx.is_connected(sub)


def test_greedy_coloring_pluggable_priority(spark):
    """The strategy seam (reference greedy_color(strategy=...)): a
    custom priority still yields a PROPER coloring, and the id-order
    priority reproduces deterministic largest-id-first behavior."""
    from pyspark.sql import functions as F

    from linkgraph.operators.label_propagation import greedy_coloring

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    g = graph_from_edge_names(spark, edges, directed=False)
    sym = g.symmetrized_edges().select("src", "dst")
    verts = g.vertices.select("id")

    for prio in (None, lambda c: F.col(c)):  # default hash vs plain id
        colors = {
            r["id"]: r["color"]
            for r in greedy_coloring(sym, verts, priority=prio).collect()
        }
        nm = {r["url"].rsplit("/", 1)[-1]: r["id"] for r in g.vertices.collect()}
        for u, v in edges:
            assert colors[nm[str(u)]] != colors[nm[str(v)]]
        # triangle 0-1-2 forces >= 3 colors
        assert len({colors[nm[s]] for s in "012"}) == 3


def _is_lpa_fixpoint(rows, edges_by_name, name_of):
    """Every node's label must be in its neighborhood argmax set —
    the LPA termination contract (label_propagation.py:331-338)."""
    from collections import Counter, defaultdict

    lab = {name_of[r["id"]]: r["label"] for r in rows}
    adj = defaultdict(set)
    for u, v in edges_by_name:
        adj[str(u)].add(str(v))
        adj[str(v)].add(str(u))
    for n, nbrs in adj.items():
        freq = Counter(lab[u] for u in nbrs)
        if freq and freq.get(lab[n], 0) != max(freq.values()):
            return False
    return True


def test_distributed_and_local_both_reach_fixpoints(spark):
    """The local fast path and the forced distributed superstep path
    use different (both deterministic) update schedules, so converged
    labels may name different VALID labelings (documented at
    label_propagation.py LOCAL_LPA_MAX_EDGES). The contract both must
    satisfy: a Prec-Max fixpoint, with unambiguous components (the
    triangle) labeled as single communities — this is the check behind
    the rows-only q_lpa_nation_chains_dist entry twin."""
    # chains + a ring: the nation_chain_graph shape at toy scale
    edges = [(i, i + 1) for i in range(0, 9)]          # 10-node chain
    edges += [(100 + i, 100 + (i + 1) % 7) for i in range(7)]  # 7-ring
    edges += [(200, 201), (201, 202), (202, 200)]      # triangle
    g = graph_from_edge_names(spark, edges, directed=False)
    name_of = {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}
    for kw in ({}, {"local_max_edges": 0}):
        rows = label_propagation_communities(g, **kw).collect()
        assert _is_lpa_fixpoint(rows, edges, name_of), kw
        tri = {r["label"] for r in rows if name_of[r["id"]] in {"200", "201", "202"}}
        assert len(tri) == 1, kw


def _is_weighted_lpa_fixpoint(rows, edges_w, name_of):
    """Weighted termination contract: each node's label attains the
    MAX weighted neighbor vote (an edge of weight w counts as w
    parallel edges — label_propagation.py:41-45,216)."""
    from collections import defaultdict

    lab = {name_of[r["id"]]: r["label"] for r in rows}
    adj = defaultdict(lambda: defaultdict(float))
    for u, v, w in edges_w:
        adj[str(u)][str(v)] += w
        adj[str(v)][str(u)] += w
    for n, nbrs in adj.items():
        votes = defaultdict(float)
        for u, w in nbrs.items():
            votes[lab[u]] += w
        if votes and votes.get(lab[n], 0.0) != max(votes.values()):
            return False
    return True


def test_weighted_lpa_bridge_outvotes_clique(spark):
    """Two K4s joined by one bridge of weight 10: the bridge endpoint's
    3 unit intra-clique votes lose to the weight-10 cross vote, so in
    EVERY valid weighted fixpoint the two bridge endpoints share a
    label — the discriminator weighted votes add over unweighted
    (where the same node keeps its clique's label, 3 > 1)."""
    c1, c2 = ["a", "b", "c", "d"], ["p", "q", "r", "s"]
    edges = (
        [(u, v, 1.0) for i, u in enumerate(c1) for v in c1[i + 1:]]
        + [(u, v, 1.0) for i, u in enumerate(c2) for v in c2[i + 1:]]
        + [("d", "p", 10.0)]
    )
    g = graph_from_edge_names(spark, edges, directed=False)
    name_of = {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}
    rows = label_propagation_communities(g, weight="weight").collect()
    assert _is_weighted_lpa_fixpoint(rows, edges, name_of)
    lab = {name_of[r["id"]]: r["label"] for r in rows}
    assert lab["d"] == lab["p"]
    # the light cliques keep coherent communities
    assert len({lab[x] for x in "abc"}) == 1
    assert len({lab[x] for x in "qrs"}) == 1


def test_weighted_lpa_unit_weights_match_unweighted(spark):
    """weight= with an all-ones column must reproduce the unweighted
    distributed run exactly (sum(1.0) == count(*) vote for vote, same
    schedule)."""
    edges = [(i, i + 1, 1.0) for i in range(0, 9)]
    edges += [(100 + i, 100 + (i + 1) % 7, 1.0) for i in range(7)]
    edges += [(200, 201, 1.0), (201, 202, 1.0), (202, 200, 1.0)]
    g = graph_from_edge_names(spark, edges, directed=False)
    unw = {
        r["id"]: r["label"]
        for r in label_propagation_communities(g, local_max_edges=0).collect()
    }
    wtd = {
        r["id"]: r["label"]
        for r in label_propagation_communities(g, weight="weight").collect()
    }
    assert unw == wtd


def test_weighted_lpa_random_fixpoint_and_parallel_edges(spark):
    """Seeded random weighted graph: result is a valid weighted
    Prec-Max fixpoint; duplicate (u,v) rows vote additively (the
    multigraph rule)."""
    import random

    rng = random.Random(17)
    n = 30
    edges = []
    for u in range(n):
        for _ in range(3):
            v = rng.randrange(n)
            if v != u:
                edges.append((u, v, float(rng.randint(1, 5))))
    g = graph_from_edge_names(spark, edges, directed=False)
    name_of = {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}
    rows = label_propagation_communities(g, weight="weight").collect()
    assert _is_weighted_lpa_fixpoint(rows, edges, name_of)


def test_weighted_lpa_directed_raises(spark):
    g = graph_from_edge_names(spark, [(1, 2, 3.0)], directed=True)
    with pytest.raises(ValueError):
        label_propagation_communities(g, weight="weight")
