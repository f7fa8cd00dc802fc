"""Maximal matching / vertex cover, local bridges, s-metric,
rich-club coefficient, node2vec walks — checked against the live
networkx oracle or their defining invariants."""

import networkx as nx
import pytest

from linkgraph.graph import graph_from_edge_names
from linkgraph.operators.matching import maximal_matching, vertex_cover_approx
from linkgraph.operators.structural import (
    local_bridges,
    rich_club_coefficient,
    s_metric,
)
from linkgraph.operators.walks import node2vec_walks

KARATE = list(nx.karate_club_graph().edges())


def names(g):
    return {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}


# ------------------------------------------------------------- matching
def test_maximal_matching_is_valid_and_maximal(spark):
    g = graph_from_edge_names(spark, KARATE, directed=False)
    m = maximal_matching(g).collect()
    matched = [(r["src"], r["dst"]) for r in m]
    endpoints = [v for e in matched for v in e]
    # valid: no vertex matched twice
    assert len(endpoints) == len(set(endpoints))
    # maximal: every graph edge touches a matched vertex
    nm = names(g)
    name_matched = {nm[v] for v in endpoints}
    for u, v in KARATE:
        assert str(u) in name_matched or str(v) in name_matched, (u, v)


def test_maximal_matching_deterministic(spark):
    g = graph_from_edge_names(spark, KARATE, directed=False)
    a = sorted((r["src"], r["dst"]) for r in maximal_matching(g, seed=7).collect())
    b = sorted((r["src"], r["dst"]) for r in maximal_matching(g, seed=7).collect())
    assert a == b


def test_vertex_cover_covers_all_edges(spark):
    g = graph_from_edge_names(spark, KARATE, directed=False)
    cover = {
        r["id"] for r in vertex_cover_approx(g).collect() if r["in_cover"]
    }
    nm = names(g)
    cov_names = {nm[v] for v in cover}
    for u, v in KARATE:
        assert str(u) in cov_names or str(v) in cov_names
    # 2-approximation bound vs the optimal cover size (karate LP bound:
    # any cover needs >= matching size; ours is exactly 2x a matching)
    assert len(cover) % 2 == 0


def test_matching_empty_graph(spark):
    g = graph_from_edge_names(spark, [(1, 2)], directed=False)
    sub = g.__class__(
        vertices=g.vertices, edges=g.edges.where("src <> src"), directed=False
    )
    assert maximal_matching(sub).count() == 0
    rows = vertex_cover_approx(sub).collect()
    assert rows and all(not r["in_cover"] for r in rows)


# -------------------------------------------------------- local bridges
def test_local_bridges_vs_nx(spark):
    g = graph_from_edge_names(spark, KARATE, directed=False)
    nm = names(g)
    got = {
        tuple(sorted((int(nm[r["src"]]), int(nm[r["dst"]]))))
        for r in local_bridges(g).collect()
    }
    want = {
        tuple(sorted(e))
        for e in nx.local_bridges(nx.Graph(KARATE), with_span=False)
    }
    assert got == want


def test_local_bridges_path_graph_all_bridges(spark):
    edges = [(0, 1), (1, 2), (2, 3)]
    g = graph_from_edge_names(spark, edges, directed=False)
    assert local_bridges(g).count() == 3


# ------------------------------------------------------------- s-metric
def test_s_metric_vs_nx(spark):
    g = graph_from_edge_names(spark, KARATE, directed=False)
    got = s_metric(g).collect()[0]["s_metric"]
    G = nx.Graph(KARATE)
    want = float(sum(G.degree(u) * G.degree(v) for u, v in G.edges()))
    assert got == pytest.approx(want)


# ------------------------------------------------------------ rich club
def test_rich_club_vs_nx(spark):
    g = graph_from_edge_names(spark, KARATE, directed=False)
    got = {r["k"]: r["phi"] for r in rich_club_coefficient(g).collect()}
    want = nx.rich_club_coefficient(nx.Graph(KARATE), normalized=False)
    assert set(got) == set(want)
    for k, phi in want.items():
        assert got[k] == pytest.approx(phi), k


# --------------------------------------------------------- dominating set
def test_dominating_set_dominates(spark):
    from linkgraph.operators.independent_set import dominating_set

    g = graph_from_edge_names(spark, KARATE, directed=False)
    inset = {r["id"] for r in dominating_set(g).collect() if r["in_set"]}
    nbrs = {}
    for r in g.symmetrized_edges().collect():
        nbrs.setdefault(r["src"], set()).add(r["dst"])
    for r in g.vertices.collect():
        v = r["id"]
        assert v in inset or (nbrs.get(v, set()) & inset), v


# -------------------------------------------------------------- node2vec
def test_node2vec_return_bias_bounces(spark):
    # triangle 0-1-2; only the return weight is positive, so from step 2
    # on, the walk must bounce between the first two positions.
    edges = [(0, 1), (1, 2), (2, 0)]
    g = graph_from_edge_names(spark, edges, directed=False)
    walks = node2vec_walks(
        g, walk_length=4, w_return=1, w_common=0, w_explore=0, seed=3
    ).collect()
    by_walk = {}
    for r in walks:
        by_walk.setdefault(r["walk"], {})[r["step"]] = r["node"]
    for _, steps in by_walk.items():
        assert len(steps) == 5
        for s in range(2, 5):
            assert steps[s] == steps[s - 2], steps


def test_node2vec_common_bias_closes_triangles(spark):
    # triangle 0-1-2 plus pendant 1-3; only the common-neighbor weight
    # is positive, so from any (prev, cur) on the triangle the walk
    # must move to the third triangle vertex.
    edges = [(0, 1), (1, 2), (2, 0), (1, 3)]
    g = graph_from_edge_names(spark, edges, directed=False)
    nm = names(g)
    start = [k for k, v in nm.items() if v == "0"]
    starts = g.vertices.where(g.vertices["id"] == start[0]).select("id")
    walks = node2vec_walks(
        g, walk_length=3, w_return=0, w_common=1, w_explore=0,
        seed=5, starts=starts,
    ).collect()
    seq = {r["step"]: nm[r["node"]] for r in walks}
    tri = {"0", "1", "2"}
    assert seq[0] == "0"
    for s in range(2, 4):
        # the third vertex of the triangle formed with the two previous
        assert seq[s] == (tri - {seq[s - 1], seq[s - 2]}).pop(), seq


def test_node2vec_walks_are_paths_and_deterministic(spark):
    g = graph_from_edge_names(spark, KARATE, directed=False)
    out1 = sorted(
        (r["walk"], r["step"], r["node"])
        for r in node2vec_walks(
            g, walk_length=5, w_return=1, w_common=4, w_explore=2, seed=9
        ).collect()
    )
    out2 = sorted(
        (r["walk"], r["step"], r["node"])
        for r in node2vec_walks(
            g, walk_length=5, w_return=1, w_common=4, w_explore=2, seed=9
        ).collect()
    )
    assert out1 == out2
    # every consecutive pair is an edge of the symmetrized graph
    eset = {(r["src"], r["dst"]) for r in g.symmetrized_edges().collect()}
    by_walk = {}
    for w, s, n in out1:
        by_walk.setdefault(w, {})[s] = n
    for steps in by_walk.values():
        for s in range(1, max(steps)):
            assert (steps[s], steps[s + 1]) in eset


# ------------------------------------------------- bitset multi-source BFS
def test_bitset_msbfs_matches_layers(spark):
    from linkgraph.operators.traversal import (
        multi_source_bfs_counts,
        multi_source_bfs_layers,
    )

    g = graph_from_edge_names(spark, KARATE, directed=False)
    srcs = [r["id"] for r in g.vertices.limit(7).collect()]
    ref = (
        multi_source_bfs_layers(g, srcs)
        .groupBy("id", "layer")
        .count()
        .collect()
    )
    want = {(r["id"], r["layer"]): r["count"] for r in ref}
    got = {
        (r["id"], r["layer"]): r["n_src"]
        for r in multi_source_bfs_counts(g, srcs).collect()
    }
    assert got == want


def test_bitset_msbfs_70_sources_directed(spark):
    # >64 sources exercises the multi-word path on a directed graph
    from linkgraph.operators.traversal import (
        multi_source_bfs_counts,
        multi_source_bfs_layers,
    )

    edges = [(i, (i + 1) % 90) for i in range(90)] + [(i, (i * 7) % 90) for i in range(90)]
    g = graph_from_edge_names(spark, edges, directed=True)
    srcs = [r["id"] for r in g.vertices.limit(70).collect()]
    ref = (
        multi_source_bfs_layers(g, srcs)
        .groupBy("id", "layer")
        .count()
        .collect()
    )
    want = {(r["id"], r["layer"]): r["count"] for r in ref}
    got = {
        (r["id"], r["layer"]): r["n_src"]
        for r in multi_source_bfs_counts(g, srcs).collect()
    }
    assert got == want


# --------------------------------------------------------- wiener index
def test_wiener_index_exact_when_all_sources(spark):
    from linkgraph.operators.distance_measures import wiener_index_sampled

    g = graph_from_edge_names(spark, KARATE, directed=False)
    row = wiener_index_sampled(g, [r["id"] for r in g.vertices.collect()]).collect()[0]
    want = nx.wiener_index(nx.Graph(KARATE))
    assert row["wiener_est"] == pytest.approx(want)
    assert row["dist_sum"] == int(2 * want)


# ------------------------------------------------------------ modularity
def test_modularity_vs_nx_club_partition(spark):
    from pyspark.sql import functions as F

    from linkgraph.operators.community_metrics import modularity

    G = nx.karate_club_graph()
    g = graph_from_edge_names(spark, list(G.edges()), directed=False)
    nm = names(g)
    club = {str(n): (0 if G.nodes[n]["club"] == "Mr. Hi" else 1) for n in G}
    labels = spark.createDataFrame(
        [(i, club[nm[i]]) for i in nm], "id long, label long"
    )
    got = modularity(g, labels).collect()[0]["modularity"]
    want = nx.community.modularity(
        G,
        [
            {n for n in G if G.nodes[n]["club"] == "Mr. Hi"},
            {n for n in G if G.nodes[n]["club"] != "Mr. Hi"},
        ],
        weight=None,  # the operator is the unit-weight form
    )
    assert got == pytest.approx(want)


def test_modularity_selfloop_and_singleton(spark):
    from linkgraph.graph import LinkGraph
    from linkgraph.operators.community_metrics import modularity

    edf = spark.createDataFrame(
        [(0, 1, 1.0), (1, 1, 1.0), (2, 3, 1.0)],
        "src long, dst long, weight double",
    )
    vdf = spark.createDataFrame([(i,) for i in range(4)], "id long")
    g = LinkGraph(vertices=vdf, edges=edf, directed=False)
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "id long, label long"
    )
    got = modularity(g, labels).collect()[0]["modularity"]
    G = nx.Graph([(0, 1), (1, 1), (2, 3)])
    want = nx.community.modularity(G, [{0, 1}, {2, 3}])
    assert got == pytest.approx(want)


def test_modularity_weighted_vs_nx(spark):
    from linkgraph.graph import LinkGraph
    from linkgraph.operators.community_metrics import modularity

    G = nx.karate_club_graph()  # edges carry interaction-count weights
    edf = spark.createDataFrame(
        [(u, v, float(w)) for u, v, w in G.edges(data="weight")],
        "src long, dst long, weight double",
    )
    vdf = spark.createDataFrame([(n,) for n in G], "id long")
    g = LinkGraph(vertices=vdf, edges=edf, directed=False)
    part = [
        {n for n in G if G.nodes[n]["club"] == "Mr. Hi"},
        {n for n in G if G.nodes[n]["club"] != "Mr. Hi"},
    ]
    labels = spark.createDataFrame(
        [(n, 0 if n in part[0] else 1) for n in G], "id long, label long"
    )
    got = modularity(g, labels, weighted=True).collect()[0]["modularity"]
    assert got == pytest.approx(nx.community.modularity(G, part))
