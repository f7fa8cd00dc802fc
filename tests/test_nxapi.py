"""nx-compatible facade: reference signatures in, reference-shaped
results out (dicts/sets), checked against the live networkx oracle."""

import networkx as nx
import pytest

from networkx.algorithms.link_analysis.hits_alg import _hits_python

from linkgraph import nxapi
from nx_oracle import nx_graph, oracle_pagerank

P1 = [(1, 2), (1, 3), (3, 1), (3, 2), (3, 5), (4, 5), (4, 6), (5, 4), (5, 6), (6, 4)]


def test_pagerank_facade(spark):
    got = nxapi.pagerank(spark, P1, directed=True, alpha=0.9, tol=1e-8)
    ref = oracle_pagerank(nx_graph(P1, directed=True), alpha=0.9, tol=1e-8)
    assert got.keys() == {str(k) for k in ref}
    for k, v in ref.items():
        assert got[str(k)] == pytest.approx(v, abs=1e-6)


def test_connected_components_facade(spark):
    edges = [(0, 1), (1, 2), (3, 4)]
    comps = nxapi.connected_components(spark, edges, nodes=[9])
    assert [set(c) for c in comps] == [{"0", "1", "2"}, {"3", "4"}, {"9"}]
    assert nxapi.number_connected_components(spark, edges, nodes=[9]) == 3


def test_triangles_facade(spark):
    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    got = nxapi.triangles(spark, k5)
    ref = nx.triangles(nx_graph(k5))
    assert got == {str(k): v for k, v in ref.items()}
    assert nxapi.triangles(spark, k5, nbunch=0) == ref[0]


def test_clustering_and_transitivity_facade(spark):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]
    got_c = nxapi.clustering(spark, edges)
    ref_c = nx.clustering(nx_graph(edges))
    for k, v in ref_c.items():
        assert got_c[str(k)] == pytest.approx(v)
    assert nxapi.transitivity(spark, edges) == pytest.approx(
        nx.transitivity(nx_graph(edges))
    )


def test_lpa_facade_two_cliques(spark):
    # test_label_propagation.py:89-104 pattern: either merged or split
    # is an accepted ground truth
    c1 = [(f"a{i}", f"a{j}") for i in range(4) for j in range(i + 1, 4)]
    c2 = [(f"b{i}", f"b{j}") for i in range(4) for j in range(i + 1, 4)]
    edges = c1 + c2 + [("a0", "b0")]
    comms = nxapi.label_propagation_communities(spark, edges)
    names = {frozenset(c) for c in comms}
    a = frozenset(f"a{i}" for i in range(4))
    b = frozenset(f"b{i}" for i in range(4))
    assert names == {a, b} or names == {a | b}


def test_hits_facade(spark):
    got_h, got_a = nxapi.hits(spark, P1, directed=True, tol=1e-10)
    ref_h, ref_a = _hits_python(nx_graph(P1, directed=True), tol=1e-10)
    for k, v in ref_h.items():
        assert got_h[str(k)] == pytest.approx(v, abs=1e-6)
    for k, v in ref_a.items():
        assert got_a[str(k)] == pytest.approx(v, abs=1e-6)


def test_assortativity_and_links_facade(spark):
    ref = nx.degree_assortativity_coefficient(nx_graph(P1, directed=False))
    got = nxapi.degree_assortativity_coefficient(spark, P1, directed=False)
    assert got == pytest.approx(ref, abs=1e-9)
    cn = nxapi.common_neighbors(spark, P1, 4, 5)
    ref_cn = {str(n) for n in nx.common_neighbors(nx_graph(P1), 4, 5)}
    assert cn == ref_cn
    jc = nxapi.jaccard_coefficient(spark, P1)
    assert all(0.0 <= p <= 1.0 for _, _, p in jc) and jc


def test_nxapi_structural_surface(spark):
    import networkx as nx

    from linkgraph import nxapi

    KAR = list(nx.karate_club_graph().edges())
    G = nx.Graph(KAR)
    # dominating set: valid cover of all vertices
    ds = {int(v) for v in nxapi.dominating_set(spark, KAR)}
    assert all(v in ds or ds & set(G.neighbors(v)) for v in G)
    # matching: valid + maximal
    mm = {(int(a), int(b)) for a, b in nxapi.maximal_matching(spark, KAR)}
    eps = [v for e in mm for v in e]
    assert len(eps) == len(set(eps))
    assert all(u in eps or v in eps for u, v in G.edges())
    # vertex cover covers everything
    vc = {int(v) for v in nxapi.min_weighted_vertex_cover(spark, KAR)}
    assert all(u in vc or v in vc for u, v in G.edges())
    # exact-value facades
    assert nxapi.s_metric(spark, KAR) == sum(
        G.degree(u) * G.degree(v) for u, v in G.edges()
    )
    lb = {tuple(sorted((int(a), int(b)))) for a, b in nxapi.local_bridges(spark, KAR)}
    assert lb == {tuple(sorted(e)) for e in nx.local_bridges(G, with_span=False)}
    rc = {k: v for k, v in nxapi.rich_club_coefficient(spark, KAR).items()}
    want = nx.rich_club_coefficient(G, normalized=False)
    assert set(rc) == set(want) and all(abs(rc[k] - want[k]) < 1e-9 for k in want)
    assert abs(nxapi.wiener_index(spark, KAR) - nx.wiener_index(G)) < 1e-6


def test_nxapi_biconnectivity(spark):
    import networkx as nx

    from linkgraph import nxapi

    KAR = list(nx.karate_club_graph().edges())
    G = nx.Graph(KAR)
    got_blocks = {
        frozenset(int(v) for v in b)
        for b in nxapi.biconnected_components(spark, KAR)
    }
    assert got_blocks == {frozenset(b) for b in nx.biconnected_components(G)}
    aps = {int(v) for v in nxapi.articulation_points(spark, KAR)}
    assert aps == set(nx.articulation_points(G))
    brs = {tuple(sorted((int(a), int(b)))) for a, b in nxapi.bridges(spark, KAR)}
    assert brs == {tuple(sorted(e)) for e in nx.bridges(G)}
    assert nxapi.has_bridges(spark, KAR) == nx.has_bridges(G)


def test_nxapi_distance_measures(spark):
    import networkx as nx
    import pytest as _pytest

    from linkgraph import nxapi

    KAR = list(nx.karate_club_graph().edges())
    G = nx.Graph(KAR)
    ecc = {int(k): v for k, v in nxapi.eccentricity(spark, KAR).items()}
    assert ecc == nx.eccentricity(G)
    assert nxapi.diameter(spark, KAR) == nx.diameter(G)
    assert nxapi.radius(spark, KAR) == nx.radius(G)
    assert {int(v) for v in nxapi.center(spark, KAR)} == set(nx.center(G))
    assert {int(v) for v in nxapi.periphery(spark, KAR)} == set(nx.periphery(G))
    with _pytest.raises(ValueError):
        nxapi.diameter(spark, [("a", "b"), ("c", "d")])


def test_nxapi_path_family(spark):
    import networkx as nx

    from linkgraph import nxapi

    G = nx.karate_club_graph()
    KAR = list(G.edges())
    got = nxapi.all_pairs_shortest_path_length(spark, KAR)
    want = dict(nx.all_pairs_shortest_path_length(G))
    assert {int(s): {int(t): d for t, d in m.items()} for s, m in got.items()} == {
        s: dict(m) for s, m in want.items()
    }
    assert abs(
        nxapi.average_shortest_path_length(spark, KAR)
        - nx.average_shortest_path_length(G)
    ) < 1e-12
    bt = {(int(a), int(b)) for a, b in nxapi.bfs_tree(spark, KAR, 0)}
    # valid BFS tree: spans all nodes, child depth = parent depth + 1
    dist = nx.single_source_shortest_path_length(G, 0)
    assert {b for _, b in bt} == set(G) - {0}
    assert all(dist[b] == dist[a] + 1 for a, b in bt)


def test_nxapi_dag_extras(spark):
    dag = [(0, 1), (1, 2), (2, 3), (0, 3)]
    assert nxapi.dag_longest_path(spark, dag) == ["0", "1", "2", "3"]
    assert nxapi.dag_longest_path_length(spark, dag) == 3.0
    red = nxapi.transitive_reduction(spark, dag)
    assert red == {("0", "1"), ("1", "2"), ("2", "3")}
    clo = nxapi.transitive_closure(spark, [(0, 1), (1, 2)])
    assert clo == {("0", "1"), ("1", "2"), ("0", "2")}


def test_nxapi_components_extras(spark):
    cyc = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2)]
    comps = nxapi.attracting_components(spark, cyc)
    assert sorted(map(sorted, comps)) == [["2", "3"]]
    assert nxapi.is_semiconnected(spark, cyc) is True
    assert nxapi.is_aperiodic(spark, [(0, 1), (1, 0)]) is False


def test_nxapi_voronoi_quality_snap(spark):
    path = [(i, i + 1) for i in range(5)]
    cells = nxapi.voronoi_cells(spark, path, [0, 3])
    assert cells == {"0": {"0", "1"}, "3": {"2", "3", "4", "5"}}
    cov, perf = nxapi.partition_quality(
        spark, path, [{0, 1, 2}, {3, 4, 5}]
    )
    assert cov == pytest.approx(4 / 5)
    grc = nxapi.global_reaching_centrality(spark, [(0, 1), (0, 2)])
    assert grc == pytest.approx(1.0)
    part = nxapi.snap_aggregation(
        spark, [(0, 2), (1, 2)], {0: "a", 1: "a", 2: "b"}
    )
    assert part == {frozenset({"0", "1"}), frozenset({"2"})}
