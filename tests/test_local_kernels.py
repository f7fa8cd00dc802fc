"""Local-kernel vs distributed-plan parity for HITS and SALSA.

The size-gated single-task numpy kernels (hits.py ``_local_hits`` /
``_local_salsa``, substrate operators/_local.py) and the superstep
plans (``local_max_edges=0``) are the same algorithm in two physical
shapes — scores must agree to 1e-12 on graphs that exercise weighted
parallel edges, dangling nodes, nstart, both convergence modes.
"""

import pytest

from linkgraph.graph import graph_from_edge_names
from linkgraph.operators.hits import hits, salsa
from linkgraph.plans.loop import PowerIterationFailedConvergence

# weighted parallel edges (1->3 twice), a dangling sink (4), a source
# with no in-edges (6), a 2-cycle
EDGES = [
    (1, 3, 2.0),
    (1, 3, 1.0),
    (1, 5, 1.0),
    (2, 1, 3.0),
    (3, 5, 1.5),
    (5, 4, 1.0),
    (5, 3, 2.5),
    (6, 5, 0.5),
    (2, 5, 1.0),
]


def _pairs(df):
    return {r["id"]: (r["hub"], r["authority"]) for r in df.collect()}


@pytest.mark.parametrize("directed", [True, False])
def test_hits_local_vs_distributed(spark, directed):
    g = graph_from_edge_names(spark, EDGES, directed=directed)
    local = _pairs(hits(g, tol=1e-10))
    dist = _pairs(hits(g, tol=1e-10, local_max_edges=0))
    assert local.keys() == dist.keys()
    for k in local:
        assert local[k][0] == pytest.approx(dist[k][0], abs=1e-12)
        assert local[k][1] == pytest.approx(dist[k][1], abs=1e-12)


def test_hits_local_vs_distributed_fixed_iter_nstart(spark):
    g = graph_from_edge_names(spark, EDGES, directed=True)
    ids = [r["id"] for r in g.vertices.collect()]
    nstart = {i: 1.0 + (i % 3) for i in ids}
    kw = dict(fixed_iter=7, nstart=nstart, normalized=False)
    local = _pairs(hits(g, **kw))
    dist = _pairs(hits(g, local_max_edges=0, **kw))
    for k in local:
        assert local[k][0] == pytest.approx(dist[k][0], abs=1e-12)
        assert local[k][1] == pytest.approx(dist[k][1], abs=1e-12)


def test_hits_local_nonconvergence_raises(spark):
    g = graph_from_edge_names(spark, EDGES, directed=True)
    with pytest.raises(PowerIterationFailedConvergence):
        hits(g, max_iter=1, tol=1e-300)


@pytest.mark.parametrize("fixed_iter", [6, None])
def test_salsa_local_vs_distributed(spark, fixed_iter):
    g = graph_from_edge_names(spark, EDGES, directed=True)
    # tol=1e-8: SALSA contracts at ~0.83/iter on this fixture, so
    # 1e-10 would legitimately exhaust max_iter=100 on BOTH paths
    kw = dict(fixed_iter=fixed_iter) if fixed_iter else dict(tol=1e-8)
    local = _pairs(salsa(g, **kw))
    dist = _pairs(salsa(g, local_max_edges=0, **kw))
    assert local.keys() == dist.keys()
    for k in local:
        assert local[k][0] == pytest.approx(dist[k][0], abs=1e-12)
        assert local[k][1] == pytest.approx(dist[k][1], abs=1e-12)


def test_salsa_local_nonconvergence_raises(spark):
    g = graph_from_edge_names(spark, EDGES, directed=True)
    with pytest.raises(PowerIterationFailedConvergence):
        salsa(g, max_iter=1, tol=1e-300)


# --------------------------------------------------------- MIS (Luby)

MIS_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (2, 5), (5, 6), (6, 7),
    (7, 2), (8, 9), (3, 3), (9, 8), (1, 4), (0, 5),
]


def test_mis_local_vs_distributed(spark):
    from linkgraph.operators.independent_set import maximal_independent_set

    g = graph_from_edge_names(spark, MIS_EDGES, directed=False)
    local = {r["id"]: r["in_mis"]
             for r in maximal_independent_set(g, seed=3).collect()}
    dist = {r["id"]: r["in_mis"]
            for r in maximal_independent_set(g, seed=3, local_max_edges=0).collect()}
    assert local == dist
    assert any(local.values())


def test_mis_local_max_rounds_raises(spark):
    from linkgraph.operators.independent_set import maximal_independent_set

    g = graph_from_edge_names(spark, MIS_EDGES, directed=False)
    with pytest.raises(RuntimeError, match="undecided"):
        maximal_independent_set(g, max_rounds=0)


# -------------------------------------------------- DAG longest paths

DAG_EDGES = [
    (0, 1, 2.0), (0, 2, 1.0), (1, 3, 4.0), (2, 3, 9.0), (3, 4, 1.0),
    (1, 3, 7.0),  # parallel edge: heaviest wins
    (5, 4, 1.0), (6, 6, 0.0),
]


def test_longest_paths_local_vs_distributed(spark):
    from linkgraph.operators.dag import longest_path_lengths

    g = graph_from_edge_names(spark, DAG_EDGES[:-1], directed=True)
    local = {r["id"]: r["dist"]
             for r in longest_path_lengths(g, weighted=True).collect()}
    dist = {r["id"]: r["dist"]
            for r in longest_path_lengths(g, weighted=True, local_max_edges=0).collect()}
    assert local.keys() == dist.keys()
    for k in local:
        assert local[k] == pytest.approx(dist[k], abs=1e-12)


def test_longest_paths_local_selfloop_and_cycle_raise(spark):
    from linkgraph.operators.dag import GraphContainsCycle, longest_path_lengths

    g_self = graph_from_edge_names(spark, DAG_EDGES, directed=True)
    with pytest.raises(GraphContainsCycle):
        longest_path_lengths(g_self, weighted=True)
    g_cycle = graph_from_edge_names(
        spark, [(0, 1), (1, 2), (2, 0), (2, 3)], directed=True
    )
    with pytest.raises(GraphContainsCycle):
        longest_path_lengths(g_cycle)


# ------------------------------------------------------ MS-BFS counts


def _count_rows(df):
    return sorted((r["id"], r["layer"], r["n_src"]) for r in df.collect())


@pytest.mark.parametrize("directed", [True, False])
def test_msbfs_counts_local_vs_distributed(spark, directed):
    from linkgraph.operators.traversal import multi_source_bfs_counts

    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (2, 4), (4, 5), (6, 0), (5, 6)]
    g = graph_from_edge_names(spark, edges, directed=directed)
    srcs = [r["id"] for r in g.vertices.orderBy("id").limit(3).collect()]
    local = _count_rows(multi_source_bfs_counts(g, srcs))
    dist = _count_rows(multi_source_bfs_counts(g, srcs, local_max_edges=0))
    assert local == dist


def test_msbfs_counts_local_65_sources_two_words(spark):
    """>64 sources forces a second bitset word in both plans."""
    from linkgraph.operators.traversal import multi_source_bfs_counts

    edges = [(i, i + 1) for i in range(70)] + [(70, 0)]
    g = graph_from_edge_names(spark, edges, directed=False)
    srcs = [r["id"] for r in g.vertices.orderBy("id").limit(65).collect()]
    local = _count_rows(multi_source_bfs_counts(g, srcs, max_depth=6))
    dist = _count_rows(multi_source_bfs_counts(g, srcs, max_depth=6, local_max_edges=0))
    assert local == dist


# -------------------------------------------- eigenvector / Katz


def test_eigenvector_local_vs_distributed(spark):
    from linkgraph.operators.centrality import eigenvector_centrality

    g = graph_from_edge_names(spark, EDGES, directed=True)
    ids = [r["id"] for r in g.vertices.collect()]
    nstart = {i: 1.0 + (i % 2) for i in ids}
    kw = dict(tol=1e-10, nstart=nstart)
    local = {r["id"]: r["centrality"]
             for r in eigenvector_centrality(g, **kw).collect()}
    dist = {r["id"]: r["centrality"]
            for r in eigenvector_centrality(g, local_max_edges=0, **kw).collect()}
    assert local.keys() == dist.keys()
    for k in local:
        assert local[k] == pytest.approx(dist[k], abs=1e-12)


def test_katz_local_vs_distributed(spark):
    from linkgraph.operators.centrality import katz_centrality

    g = graph_from_edge_names(spark, EDGES, directed=True)
    for kw in (dict(alpha=0.05, beta=2.0, fixed_iter=7),
               dict(alpha=0.05, beta=1.0, tol=1e-10, normalized=False)):
        local = {r["id"]: r["centrality"]
                 for r in katz_centrality(g, **kw).collect()}
        dist = {r["id"]: r["centrality"]
                for r in katz_centrality(g, local_max_edges=0, **kw).collect()}
        for k in local:
            assert local[k] == pytest.approx(dist[k], abs=1e-12)


# ---------------- core_number / k_truss local-vs-distributed --------
def test_core_number_local_vs_distributed(spark):
    """The single-task BZ peeling (core.py _local_core_number) and the
    Montresor h-index superstep fixpoint are both EXACT, so they must
    agree bit-for-bit — including isolates (core 0), self-loops
    (dropped) and parallel edges (deduped)."""
    import networkx as nx

    from linkgraph.operators.core import core_number

    g_nx = nx.gnp_random_graph(120, 0.06, seed=5)
    edges = [(u, v) for u, v in g_nx.edges()] + [(0, 0), (1, 2)]  # loop + dup
    g = graph_from_edge_names(spark, edges, nodes=[999], directed=False)
    name_of = {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}
    loc = {name_of[r["id"]]: r["core"] for r in core_number(g).collect()}
    dist = {
        name_of[r["id"]]: r["core"]
        for r in core_number(g, local_max_edges=0).collect()
    }
    assert loc == dist
    want = nx.core_number(nx.Graph([(str(u), str(v)) for u, v in g_nx.edges()]))
    for n, c in want.items():
        assert loc[n] == c, n
    assert loc["999"] == 0


def test_ktruss_local_vs_distributed(spark):
    """k-truss is a unique maximal subgraph, so the single-task
    support-peel kernel and the distributed per-round peeling must
    return the identical edge set; cross-checked vs nx.k_truss."""
    import networkx as nx

    from linkgraph.operators.core import k_truss

    g_nx = nx.gnp_random_graph(60, 0.18, seed=9)
    edges = list(g_nx.edges())
    g = graph_from_edge_names(spark, edges, directed=False)
    name_of = {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}
    for k in (3, 4, 5):
        loc = {
            tuple(sorted((name_of[r["src"]], name_of[r["dst"]])))
            for r in k_truss(g, k=k).edges.collect()
        }
        dist = {
            tuple(sorted((name_of[r["src"]], name_of[r["dst"]])))
            for r in k_truss(g, k=k, local_max_edges=0).edges.collect()
        }
        assert loc == dist, k
        want = {
            tuple(sorted((str(u), str(v))))
            for u, v in nx.k_truss(g_nx, k).edges()
        }
        assert loc == want, k
