"""Weighted betweenness/closeness parity (reference betweenness.py:110
``weight=``, closeness.py:77 ``distance=``) — integer-valued weights so
float sums are exact in both engines."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.operators.centrality import (
    betweenness_centrality,
    closeness_centrality,
    harmonic_centrality,
)


def _g(spark, edges, directed=True):
    ids = sorted({x for a, b, _ in edges for x in (a, b)})
    v = spark.createDataFrame([(i,) for i in ids], "id long")
    e = spark.createDataFrame(
        [(a, b, float(w)) for a, b, w in edges],
        "src long, dst long, weight double",
    )
    return LinkGraph(vertices=v, edges=e, directed=directed)


def _G(edges, directed):
    G = nx.DiGraph() if directed else nx.Graph()
    G.add_weighted_edges_from(edges)
    return G


# weights make 0->1->2->3 (cost 3) beat the direct 0->3 (cost 10), and
# create an equal-cost pair of paths into 5 (sigma > 1)
WEDGES = [
    (0, 1, 1), (1, 2, 1), (2, 3, 1), (0, 3, 10), (3, 4, 2),
    (0, 5, 4), (2, 5, 2), (1, 5, 3), (4, 5, 1), (5, 6, 1), (6, 0, 2),
]


@pytest.mark.parametrize("directed", [True, False])
@pytest.mark.parametrize("normalized", [True, False])
def test_weighted_betweenness_matches_nx(spark, directed, normalized):
    g = _g(spark, WEDGES, directed=directed)
    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_centrality(
            g, normalized=normalized, weight=True
        ).collect()
    }
    want = nx.betweenness_centrality(
        _G(WEDGES, directed), weight="weight", normalized=normalized
    )
    assert set(got) == set(want)
    for i in want:
        assert abs(got[i] - want[i]) < 1e-9, (i, got[i], want[i])


def test_weighted_betweenness_sampled_sources(spark):
    g = _g(spark, WEDGES, directed=True)
    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_centrality(
            g, sources=[0, 2, 5], normalized=False, weight=True
        ).collect()
    }
    # reference single-source accumulation: sum over the 3 sources
    G = _G(WEDGES, True)
    want = {v: 0.0 for v in G}
    for s in (0, 2, 5):
        bc = nx.betweenness_centrality_subset(
            G, sources=[s], targets=list(G), weight="weight", normalized=False
        )
        for v in G:
            want[v] += bc[v]
    for i in want:
        assert abs(got[i] - want[i]) < 1e-9, (i, got[i], want[i])


@pytest.mark.parametrize("directed", [True, False])
def test_weighted_closeness_harmonic_match_nx(spark, directed):
    g = _g(spark, WEDGES, directed=directed)
    G = _G(WEDGES, directed)
    for node in (0, 3, 5):
        want_c = nx.closeness_centrality(G, node, distance="weight")
        got_c = closeness_centrality(g, node, weight=True)
        assert abs(got_c - want_c) < 1e-9, (node, got_c, want_c)
        want_h = nx.harmonic_centrality(G, [node], distance="weight")[node]
        got_h = harmonic_centrality(g, node, weight=True)
        assert abs(got_h - want_h) < 1e-9, (node, got_h, want_h)


@pytest.mark.parametrize("directed", [True, False])
@pytest.mark.parametrize("normalized", [True, False])
def test_weighted_edge_betweenness_matches_nx(spark, directed, normalized):
    from linkgraph.operators.centrality import edge_betweenness_centrality

    g = _g(spark, WEDGES, directed=directed)
    got = {
        (r["src"], r["dst"]): r["betweenness"]
        for r in edge_betweenness_centrality(
            g, normalized=normalized, weight=True
        ).collect()
    }
    want = nx.edge_betweenness_centrality(
        _G(WEDGES, directed), weight="weight", normalized=normalized
    )
    want = {
        ((u, v) if directed else (min(u, v), max(u, v))): c
        for (u, v), c in want.items()
    }
    assert set(got) == set(want)
    for e in want:
        assert abs(got[e] - want[e]) < 1e-9, (e, got[e], want[e])


@pytest.mark.parametrize("weight", [True, False])
@pytest.mark.parametrize("edge_mode", [True, False])
def test_brandes_local_vs_distributed(spark, weight, edge_mode):
    """The size-gated dense-matrix Brandes kernel (centrality.py
    ``_local_brandes``) and the superstep sweeps are the same
    algorithm in two physical shapes — raw credits must agree."""
    from linkgraph.operators.centrality import (
        betweenness_centrality,
        edge_betweenness_centrality,
    )

    g = _g(spark, WEDGES, directed=True)
    fn = edge_betweenness_centrality if edge_mode else betweenness_centrality
    key = (lambda r: (r["src"], r["dst"])) if edge_mode else (lambda r: r["id"])
    local = {key(r): r["betweenness"]
             for r in fn(g, normalized=False, weight=weight).collect()}
    dist = {key(r): r["betweenness"]
            for r in fn(g, normalized=False, weight=weight,
                        local_max_edges=0).collect()}
    assert local.keys() == dist.keys()
    for x in local:
        assert abs(local[x] - dist[x]) < 1e-9, (x, local[x], dist[x])
