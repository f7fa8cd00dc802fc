"""voronoi_cells vs the live networkx oracle — every engine
assignment must be a nearest center (the reference's equidistant
tie-break is arbitrary; the engine's is min center id)."""

import networkx as nx
import pytest

from linkgraph.graph import graph_from_edge_names
from linkgraph.operators.traversal import voronoi_cells

from nx_oracle import nx_graph


def names(g):
    return {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}


def test_voronoi_path_graph(spark):
    # the reference docstring example: path 0-5, centers {0, 3}
    edges = [(i, i + 1) for i in range(5)]
    g = graph_from_edge_names(spark, edges, directed=False)
    nm = names(g)
    idmap = {v: k for k, v in nm.items()}
    out = {
        nm[r["id"]]: nm[r["center"]]
        for r in voronoi_cells(g, [idmap["0"], idmap["3"]]).collect()
    }
    # nx: {0: {0,1}, 3: {2,3,4,5}}; node 1 at dist 1 from 0, dist 2 from 3
    assert out == {"0": "0", "1": "0", "2": "3", "3": "3", "4": "3", "5": "3"}


def test_voronoi_nearest_invariant(spark):
    G = nx.gnm_random_graph(30, 60, seed=11)
    centers = [0, 7, 13]
    g = graph_from_edge_names(spark, list(G.edges()), nodes=list(G.nodes()),
                              directed=False)
    nm = names(g)
    idmap = {v: k for k, v in nm.items()}
    rows = voronoi_cells(g, [idmap[str(c)] for c in centers]).collect()
    dist = {c: nx.single_source_shortest_path_length(G, c) for c in centers}
    seen = set()
    for r in rows:
        v, c, d = int(nm[r["id"]]), int(nm[r["center"]]), r["dist"]
        seen.add(v)
        best = min(dist[cc].get(v, 10**9) for cc in centers)
        assert d == best and dist[c].get(v, 10**9) == best
        # deterministic tie-break: smallest center id among argmin
        assert c == min(cc for cc in centers if dist[cc].get(v, 10**9) == best)
    reachable = {v for cc in centers for v in dist[cc]}
    assert seen == reachable


def test_voronoi_directed(spark):
    edges = [(0, 1), (1, 2), (3, 2), (3, 4)]
    g = graph_from_edge_names(spark, edges, directed=True)
    nm = names(g)
    idmap = {v: k for k, v in nm.items()}
    out = {
        nm[r["id"]]: nm[r["center"]]
        for r in voronoi_cells(g, [idmap["0"], idmap["3"]]).collect()
    }
    # outward cells: 2 is dist 2 from 0 but dist 1 from 3
    assert out == {"0": "0", "1": "0", "2": "3", "3": "3", "4": "3"}


def test_voronoi_empty_centers_raises(spark):
    g = graph_from_edge_names(spark, [(0, 1)], directed=False)
    with pytest.raises(ValueError):
        voronoi_cells(g, [])
