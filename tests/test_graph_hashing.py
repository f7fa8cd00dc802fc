"""WL graph hashing + flow_hierarchy vs the live networkx oracle.

WL hash values cannot be compared to networkx byte-for-byte (the
reference digests with blake2b, the engine with md5 — documented
divergence in operators/graph_hashing.py), so parity is asserted on
the EQUALITY STRUCTURE: across a panel of graphs, two graphs collide
under the engine's hash exactly when they collide under
nx.weisfeiler_lehman_graph_hash.
"""

import networkx as nx
import pytest

from linkgraph.graph import graph_from_edge_names
from linkgraph.operators.graph_hashing import wl_graph_hash, wl_subgraph_hashes
from linkgraph.operators.strongly_connected import flow_hierarchy

PANEL = [
    # isomorphic pair (relabeled 4-cycle)
    [(0, 1), (1, 2), (2, 3), (3, 0)],
    [(10, 20), (20, 30), (30, 40), (40, 10)],
    # path of same size — different structure
    [(0, 1), (1, 2), (2, 3)],
    # triangle + pendant
    [(0, 1), (1, 2), (2, 0), (2, 3)],
    # star
    [(0, 1), (0, 2), (0, 3)],
]


def _g(spark, edges, directed=False):
    return graph_from_edge_names(spark, edges, directed=directed)


def _nx(edges, directed=False):
    G = nx.DiGraph() if directed else nx.Graph()
    G.add_edges_from((str(u), str(v)) for u, v in edges)
    return G


def test_wl_hash_equality_structure_matches_reference(spark):
    ours = [wl_graph_hash(_g(spark, e), iterations=3) for e in PANEL]
    ref = [nx.weisfeiler_lehman_graph_hash(_nx(e), iterations=3) for e in PANEL]
    for i in range(len(PANEL)):
        for j in range(i + 1, len(PANEL)):
            assert (ours[i] == ours[j]) == (ref[i] == ref[j]), (i, j)
    # sanity: the isomorphic pair collides, the rest don't
    assert ours[0] == ours[1]
    assert len(set(ours)) == len(PANEL) - 1


def test_wl_subgraph_hashes_shape_and_determinism(spark):
    g = _g(spark, PANEL[3])
    a = wl_subgraph_hashes(g, iterations=2).collect()
    b = wl_subgraph_hashes(g, iterations=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # 4 nodes x iterations 0..2
    assert len(a) == 12
    # iteration 0 is the degree label
    it0 = {r["id"]: r["label"] for r in a if r["iteration"] == 0}
    assert sorted(it0.values()) == ["1", "2", "2", "3"]


@pytest.mark.parametrize(
    "edges",
    [
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)],
        [(0, 1), (1, 0), (1, 2), (2, 3), (3, 1), (3, 4), (4, 5)],
        [(0, 1), (1, 2), (2, 3)],
    ],
)
def test_flow_hierarchy_matches_reference(spark, edges):
    g = _g(spark, edges, directed=True)
    G = nx.DiGraph()
    G.add_edges_from((str(u), str(v)) for u, v in edges)
    assert flow_hierarchy(g) == pytest.approx(nx.flow_hierarchy(G))


def test_flow_hierarchy_rejects_undirected(spark):
    g = _g(spark, [(0, 1)], directed=False)
    with pytest.raises(ValueError):
        flow_hierarchy(g)
