"""Parity tests for shortest_path_tree and the path facades."""

import networkx as nx
import pytest

from linkgraph.graph import LinkGraph
from linkgraph.operators.shortest_paths import shortest_path_tree


def _g(spark, wedges, n, directed=False):
    e = spark.createDataFrame(
        [(a, b, float(w)) for a, b, w in wedges],
        "src long, dst long, weight double",
    )
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    return LinkGraph(vertices=v, edges=e, directed=directed)


def test_tree_distances_and_valid_preds(spark):
    wedges = [(0, 1, 2), (0, 2, 5), (1, 2, 1), (2, 3, 2), (1, 3, 9), (4, 0, 1)]
    g = _g(spark, wedges, 6, directed=True)
    G = nx.DiGraph()
    G.add_nodes_from(range(6))
    G.add_weighted_edges_from(wedges)
    rows = {r["id"]: (r["dist"], r["pred"]) for r in shortest_path_tree(g, 0).collect()}
    want = nx.single_source_dijkstra_path_length(G, 0)
    assert {k: v[0] for k, v in rows.items()} == want  # exact distances
    w = {(a, b): c for a, b, c in wedges}
    for v_, (d, p) in rows.items():
        if v_ == 0:
            assert p is None
        else:
            assert rows[p][0] + w[(p, v_)] == d  # pred edge is tight


def test_shortest_path_facade_karate(spark):
    from linkgraph import nxapi

    G = nx.karate_club_graph()
    KAR = list(G.edges())
    got = [int(v) for v in nxapi.shortest_path(spark, KAR, 16, 25)]
    assert got[0] == 16 and got[-1] == 25
    assert len(got) - 1 == nx.shortest_path_length(G, 16, 25)
    for a, b in zip(got, got[1:]):
        assert G.has_edge(a, b)
    lens = {int(k): v for k, v in
            nxapi.single_source_shortest_path_length(spark, KAR, 0).items()}
    assert lens == nx.single_source_shortest_path_length(G, 0)
    with pytest.raises(ValueError):
        nxapi.shortest_path(spark, [("a", "b"), ("c", "d")], "a", "c")
