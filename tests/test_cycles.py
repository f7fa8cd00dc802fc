"""Cycle-witness parity (networkx/algorithms/cycles.py): find_cycle,
bounded simple_cycles, girth."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.operators.cycles import NoCycle, find_cycle, girth, simple_cycles


def _g(spark, edges, n=None, directed=True):
    ids = sorted({x for e in edges for x in e} | set(range(n or 0)))
    v = spark.createDataFrame([(i,) for i in ids], "id long")
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, weight double"
    )
    return LinkGraph(vertices=v, edges=e, directed=directed)


def _canon(seq, directed):
    seq = list(seq)
    i = seq.index(min(seq))
    seq = seq[i:] + seq[:i]
    if not directed and len(seq) >= 3 and seq[1] > seq[-1]:
        seq = [seq[0]] + seq[1:][::-1]
    return ",".join(str(x) for x in seq)


def test_find_cycle_witness_and_determinism(spark):
    # anchor 0 lies on a 5-cycle and a 3-cycle -> shortest (3) wins
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (0, 5), (5, 6), (6, 0)]
    g = _g(spark, edges)
    rows = find_cycle(g).orderBy("pos").collect()
    assert [(r["src"], r["dst"]) for r in rows] == [(0, 5), (5, 6), (6, 0)]
    # witness validity: closed walk over existing edges, no repeats
    for r in rows:
        assert (r["src"], r["dst"]) in set(edges)
    assert rows[0]["src"] == rows[-1]["dst"]


def test_find_cycle_self_loop_and_dag(spark):
    g = _g(spark, [(3, 3), (1, 2), (0, 1)])
    rows = find_cycle(g).collect()
    assert [(r["src"], r["dst"]) for r in rows] == [(3, 3)]
    dag = _g(spark, [(0, 1), (1, 2), (0, 2)])
    with pytest.raises(NoCycle):
        find_cycle(dag)
    G = nx.DiGraph([(0, 1), (1, 2), (0, 2)])
    with pytest.raises(nx.NetworkXNoCycle):
        nx.find_cycle(G)


def test_find_cycle_existence_matches_nx(spark):
    import itertools

    # deterministic family of small digraphs
    for seed in range(6):
        edges = [
            (a, b)
            for i, (a, b) in enumerate(itertools.permutations(range(5), 2))
            if (i * 2654435761 + seed * 40503) % 7 < 2
        ]
        G = nx.DiGraph()
        G.add_nodes_from(range(5))
        G.add_edges_from(edges)
        g = _g(spark, edges, n=5)
        try:
            nx.find_cycle(G)
            has_nx = True
        except nx.NetworkXNoCycle:
            has_nx = False
        try:
            rows = find_cycle(g).orderBy("pos").collect()
            has_us = True
            # witness validity
            es = set(edges)
            for r in rows:
                assert (r["src"], r["dst"]) in es
            assert rows[0]["src"] == rows[-1]["dst"]
            for a, b in zip(rows, rows[1:]):
                assert a["dst"] == b["src"]
            assert len({r["src"] for r in rows}) == len(rows)
        except NoCycle:
            has_us = False
        assert has_us == has_nx, edges


def test_simple_cycles_directed_matches_nx(spark):
    edges = [
        (0, 1), (1, 0), (1, 2), (2, 0), (2, 2), (0, 3), (3, 4), (4, 0),
        (3, 2), (4, 3),
    ]
    g = _g(spark, edges)
    got = {r["cycle"] for r in simple_cycles(g, length_bound=4).collect()}
    G = nx.DiGraph(edges)
    want = {
        _canon(c, True)
        for c in nx.simple_cycles(G, length_bound=4)
    }
    assert got == want


def test_simple_cycles_undirected_matches_nx(spark):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (5, 5), (0, 4)]
    g = _g(spark, edges, directed=False)
    got = {r["cycle"] for r in simple_cycles(g, length_bound=5).collect()}
    G = nx.Graph()
    G.add_edges_from(edges)
    want = {_canon(c, False) for c in nx.simple_cycles(G, length_bound=5)}
    assert got == want


def test_girth_matches_nx(spark):
    kg = nx.karate_club_graph()
    g = _g(spark, list(kg.edges()), directed=False)
    assert girth(g) == nx.girth(kg) == 3.0
    ring = [(i, (i + 1) % 7) for i in range(7)]
    assert girth(_g(spark, ring, directed=False)) == nx.girth(nx.cycle_graph(7))
    tree = [(0, 1), (1, 2), (1, 3)]
    assert girth(_g(spark, tree, directed=False), length_bound=6) == float("inf")


def test_find_cycle_local_vs_distributed(spark):
    """The single-task witness kernel and the SCC+BFS superstep path
    follow the same deterministic rules — identical witness edges on
    a graph with several cycles, self-loops excluded."""
    from linkgraph.graph import graph_from_edge_names
    from linkgraph.operators.cycles import find_cycle

    edges = [(3, 4), (4, 5), (5, 3), (0, 1), (1, 2), (2, 0), (2, 6),
             (6, 7), (7, 2), (1, 4)]
    g = graph_from_edge_names(spark, edges, directed=True)
    local = [(r["pos"], r["src"], r["dst"]) for r in find_cycle(g).collect()]
    dist = [(r["pos"], r["src"], r["dst"])
            for r in find_cycle(g, local_max_edges=0).collect()]
    assert local == dist
    assert len(local) >= 3


def test_find_cycle_local_selfloop_and_acyclic(spark):
    from linkgraph.graph import graph_from_edge_names
    from linkgraph.operators.cycles import NoCycle, find_cycle

    g = graph_from_edge_names(spark, [(0, 1), (1, 1), (1, 2)], directed=True)
    rows = find_cycle(g).collect()
    assert len(rows) == 1 and rows[0]["src"] == rows[0]["dst"]
    g2 = graph_from_edge_names(spark, [(0, 1), (1, 2)], directed=True)
    import pytest as _pt
    with _pt.raises(NoCycle):
        find_cycle(g2)
