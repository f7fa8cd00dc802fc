"""Attracting components / semiconnectivity vs the live networkx
oracle (components/attracting.py, components/semiconnected.py)."""

import networkx as nx
import pytest

from linkgraph.graph import graph_from_edge_names
from linkgraph.operators.strongly_connected import (
    attracting_components,
    is_attracting_component,
    is_semiconnected,
    number_attracting_components,
)

from nx_oracle import nx_graph


def names(g):
    return {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}


# two cycles, one draining into the other, plus a dangling tail
EDGES = [
    (0, 1), (1, 2), (2, 0),        # SCC A (drains into B)
    (2, 3),
    (3, 4), (4, 5), (5, 3),        # SCC B (attracting)
    (6, 0),                        # tail into A
    (7, 8), (8, 7),                # SCC C (attracting, separate)
]


def test_attracting_components_vs_nx(spark):
    g = graph_from_edge_names(spark, EDGES, directed=True)
    nm = names(g)
    got = {}
    for r in attracting_components(g).collect():
        got.setdefault(r["component"], set()).add(nm[r["id"]])
    want = [
        {str(v) for v in comp}
        for comp in nx.attracting_components(nx_graph(EDGES, directed=True))
    ]
    assert sorted(got.values(), key=sorted) == sorted(want, key=sorted)
    assert number_attracting_components(g) == len(want)


def test_is_attracting_component(spark):
    cyc = graph_from_edge_names(spark, [(0, 1), (1, 2), (2, 0)], directed=True)
    assert is_attracting_component(cyc) is True
    g = graph_from_edge_names(spark, EDGES, directed=True)
    assert is_attracting_component(g) is False


@pytest.mark.parametrize(
    "edges,expected",
    [
        ([(0, 1), (1, 2), (2, 3)], True),                 # path: semiconnected
        ([(0, 1), (0, 2)], False),                        # fork: 1 vs 2 unordered
        ([(0, 1), (1, 0), (1, 2), (2, 3), (3, 2)], True), # SCC chain
        (EDGES, False),                                   # C unreachable from A/B
    ],
)
def test_is_semiconnected_vs_nx(spark, edges, expected):
    g = graph_from_edge_names(spark, edges, directed=True)
    G = nx_graph(edges, directed=True)
    assert nx.is_semiconnected(G) is expected
    assert is_semiconnected(g) is expected


def test_is_semiconnected_null_raises(spark):
    from linkgraph.graph import LinkGraph
    from pyspark.sql import functions as F

    empty_v = spark.range(0).select(F.col("id").cast("long"))
    empty_e = spark.createDataFrame([], "src LONG, dst LONG, weight DOUBLE")
    g = LinkGraph(vertices=empty_v, edges=empty_e, directed=True)
    with pytest.raises(ValueError):
        is_semiconnected(g)
