"""nx parity for the Girvan-Newman first split."""

import networkx as nx

from linkgraph.graph import LinkGraph
from linkgraph.operators.girvan_newman import girvan_newman_level


def _g(spark, edges, n):
    e = spark.createDataFrame(
        [(a, b, None) for a, b in edges], "src long, dst long, weight double"
    )
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    return LinkGraph(vertices=v, edges=e, directed=False)


def _partition(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["component"], set()).add(r["id"])
    return {frozenset(s) for s in out.values()}


def test_gn_barbell_first_split(spark):
    G = nx.barbell_graph(5, 2)  # two K5s joined by a 2-path
    g = _g(spark, list(G.edges()), len(G))
    got = _partition(girvan_newman_level(g, levels=1))
    want = {frozenset(c) for c in next(nx.community.girvan_newman(G))}
    assert got == want


def test_gn_karate_first_split(spark):
    G = nx.karate_club_graph()
    g = _g(spark, list(G.edges()), 34)
    got = _partition(girvan_newman_level(g, levels=1))
    want = {frozenset(c) for c in next(nx.community.girvan_newman(G))}
    assert got == want
