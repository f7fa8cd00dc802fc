"""SNAP aggregation partition vs the live networkx oracle
(summarization.py snap_aggregation) — partitions compared as sets of
frozensets (group identity is engine-specific by design)."""

import networkx as nx

from pyspark.sql import functions as F

from linkgraph.graph import graph_from_edge_names
from linkgraph.operators.summarization import snap_groups


def names(g):
    return {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}


def _nx_partition(summary):
    return {
        frozenset(str(m) for m in data["group"])
        for _, data in summary.nodes(data=True)
    }


def _engine_partition(g, out):
    nm = names(g)
    grp = {}
    for r in out.collect():
        grp.setdefault(r["group"], set()).add(nm[r["id"]])
    return {frozenset(v) for v in grp.values()}


def _attrs_df(spark, g, attrs):
    nm = {r["url"].rsplit("/", 1)[-1]: r["id"] for r in g.vertices.collect()}
    return spark.createDataFrame(
        [(nm[str(k)], v) for k, v in attrs.items()], "id LONG, attr STRING"
    )


def test_snap_doc_example(spark):
    # the reference docstring example: colors + Strong/Weak edge types
    node_color = {"A": "Red", "B": "Red", "C": "Red", "D": "Red",
                  "E": "Blue", "F": "Blue"}
    edges = [("A", "E", "Strong"), ("B", "F", "Strong"),
             ("C", "E", "Weak"), ("D", "F", "Weak")]
    G = nx.Graph()
    for n, c in node_color.items():
        G.add_node(n, color=c)
    for u, v, t in edges:
        G.add_edge(u, v, type=t)
    want = _nx_partition(
        nx.snap_aggregation(G, node_attributes=("color",),
                            edge_attributes=("type",))
    )

    g = graph_from_edge_names(spark, [(u, v) for u, v, _ in edges],
                              directed=False)
    nm = {r["url"].rsplit("/", 1)[-1]: r["id"] for r in g.vertices.collect()}
    et = spark.createDataFrame(
        [(nm[u], nm[v], t) for u, v, t in edges],
        "src LONG, dst LONG, etype STRING",
    )
    out = snap_groups(g, _attrs_df(spark, g, node_color), edge_types=et)
    assert _engine_partition(g, out) == want


def test_snap_untyped_random(spark):
    G = nx.gnm_random_graph(24, 48, seed=7)
    attrs = {n: "even" if n % 2 == 0 else "odd" for n in G.nodes}
    nx.set_node_attributes(G, attrs, "parity")
    want = _nx_partition(nx.snap_aggregation(G, node_attributes=("parity",)))

    g = graph_from_edge_names(spark, list(G.edges()), nodes=list(G.nodes()),
                              directed=False)
    out = snap_groups(g, _attrs_df(spark, g, attrs))
    assert _engine_partition(g, out) == want


def test_snap_fixed_rounds_idempotent(spark):
    # extra rounds past the fixpoint never change the partition
    G = nx.gnm_random_graph(16, 24, seed=3)
    attrs = {n: str(n % 3) for n in G.nodes}
    g = graph_from_edge_names(spark, list(G.edges()), nodes=list(G.nodes()),
                              directed=False)
    a = _engine_partition(g, snap_groups(g, _attrs_df(spark, g, attrs)))
    b = _engine_partition(
        g, snap_groups(g, _attrs_df(spark, g, attrs), rounds=12)
    )
    assert a == b
