"""setops / degrees / subgraph operator tests vs networkx oracle."""

import networkx as nx
from pyspark.sql import functions as F

from linkgraph.graph import graph_from_edge_names
from linkgraph.operators import degrees as deg
from linkgraph.operators import setops
from linkgraph.operators.subgraph import (
    edge_subgraph,
    induced_subgraph,
    restricted_view,
    subgraph_view,
)


def g_of(spark, edges, nodes=(), directed=True):
    return graph_from_edge_names(spark, edges, nodes=nodes, directed=directed)


def edge_names(g):
    names = {r["id"]: r["url"] for r in g.vertices.collect()}
    return {(names[r["src"]], names[r["dst"]]) for r in g.edges.select("src", "dst").collect()}


def test_degrees_match_nx(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "c")]
    g = g_of(spark, edges, nodes=["z"], directed=False)
    names = {r["id"]: r["url"] for r in g.vertices.collect()}
    got = {names[r["id"]]: r["degree"] for r in deg.degrees(g).collect()}
    ref = nx.MultiGraph(edges)
    ref.add_node("z")
    assert got == {n: float(d) for n, d in ref.degree()}
    # self-loop counts twice: c has b,a,self*2 = 4
    assert got["c"] == 4.0
    hist = {r["degree"]: r["num_nodes"] for r in deg.degree_histogram(g).collect()}
    assert hist == {0: 1, 2: 2, 4: 1}
    assert deg.number_of_selfloops(g) == 1
    assert {names[r["id"]] for r in deg.isolates(g).collect()} == {"z"}


def test_density(spark):
    g = g_of(spark, [("a", "b"), ("b", "c")], directed=True)
    assert deg.density(g) == 2 / (3 * 2)
    gu = g_of(spark, [("a", "b"), ("b", "c")], directed=False)
    assert deg.density(gu) == 2 * 2 / (3 * 2)


def test_setops_match_nx(spark):
    e1 = [("a", "b"), ("b", "c"), ("c", "d")]
    e2 = [("b", "c"), ("c", "d"), ("d", "a")]
    g1, g2 = g_of(spark, e1, nodes=["d", "a"]), g_of(spark, e2, nodes=["a", "b"])
    # same id space: both graphs built over the same url set
    assert edge_names(setops.intersection(g1, g2)) == {("b", "c"), ("c", "d")}
    assert edge_names(setops.difference(g1, g2)) == {("a", "b")}
    assert edge_names(setops.symmetric_difference(g1, g2)) == {("a", "b"), ("d", "a")}
    assert edge_names(setops.compose(g1, g2)) == set(e1) | set(e2)


def test_union_disjoint(spark):
    g1 = g_of(spark, [("a", "b")])
    g2 = g_of(spark, [("a", "b")])
    try:
        setops.union(g1, g2)
        raise AssertionError("union of overlapping node sets must raise")
    except ValueError:
        pass
    du = setops.disjoint_union(g1, g2)
    assert du.vertices.count() == 4 and du.edges.count() == 2
    assert du.vertices.select("id").distinct().count() == 4


def test_subgraph_forms(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    g = g_of(spark, edges, directed=True)
    ids = {r["url"]: r["id"] for r in g.vertices.collect()}
    sub = induced_subgraph(g, [ids["a"], ids["b"], ids["c"]])
    assert edge_names(sub) == {("a", "b"), ("b", "c")}
    es = edge_subgraph(g, [(ids["a"], ids["b"])])
    assert edge_names(es) == {("a", "b")}
    assert es.vertices.count() == 2
    rv = restricted_view(g, hide_nodes=[ids["d"]])
    assert edge_names(rv) == {("a", "b"), ("b", "c")}
    sv = subgraph_view(g, filter_edge=F.col("src") < F.col("dst"))
    assert len(edge_names(sv)) == 3  # drops exactly the one back-edge


def test_compose_multigraph_no_blowup(spark):
    """Parallel edges on both sides must not M×N-multiply: each side is
    coalesced per (src,dst) before the merge (VERDICT r1 'wrong' #2)."""
    from linkgraph.graph import LinkGraph

    g1 = g_of(spark, [("a", "b"), ("a", "b"), ("a", "b")])
    g2 = g_of(spark, [("a", "b"), ("a", "b")])
    out = setops.compose(g1, g2)
    assert out.edges.count() == 1
    # H's (coalesced) weight wins: 2 parallel unit edges -> 2.0
    assert out.edges.first()["weight"] == 2.0


def test_compose_vertex_attrs_h_wins(spark):
    """H's vertex attributes take precedence (binary.py:301), even when
    G's value is lexicographically larger (ADVICE r1 item 1)."""
    from linkgraph.graph import LinkGraph

    gv = spark.createDataFrame([(0, "zzz"), (1, "g-only")], "id long, url string")
    hv = spark.createDataFrame([(0, "aaa"), (2, "h-only")], "id long, url string")
    ge = spark.createDataFrame([(0, 1, 1.0)], "src long, dst long, weight double")
    he = spark.createDataFrame([(0, 2, 1.0)], "src long, dst long, weight double")
    g = LinkGraph(vertices=gv, edges=ge, directed=True)
    h = LinkGraph(vertices=hv, edges=he, directed=True)
    got = {r["id"]: r["url"] for r in setops.compose(g, h).vertices.collect()}
    assert got == {0: "aaa", 1: "g-only", 2: "h-only"}


def test_symmetrized_self_loop_once(spark):
    """A self-loop contributes ONE directed edge after symmetrization
    (pagerank_alg.py:128 to_directed parity; ADVICE r1 item 3)."""
    g = g_of(spark, [("a", "a"), ("a", "b")], directed=False)
    sym = g.symmetrized_edges()
    loops = sym.where(F.col("src") == F.col("dst")).count()
    assert loops == 1
    assert sym.count() == 3  # a->a, a->b, b->a


def test_with_weight_callable(spark):
    import networkx as nx
    import pyspark.sql.functions as F

    from linkgraph.graph import LinkGraph
    from linkgraph.operators.shortest_paths import (
        single_source_bellman_ford_path_length,
    )

    wedges = [(0, 1, 2.0), (1, 2, 3.0), (0, 2, 10.0)]
    e = spark.createDataFrame(wedges, "src long, dst long, weight double")
    v = spark.createDataFrame([(i,) for i in range(3)], "id long")
    g = LinkGraph(vertices=v, edges=e, directed=True)
    # callable weight: squared edge weight — 0->1->2 costs 4+9=13,
    # direct 0->2 costs 100
    g2 = g.with_weight(lambda edf: edf["weight"] * edf["weight"])
    got = {r["id"]: r["dist"]
           for r in single_source_bellman_ford_path_length(g2, 0).collect()}
    G = nx.DiGraph()
    G.add_weighted_edges_from(wedges)
    want = nx.single_source_dijkstra_path_length(
        G, 0, weight=lambda u, v, d: d["weight"] ** 2
    )
    assert got == want


def test_graph_save_load_roundtrip(spark, tmp_path):
    import pyspark.sql.functions as F

    from linkgraph.graph import LinkGraph

    e = spark.createDataFrame(
        [(0, 1, 2.0), (1, 2, None)], "src long, dst long, weight double"
    )
    v = spark.createDataFrame([(i,) for i in range(3)], "id long")
    g = LinkGraph(vertices=v, edges=e, directed=True)
    p = str(tmp_path / "g")
    g.save(p)
    g2 = LinkGraph.load(spark, p)
    assert g2.directed is True
    assert sorted(r["id"] for r in g2.vertices.collect()) == [0, 1, 2]
    assert {(r["src"], r["dst"], r["weight"]) for r in g2.edges.collect()} == {
        (0, 1, 2.0), (1, 2, None)
    }
