"""Ported triangle suite (networkx/algorithms/tests/test_cluster.py) —
fixtures T1-T5 of FIXTURES.md."""

import networkx as nx
import pytest

from linkgraph.graph import graph_from_edge_names, graph_from_pages
from linkgraph.operators.triangles import (
    all_triangles,
    average_clustering,
    clustering,
    transitivity,
    triangle_count,
    triangles,
)
from linkgraph.sources import corpus


def by_name(graph, df, col):
    id_to_name = {r["id"]: r["url"].rsplit("/", 1)[-1] for r in graph.vertices.collect()}
    return {id_to_name[r["id"]]: r[col] for r in df.collect()}


def test_t1_path_graph_zeros(spark):
    edges = [(str(i), str(i + 1)) for i in range(9)]
    g = graph_from_edge_names(spark, edges, directed=False)
    got = by_name(g, triangles(g), "triangles")
    assert got == {str(i): 0 for i in range(10)}
    assert transitivity(g) == 0.0


def test_t3_k5_and_variants_full_ingest(spark):
    # K5: every node 6 triangles, 10 total (test_cluster.py:67-77)
    k5_edges = [(str(a), str(b)) for a in range(5) for b in range(a + 1, 5)]
    pages = corpus.pages_df(spark, "k5", k5_edges)
    g = graph_from_pages(pages, directed=False)
    got = by_name(g, triangles(g), "triangles")
    assert got == {str(i): 6 for i in range(5)}
    assert triangle_count(g) == 10
    assert transitivity(g) == 1.0

    # K5 minus edge (1,2): counts [5,3,3,5,5]
    g2 = graph_from_edge_names(
        spark, [e for e in k5_edges if e != ("1", "2")], directed=False
    )
    got2 = by_name(g2, triangles(g2), "triangles")
    assert got2 == {"0": 5, "1": 3, "2": 3, "3": 5, "4": 5}

    # + self-loop (3,3): unchanged — self-loops ignored (cluster.py:62)
    g3 = graph_from_edge_names(
        spark, [e for e in k5_edges if e != ("1", "2")] + [("3", "3")], directed=False
    )
    got3 = by_name(g3, triangles(g3), "triangles")
    assert got3 == got2


def test_t4_all_triangles_enumeration(spark):
    # triangle abc (test_cluster.py:80-123)
    g = graph_from_edge_names(spark, [("a", "b"), ("b", "c"), ("c", "a")], directed=False)
    names = {r["id"]: r["url"] for r in g.vertices.collect()}
    tris = {
        tuple(sorted(names[x] for x in (r["a"], r["b"], r["c"])))
        for r in all_triangles(g).collect()
    }
    assert tris == {("a", "b", "c")}

    # two overlapping triangles {0,1,2},{0,2,3}
    g2 = graph_from_edge_names(
        spark, [("0", "1"), ("1", "2"), ("2", "0"), ("2", "3"), ("3", "0")], directed=False
    )
    names2 = {r["id"]: r["url"] for r in g2.vertices.collect()}
    tris2 = {
        tuple(sorted(names2[x] for x in (r["a"], r["b"], r["c"])))
        for r in all_triangles(g2).collect()
    }
    assert tris2 == {("0", "1", "2"), ("0", "2", "3")}


def test_clustering_vs_oracle(spark):
    kg = nx.karate_club_graph()
    edges = [(f"{u:02d}", f"{v:02d}") for u, v in kg.edges()]
    g = graph_from_edge_names(spark, edges, directed=False)
    got_t = by_name(g, triangles(g), "triangles")
    ref_t = nx.triangles(kg)
    assert got_t == {f"{k:02d}": v for k, v in ref_t.items()}
    got_c = by_name(g, clustering(g), "clustering")
    ref_c = nx.clustering(kg)
    for k, v in ref_c.items():
        assert got_c[f"{k:02d}"] == pytest.approx(v, abs=1e-12)
    assert transitivity(g) == pytest.approx(nx.transitivity(kg), abs=1e-12)
    assert average_clustering(g) == pytest.approx(nx.average_clustering(kg), abs=1e-12)


def test_multigraph_parallel_edges_ignored(spark):
    # parallel edges don't create extra triangles (simple-graph semantics)
    g = graph_from_edge_names(
        spark,
        [("a", "b"), ("a", "b"), ("b", "c"), ("c", "a")],
        directed=False,
    )
    assert triangle_count(g) == 1


def test_all_triangles_distributed_path(spark):
    """Force the oriented wedge join (local_max_edges=0); triangle set
    must equal the local fast path's and nx's."""
    import networkx as nx

    kg = nx.karate_club_graph()
    edges = [(f"{u:02d}", f"{v:02d}") for u, v in kg.edges()]
    g = graph_from_edge_names(spark, edges, directed=False)
    nm = {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}
    dist = {
        tuple(sorted((nm[r["a"]], nm[r["b"]], nm[r["c"]])))
        for r in all_triangles(g, local_max_edges=0).collect()
    }
    local = {
        tuple(sorted((nm[r["a"]], nm[r["b"]], nm[r["c"]])))
        for r in all_triangles(g).collect()
    }
    ref = {
        tuple(sorted(f"{n:02d}" for n in t))
        for t in nx.all_triangles(nx.karate_club_graph())
    }
    assert dist == local == ref


def test_local_wedge_bound_sentinel_falls_back(spark, monkeypatch):
    """When the in-task wedge total exceeds the bound, the local kernel
    emits its null sentinel and all_triangles must transparently fall
    back to the distributed wedge+closing plan — same rows."""
    import linkgraph.operators.triangles as T

    edges = [(f"n{u}", f"n{v}") for u, v in
             [(0, 1), (1, 2), (2, 0), (0, 3), (3, 4), (4, 0), (1, 3)]]
    from linkgraph.graph import graph_from_edge_names

    g = graph_from_edge_names(spark, edges, directed=False)
    want = sorted(tuple(r) for r in T.all_triangles(g, local_max_edges=0).collect())
    monkeypatch.setattr(T, "LOCAL_TRI_MAX_WEDGE_BOUND", 1)
    got = sorted(tuple(r) for r in T.all_triangles(g).collect())
    assert got == want and len(got) == 3


def test_closing_join_is_shuffle_hash_past_broadcast_cap(spark, monkeypatch):
    """Plan-shape pin: beyond BROADCAST_CLOSING_MAX_EDGES the closing
    semi-join must be a ShuffledHashJoin (build = unique-key edge
    table), NOT a SortMergeJoin that sorts the O(Σ deg²) wedge stream
    (BENCH.md §7f: the wedge sort dominated task time and GC at 258M
    wedges)."""
    import networkx as nx

    import linkgraph.operators.triangles as T

    kg = nx.karate_club_graph()
    edges = [(f"{u:02d}", f"{v:02d}") for u, v in kg.edges()]
    g = graph_from_edge_names(spark, edges, directed=False)
    monkeypatch.setattr(T, "BROADCAST_CLOSING_MAX_EDGES", 0)
    tri = T.all_triangles(g, local_max_edges=0)
    plan = tri._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan and "LeftSemi" in plan
    # and it still enumerates the exact triangle set
    nm = {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}
    got = {
        tuple(sorted((nm[r["a"]], nm[r["b"]], nm[r["c"]])))
        for r in tri.collect()
    }
    ref = {
        tuple(sorted(f"{n:02d}" for n in t))
        for t in nx.all_triangles(nx.karate_club_graph())
    }
    assert got == ref
