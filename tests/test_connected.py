"""Ported connected-components suite (networkx/algorithms/components/
tests/test_connected.py) — fixtures C1-C3 of FIXTURES.md."""

import networkx as nx
import pytest

from linkgraph.graph import graph_from_edge_names, graph_from_pages
from linkgraph.operators.components import (
    connected_components,
    is_connected,
    node_connected_component,
    number_connected_components,
)
from linkgraph.sources import corpus


def component_sets(graph, labels_df):
    id_to_name = {r["id"]: r["url"].rsplit("/", 1)[-1] for r in graph.vertices.collect()}
    comps: dict = {}
    for r in labels_df.collect():
        comps.setdefault(r["component"], set()).add(id_to_name[r["id"]])
    return {frozenset(s) for s in comps.values()}


def c1_nx():
    # test_connected.py:10-16: union(grid_2d(2,2), lollipop(3,3), house)
    g1 = nx.convert_node_labels_to_integers(nx.grid_2d_graph(2, 2))
    g2 = nx.convert_node_labels_to_integers(nx.lollipop_graph(3, 3), first_label=4)
    g3 = nx.convert_node_labels_to_integers(nx.house_graph(), first_label=10)
    return nx.union(g1, nx.union(g2, g3))


def test_c1_component_sets_exact(spark):
    g_nx = c1_nx()
    # pad node names to fixed width so lexicographic url order == numeric
    edges = [(f"{u:02d}", f"{v:02d}") for u, v in g_nx.edges()]
    g = graph_from_edge_names(spark, edges, directed=False)
    got = component_sets(g, connected_components(g))
    expected = {frozenset(f"{n:02d}" for n in comp) for comp in nx.connected_components(g_nx)}
    assert got == expected
    assert expected == {
        frozenset(f"{n:02d}" for n in s)
        for s in [set(range(4)), set(range(4, 10)), set(range(10, 15))]
    }
    assert number_connected_components(g) == 3
    assert not is_connected(g)


def test_c2_grid_single_component_full_ingest(spark):
    # C2: grid_2d_graph(4,4) relabeled 1..16, via the pages->edges path
    g_nx = nx.convert_node_labels_to_integers(nx.grid_2d_graph(4, 4), first_label=1)
    edges = [(f"{u:02d}", f"{v:02d}") for u, v in g_nx.edges()]
    pages = corpus.pages_df(spark, "c2", edges)
    g = graph_from_pages(pages, directed=False)
    labels = connected_components(g)
    assert component_sets(g, labels) == {frozenset(f"{n:02d}" for n in range(1, 17))}
    assert is_connected(g)
    # node_connected_component golden (test_connected.py:106-116)
    some_id = g.vertices.first()["id"]
    assert node_connected_component(g, some_id).count() == 16


def test_c3_isolated_nodes(spark):
    g = graph_from_edge_names(spark, [], nodes=["1", "2"], directed=False)
    assert number_connected_components(g) == 2
    assert not is_connected(g)


def test_null_graph_raises(spark):
    g = graph_from_edge_names(spark, [], nodes=[], directed=False)
    with pytest.raises(ValueError):
        is_connected(g)


def test_directed_symmetrized_weak_semantics(spark):
    # directed chain 1->2->3 plus isolated 4: weakly 2 components
    g = graph_from_edge_names(spark, [("1", "2"), ("2", "3")], nodes=["4"], directed=True)
    assert number_connected_components(g) == 2


def test_long_path_log_convergence(spark, tmp_ckpt):
    # pointer jumping: 64-node path must converge well inside 64 iters
    import json
    import os

    edges = [(f"{i:03d}", f"{i + 1:03d}") for i in range(63)]
    g = graph_from_edge_names(spark, edges, directed=False)
    labels = connected_components(g, checkpoint_dir=tmp_ckpt, checkpoint_every=100)
    assert labels.select("component").distinct().count() == 1
    ledger = os.path.join(tmp_ckpt, "connected_components.ledger.jsonl")
    recs = [json.loads(l) for l in open(ledger)]
    # O(log n): diameter 63 must close in ~log2(63)+slack supersteps
    assert len(recs) <= 12


def test_distributed_path_matches_local(spark):
    """Force the superstep loop (local_max_edges=0) and assert it gives
    byte-identical labels to the local fast path on the same graph."""
    import networkx as nx
    from pyspark.sql import functions as F

    kg = nx.karate_club_graph()
    edges = [(f"{u:02d}", f"{v:02d}") for u, v in kg.edges()]
    g = graph_from_edge_names(spark, edges, nodes=["zz"], directed=False)
    local = {r["id"]: r["component"] for r in connected_components(g).collect()}
    dist = {
        r["id"]: r["component"]
        for r in connected_components(g, local_max_edges=0).collect()
    }
    assert local == dist


def test_distributed_high_diameter_contracts_to_exact_labels(spark):
    """Regression (round 4): min-label propagation advances a basin
    boundary ~1 step/round, so a high-diameter graph with PERMUTED ids
    (labels give pointer jumping nothing to compress) exhausted
    max_iter and silently returned a wrong labeling — caught by the
    incremental-CC oracle at sf0.1 (600-long nation chains). The loop
    now star-contracts the partial labeling and recurses; labels must
    equal the exact local kernel's bit-for-bit."""
    import random

    from pyspark.sql import functions as F

    from linkgraph.graph import LinkGraph
    from linkgraph.operators.components import connected_components

    n = 900
    rng = random.Random(11)
    perm = list(range(n))
    rng.shuffle(perm)
    edges = [(perm[i], perm[i + 1]) for i in range(n - 1) if (i + 1) % 300 != 0]
    g = LinkGraph(
        vertices=spark.range(n).select("id"),
        edges=spark.createDataFrame(edges, "src long, dst long").withColumn(
            "weight", F.lit(1.0)
        ),
        directed=False,
    )
    stats = {}
    dist = {
        r["id"]: r["component"]
        for r in connected_components(g, local_max_edges=0, stats_out=stats).collect()
    }
    local = {
        r["id"]: r["component"] for r in connected_components(g).collect()
    }
    assert dist == local
    assert stats.get("contraction_levels", 0) >= 1, stats


def test_contraction_stacks_multiple_levels(spark):
    """Force several contraction levels with a tiny phase budget: the
    level composition must still land on the exact min-id labeling."""
    import random

    from pyspark.sql import functions as F

    from linkgraph.graph import LinkGraph
    from linkgraph.operators.components import connected_components

    n = 240
    rng = random.Random(5)
    perm = list(range(n))
    rng.shuffle(perm)
    edges = [(perm[i], perm[i + 1]) for i in range(n - 1) if (i + 1) % 80 != 0]
    g = LinkGraph(
        vertices=spark.range(n).select("id"),
        edges=spark.createDataFrame(edges, "src long, dst long").withColumn(
            "weight", F.lit(1.0)
        ),
        directed=False,
    )
    stats = {}
    dist = {
        r["id"]: r["component"]
        for r in connected_components(
            g, local_max_edges=0, max_iter=3, stats_out=stats
        ).collect()
    }
    local = {r["id"]: r["component"] for r in connected_components(g).collect()}
    assert dist == local
    assert stats.get("contraction_levels", 0) >= 2, stats
