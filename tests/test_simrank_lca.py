"""SimRank pair-table power iteration + DAG lowest common ancestors
vs the live networkx reference (similarity.py simrank_similarity,
lowest_common_ancestors.py all_pairs_lowest_common_ancestor)."""

import networkx as nx
import pandas as pd
import pytest
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.operators.dag import (
    GraphContainsCycle,
    lowest_common_ancestors,
)
from linkgraph.operators.simrank import simrank_similarity


def _lg(spark, n, edges, directed):
    return LinkGraph(
        vertices=spark.range(n).select("id"),
        edges=spark.createDataFrame(
            pd.DataFrame(edges, columns=["src", "dst"])
        ).select(
            F.col("src").cast("long"), F.col("dst").cast("long"),
            F.lit(1.0).alias("weight"),
        ),
        directed=directed,
    )


def _ref_simrank(G, C, iters):
    """The reference loop body (networkx similarity.py
    _simrank_similarity_python) run a fixed number of times from the
    identity start — dict arithmetic, no scipy."""
    nodes = list(G)
    Gadj = G.pred if G.is_directed() else G.adj
    sim = {u: {v: 1.0 if u == v else 0.0 for v in nodes} for u in nodes}
    for _ in range(iters):
        old = sim
        sim = {}
        for u in nodes:
            sim[u] = {}
            for v in nodes:
                if u == v:
                    sim[u][v] = 1.0
                    continue
                nu, nv = list(Gadj[u]), list(Gadj[v])
                if not nu or not nv:
                    sim[u][v] = 0.0
                    continue
                s = sum(old[w][x] for w in nu for x in nv)
                sim[u][v] = C * s / (len(nu) * len(nv))
    return sim


@pytest.mark.parametrize("directed", [True, False])
def test_simrank_fixed_iters_vs_reference(spark, directed):
    G = nx.gnm_random_graph(14, 30, seed=5, directed=directed)
    g = _lg(spark, 14, list(G.edges()), directed)
    got = {(r["a"], r["b"]): r["sim"]
           for r in simrank_similarity(g, max_iter=3).collect()}
    ref = _ref_simrank(G, 0.9, 3)
    for u in G:
        for v in G:
            assert got.get((u, v), 0.0) == pytest.approx(ref[u][v], abs=1e-12)


def test_simrank_tolerance_matches_nx(spark):
    G = nx.gnm_random_graph(12, 25, seed=9, directed=True)
    g = _lg(spark, 12, list(G.edges()), True)
    ours = {(r["a"], r["b"]): r["sim"]
            for r in simrank_similarity(
                g, importance_factor=0.6, tolerance=1e-4, max_iter=200
            ).collect()}
    ref = nx.simrank_similarity(G, importance_factor=0.6, tolerance=1e-4)
    for u in G:
        for v in G:
            assert ours.get((u, v), 0.0) == pytest.approx(ref[u][v], abs=1e-9)


def test_simrank_nonconvergence_raises(spark):
    # sim(0,1) moves 0 -> 0.9 in the first iteration (shared self-loop
    # predecessor), so one iteration cannot satisfy tol=1e-12 — the
    # reference raises ExceededMaxIterations here too
    g = _lg(spark, 2, [(0, 0), (0, 1)], True)
    with pytest.raises(RuntimeError):
        simrank_similarity(g, tolerance=1e-12, max_iter=1)


def _valid_lcas(G, u, v):
    common = (nx.ancestors(G, u) | {u}) & (nx.ancestors(G, v) | {v})
    return {w for w in common if not (nx.descendants(G, w) & common)}


def test_lca_returns_a_valid_lowest_common_ancestor(spark):
    G = nx.gnm_random_graph(30, 60, seed=11, directed=True)
    dag = nx.DiGraph((u, v) for u, v in G.edges() if u < v)
    dag.add_nodes_from(G)
    g = _lg(spark, 30, list(dag.edges()), True)
    qp = [(3, 27), (6, 6), (0, 29), (10, 20), (1, 2)]
    pairs = spark.createDataFrame(qp, "u long, v long")
    got = {(r["u"], r["v"]): r["lca"]
           for r in lowest_common_ancestors(g, pairs).collect()}
    for u, v in qp:
        valid = _valid_lcas(dag, u, v)
        if not valid:
            assert (u, v) not in got
        else:
            assert got[(u, v)] in valid
    assert got[(6, 6)] == 6


def test_lca_rejects_cycles(spark):
    g = _lg(spark, 3, [(0, 1), (1, 2), (2, 0)], True)
    pairs = spark.createDataFrame([(0, 1)], "u long, v long")
    with pytest.raises(GraphContainsCycle):
        lowest_common_ancestors(g, pairs).collect()
