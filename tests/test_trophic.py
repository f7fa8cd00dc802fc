"""Trophic levels/differences/incoherence vs a dense-numpy
transliteration of the reference (networkx/algorithms/centrality/
trophic.py needs scipy for nx.adjacency_matrix, which this sandbox
lacks — ``_ref_levels`` reproduces the reference's matrix algebra
line by line)."""

import networkx as nx
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.operators.trophic import (
    trophic_differences,
    trophic_incoherence_parameter,
    trophic_levels,
)


def _lg(spark, n, edges, weights=None):
    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    pdf["weight"] = weights if weights is not None else 1.0
    return LinkGraph(
        vertices=spark.range(n).select("id"),
        edges=spark.createDataFrame(pdf).select(
            F.col("src").cast("long"), F.col("dst").cast("long"),
            F.col("weight").cast("double"),
        ),
        directed=True,
    )


def _ref_levels(n, edges, weights=None):
    """trophic.py:12-60 with scipy's adjacency_matrix replaced by a
    dense numpy matrix (same .T, same row-normalize, same
    basal-column drop AFTER normalization)."""
    A = np.zeros((n, n))
    w = weights if weights is not None else [1.0] * len(edges)
    for (u, v), wt in zip(edges, w):
        A[u, v] += wt
    a = A.T
    rowsum = a.sum(axis=1)
    nz = rowsum != 0
    p = a[nz][:, nz] / rowsum[nz][:, None]
    y = np.linalg.inv(np.eye(p.shape[0]) - p).sum(axis=1) + 1
    levels = {}
    for i in np.where(~nz)[0]:
        levels[i] = 1.0
    for k, i in enumerate(np.where(nz)[0]):
        levels[i] = y[k]
    return levels


def test_three_level_chain(spark):
    # 0 -> 1 -> 2: textbook food chain, levels 1, 2, 3
    g = _lg(spark, 3, [(0, 1), (1, 2)])
    got = {r["id"]: r["level"] for r in trophic_levels(g).collect()}
    assert got == {0: 1.0, 1: 2.0, 2: 3.0}


@pytest.mark.parametrize("weighted", [False, True])
def test_matches_reference_on_random_dag(spark, weighted):
    G0 = nx.gnm_random_graph(25, 70, seed=13, directed=True)
    edges = [(u, v) for u, v in G0.edges() if u < v]
    weights = [1.0 + ((u * 7 + v) % 5) for u, v in edges] if weighted else None
    g = _lg(spark, 25, edges, weights)
    got = {r["id"]: r["level"] for r in trophic_levels(g).collect()}
    ref = _ref_levels(25, edges, weights)
    for i in range(25):
        assert got[i] == pytest.approx(ref[i], abs=1e-9)


def test_cyclic_convergent_matches_reference(spark):
    # 2-cycle fed by a basal node: spectral radius < 1, Jacobi converges
    edges = [(0, 1), (1, 2), (2, 1)]
    g = _lg(spark, 3, edges)
    got = {r["id"]: r["level"] for r in trophic_levels(g).collect()}
    ref = _ref_levels(3, edges)
    for i in range(3):
        assert got[i] == pytest.approx(ref[i], abs=1e-9)


def test_singular_raises(spark):
    # pure 2-cycle with no basal input: I - P is singular
    g = _lg(spark, 2, [(0, 1), (1, 0)])
    with pytest.raises(RuntimeError):
        trophic_levels(g, max_iter=20)


def test_differences_and_incoherence(spark):
    edges = [(0, 1), (1, 2), (0, 2)]
    g = _lg(spark, 3, edges)
    ref = _ref_levels(3, edges)
    diffs = {(r["src"], r["dst"]): r["diff"]
             for r in trophic_differences(g).collect()}
    for (u, v), d in diffs.items():
        assert d == pytest.approx(ref[v] - ref[u], abs=1e-9)
    q = trophic_incoherence_parameter(g)
    assert q == pytest.approx(np.std([ref[v] - ref[u] for u, v in edges]), abs=1e-9)


def test_undirected_raises(spark):
    g = LinkGraph(
        vertices=spark.range(2).select("id"),
        edges=spark.createDataFrame([(0, 1, 1.0)], "src long, dst long, weight double"),
        directed=False,
    )
    with pytest.raises(ValueError):
        trophic_levels(g)
