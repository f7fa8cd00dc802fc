"""Harmonic-function / local-and-global-consistency node
classification vs a dense-numpy transliteration of the reference
iteration (networkx/algorithms/node_classification.py needs scipy,
which this sandbox lacks — ``_ref_predict`` below reproduces the
reference's F = P @ F + B loop, label-id assignment, and argmax
tie-break line by line on dense arrays)."""

import networkx as nx
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.operators.node_classification import (
    harmonic_function,
    local_and_global_consistency,
)


def _lg(spark, n, edges):
    return LinkGraph(
        vertices=spark.range(n).select("id"),
        edges=spark.createDataFrame(
            pd.DataFrame(edges, columns=["src", "dst"])
        ).select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            F.lit(1.0).alias("weight"),
        ),
        directed=False,
    )


def _seeds(spark, pairs):
    return spark.createDataFrame(pairs, "id long, label string")


def _ref_predict(n, edges, seed_pairs, mode, alpha=0.99, max_iter=30):
    """Reference harmonic_function / local_and_global_consistency on a
    dense adjacency (node_classification.py:60-80,150-175 verbatim,
    scipy sparse ops replaced by numpy equivalents)."""
    X = np.zeros((n, n))
    for u, v in edges:
        X[u, v] = 1.0
        X[v, u] = 1.0
    label_to_id, labels = {}, []
    for i, lab in seed_pairs:  # ascending node order, first appearance
        if lab not in label_to_id:
            label_to_id[lab] = len(label_to_id)
        labels.append([i, label_to_id[lab]])
    labels = np.array(labels)
    label_dict = np.array(
        [lab for lab, _ in sorted(label_to_id.items(), key=lambda x: x[1])]
    )
    n_classes = len(label_dict)
    Fm = np.zeros((n, n_classes))
    degrees = X.sum(axis=0)
    degrees[degrees == 0] = 1
    if mode == "harmonic":
        P = X / degrees[:, None]
        P[labels[:, 0]] = 0
        B = np.zeros((n, n_classes))
        B[labels[:, 0], labels[:, 1]] = 1
    else:
        D2 = 1.0 / np.sqrt(degrees)
        P = alpha * (D2[:, None] * X * D2[None, :])
        B = np.zeros((n, n_classes))
        B[labels[:, 0], labels[:, 1]] = 1 - alpha
    for _ in range(max_iter):
        Fm = P @ Fm + B
    return label_dict[np.argmax(Fm, axis=1)].tolist()


def test_harmonic_path_doc_example(spark):
    edges = [(0, 1), (1, 2), (2, 3)]
    g = _lg(spark, 4, edges)
    got = {
        r["id"]: r["label"]
        for r in harmonic_function(g, _seeds(spark, [(0, "A"), (3, "B")])).collect()
    }
    assert [got[i] for i in range(4)] == ["A", "A", "B", "B"]


@pytest.mark.parametrize("fn_pair", ["harmonic", "lgc"])
def test_matches_reference_on_random_graph(spark, fn_pair):
    G0 = nx.gnm_random_graph(40, 90, seed=7)
    edges = list(G0.edges())
    seed_pairs = [(i, f"L{i % 3}") for i in range(6)]
    g = _lg(spark, 40, edges)
    seeds = _seeds(spark, seed_pairs)
    if fn_pair == "harmonic":
        ours = harmonic_function(g, seeds)
    else:
        ours = local_and_global_consistency(g, seeds)
    ref = _ref_predict(40, edges, seed_pairs, fn_pair)
    got = {r["id"]: r["label"] for r in ours.collect()}
    assert [got[i] for i in range(40)] == ref


def test_unreached_node_gets_first_label(spark):
    # node 3 is isolated -> zero score row -> label id 0 ("A": first
    # appearance in ascending node order), matching reference argmax
    edges = [(0, 1), (1, 2)]
    g = _lg(spark, 4, edges)
    got = {
        r["id"]: r["label"]
        for r in harmonic_function(g, _seeds(spark, [(0, "A"), (2, "B")])).collect()
    }
    ref = _ref_predict(4, edges, [(0, "A"), (2, "B")], "harmonic")
    assert [got[i] for i in range(4)] == ref


def test_no_seeds_raises(spark):
    g = _lg(spark, 2, [(0, 1)])
    with pytest.raises(ValueError):
        harmonic_function(g, _seeds(spark, []))
