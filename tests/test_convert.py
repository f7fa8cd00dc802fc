"""Converter round-trips vs networkx oracles (convert.py /
convert_matrix.py parity: pandas edgelist/adjacency, numpy array,
dict-of-dicts, polymorphic dispatch)."""

import networkx as nx
import numpy as np
import pandas as pd
import pytest

from linkgraph import convert
from linkgraph.graph import LinkGraph, graph_from_edge_names


def names(g):
    return {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}


def edge_name_set(g):
    nm = names(g)
    return {
        (nm[r["src"]], nm[r["dst"]])
        for r in g.edges.select("src", "dst").collect()
    }


def test_pandas_edgelist_roundtrip(spark):
    df = pd.DataFrame(
        {"source": ["a", "b", "c"], "target": ["b", "c", "a"], "w": [1.0, 2.0, 3.0]}
    )
    g = convert.from_pandas_edgelist(spark, df, edge_attr="w", directed=True)
    ref = nx.from_pandas_edgelist(
        df, edge_attr="w", create_using=nx.DiGraph
    )
    assert edge_name_set(g) == {(str(u), str(v)) for u, v in ref.edges}
    back = convert.to_pandas_edgelist(g)
    got = {(r.source, r.target): r.weight for r in back.itertuples()}
    assert got == {("a", "b"): 1.0, ("b", "c"): 2.0, ("c", "a"): 3.0}


def test_pandas_adjacency_roundtrip(spark):
    a = pd.DataFrame(
        [[0, 2, 0], [2, 0, 1], [0, 1, 0]],
        index=["x", "y", "z"],
        columns=["x", "y", "z"],
    )
    g = convert.from_pandas_adjacency(spark, a, directed=False)
    ref = nx.from_pandas_adjacency(a)
    assert g.edges.count() == ref.number_of_edges()
    back = convert.to_pandas_adjacency(g)
    ref_back = nx.to_pandas_adjacency(ref, nodelist=["x", "y", "z"])
    assert np.allclose(back.to_numpy(), ref_back.to_numpy())


def test_pandas_adjacency_mismatched_labels_raises(spark):
    a = pd.DataFrame([[0, 1], [1, 0]], index=["x", "y"], columns=["p", "q"])
    with pytest.raises(ValueError):
        convert.from_pandas_adjacency(spark, a)


def test_numpy_array_roundtrip(spark):
    a = np.array([[0.0, 1.0, 0.0], [1.0, 0.0, 2.0], [0.0, 2.0, 0.5]])
    g = convert.from_numpy_array(spark, a, directed=False)
    ref = nx.from_numpy_array(a)
    assert g.edges.count() == ref.number_of_edges()
    back = convert.to_numpy_array(g)
    assert np.allclose(back, nx.to_numpy_array(ref, nodelist=[0, 1, 2]))


def test_dict_of_dicts_roundtrip(spark):
    dod = {
        "a": {"b": {"weight": 2.0}},
        "b": {"a": {"weight": 2.0}, "c": {}},
        "c": {"b": {}},
    }
    g = convert.from_dict_of_dicts(spark, dod, directed=False)
    ref = nx.from_dict_of_dicts(dod)
    assert g.edges.count() == ref.number_of_edges()
    back = convert.to_dict_of_dicts(g)
    assert set(back) == {"a", "b", "c"}
    assert back["a"]["b"]["weight"] == 2.0
    assert back["b"]["c"]["weight"] == 1.0  # default weight applied
    assert "b" in back["c"]  # undirected lists both directions


def test_to_networkx_graph_dispatch(spark):
    # dict
    g = convert.to_networkx_graph(spark, {"a": {"b": {}}, "b": {"a": {}}})
    assert g.edges.count() == 1
    # edge iterable
    g = convert.to_networkx_graph(spark, [(1, 2), (2, 3)], directed=True)
    assert g.edges.count() == 2
    # numpy
    g = convert.to_networkx_graph(spark, np.array([[0, 1], [1, 0]]))
    assert g.edges.count() == 1
    # pandas edgelist (non-square)
    df = pd.DataFrame({"source": ["a"], "target": ["b"]})
    g = convert.to_networkx_graph(spark, df, directed=True)
    assert edge_name_set(g) == {("a", "b")}
    # LinkGraph pass-through
    g2 = convert.to_networkx_graph(spark, g)
    assert g2 is g
    with pytest.raises(TypeError):
        convert.to_networkx_graph(spark, 42)


def test_point_helpers(spark):
    g = graph_from_edge_names(
        spark, [(0, 1), (1, 2)], nodes=[5], directed=True
    )
    ids = {r["url"].rsplit("/", 1)[-1]: r["id"] for r in g.vertices.collect()}
    assert g.has_node(ids["0"]) and g.has_node(ids["5"])
    assert not g.has_node(10_000)
    assert g.has_edge(ids["0"], ids["1"])
    assert not g.has_edge(ids["1"], ids["0"])  # directed
    gu = graph_from_edge_names(spark, [(0, 1), (1, 2)], directed=False)
    idu = {r["url"].rsplit("/", 1)[-1]: r["id"] for r in gu.vertices.collect()}
    assert gu.has_edge(idu["1"], idu["0"])  # either direction
    nbrs = {r["id"] for r in g.neighbors(ids["1"]).collect()}
    assert nbrs == {ids["2"]}
    nbu = {r["id"] for r in gu.neighbors(idu["1"]).collect()}
    assert nbu == {idu["0"], idu["2"]}
    picked = {r["id"] for r in g.nbunch_iter([ids["0"], 10_000]).collect()}
    assert picked == {ids["0"]}  # unknown ids silently dropped
    assert g.nbunch_iter().count() == 4
