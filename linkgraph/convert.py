"""Format converters: pandas / numpy / dict-of-dicts / edge lists.

Parity targets (networkx/convert.py and convert_matrix.py):
``from_pandas_edgelist`` (convert_matrix.py:312), ``to_pandas_edgelist``
(:220), ``from_pandas_adjacency`` (:154), ``to_pandas_adjacency`` (:46),
``from_numpy_array`` (:1121), ``to_numpy_array`` (:882),
``from_dict_of_dicts`` (convert.py:374), ``to_dict_of_dicts`` (:253),
and the polymorphic ``to_networkx_graph`` dispatcher (convert.py:57).

These are the ORACLE-BOUNDARY helpers [cap in SURVEY §2]: they move
whole graphs between the driver and the cluster, so they are test- and
fixture-scale by design (a 100 TB edge table never materializes as a
pandas frame). The distributed ingest path is
``graph_from_pages`` / ``sources.edgelist``; dense-matrix forms
additionally materialize O(n²) cells and are only for small-n parity.

Node identity convention matches ``graph_from_edge_names``: node names
are stringified and become the ``url`` column; dense BIGINT ids are
assigned in lexicographic name order (documented divergence from the
reference's insertion order — tests compare by name, never raw id).
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .graph import LinkGraph, graph_from_edge_names


def _names(g: LinkGraph) -> dict[int, str]:
    return {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}


def from_pandas_edgelist(
    spark: SparkSession,
    df: pd.DataFrame,
    source: str = "source",
    target: str = "target",
    edge_attr: str | None = None,
    directed: bool = True,
) -> LinkGraph:
    """``nx.from_pandas_edgelist`` (convert_matrix.py:312): one edge per
    row; ``edge_attr`` names the weight column (None → weight 1)."""
    if edge_attr is not None:
        edges = [
            (r[source], r[target], float(r[edge_attr]))
            for _, r in df.iterrows()
        ]
    else:
        edges = [(r[source], r[target]) for _, r in df.iterrows()]
    return graph_from_edge_names(spark, edges, directed=directed)


def to_pandas_edgelist(
    g: LinkGraph, source: str = "source", target: str = "target"
) -> pd.DataFrame:
    """``nx.to_pandas_edgelist`` (convert_matrix.py:220): (source,
    target, weight) with node NAMES, parallel edges preserved."""
    nm = _names(g)
    rows = [
        (nm[r["src"]], nm[r["dst"]], r["weight"])
        for r in g.weighted_edges().collect()
    ]
    return pd.DataFrame(rows, columns=[source, target, "weight"])


def from_pandas_adjacency(
    spark: SparkSession, df: pd.DataFrame, directed: bool = False
) -> LinkGraph:
    """``nx.from_pandas_adjacency`` (convert_matrix.py:154): square
    frame, index == columns == node names, nonzero cell = edge with
    that weight. Undirected input reads the upper triangle + diagonal
    (the frame must be symmetric, as in the reference)."""
    if list(df.index) != list(df.columns):
        raise ValueError(
            "adjacency frame must have matching index and columns "
            "(convert_matrix.py:201 parity)"
        )
    names = list(df.index)
    edges = []
    for i, u in enumerate(names):
        for j, v in enumerate(names):
            w = df.iloc[i, j]
            if w != 0:
                if not directed and j < i:
                    continue  # symmetric: keep canonical half + diagonal
                edges.append((u, v, float(w)))
    return graph_from_edge_names(spark, edges, nodes=names, directed=directed)


def to_pandas_adjacency(g: LinkGraph) -> pd.DataFrame:
    """``nx.to_pandas_adjacency`` (convert_matrix.py:46): dense weight
    matrix over node names (name-sorted order = id order); parallel
    edges sum (CSR coalescing, convert_matrix.py:490)."""
    nm = _names(g)
    names = [nm[i] for i in sorted(nm)]
    idx = {n: i for i, n in enumerate(names)}
    import numpy as np

    a = np.zeros((len(names), len(names)))
    base = g.coalesced_edges(directed=True) if g.directed else g.undirected_edges()
    for r in base.collect():
        i, j = idx[nm[r["src"]]], idx[nm[r["dst"]]]
        a[i, j] = r["weight"]
        if not g.directed:
            a[j, i] = r["weight"]
    return pd.DataFrame(a, index=names, columns=names)


def from_numpy_array(
    spark: SparkSession, a, directed: bool = False
) -> LinkGraph:
    """``nx.from_numpy_array`` (convert_matrix.py:1121): nonzero cells
    become weighted edges; node names are the stringified indices."""
    import numpy as np

    a = np.asarray(a)
    if a.ndim != 2 or a.shape[0] != a.shape[1]:
        raise ValueError("adjacency array must be square")
    n = a.shape[0]
    edges = []
    for i in range(n):
        for j in range(n):
            if a[i, j] != 0:
                if not directed and j < i:
                    continue
                edges.append((i, j, float(a[i, j])))
    return graph_from_edge_names(
        spark, edges, nodes=list(range(n)), directed=directed
    )


def to_numpy_array(g: LinkGraph):
    """``nx.to_numpy_array`` (convert_matrix.py:882) — dense matrix in
    name-sorted (== id) order."""
    return to_pandas_adjacency(g).to_numpy()


def from_dict_of_dicts(
    spark: SparkSession, dod: dict, directed: bool = False
) -> LinkGraph:
    """``nx.from_dict_of_dicts`` (convert.py:374): {u: {v: attrs}};
    ``attrs['weight']`` is honored, other attrs dropped (the engine's
    edge schema is (src, dst, weight))."""
    edges = []
    seen = set()
    for u, nbrs in dod.items():
        for v, attrs in nbrs.items():
            if not directed:
                key = (min(str(u), str(v)), max(str(u), str(v)))
                if key in seen:
                    continue  # undirected dod lists each edge twice
                seen.add(key)
            w = attrs.get("weight") if isinstance(attrs, dict) else None
            edges.append((u, v) if w is None else (u, v, float(w)))
    return graph_from_edge_names(
        spark, edges, nodes=list(dod), directed=directed
    )


def to_dict_of_dicts(g: LinkGraph) -> dict:
    """``nx.to_dict_of_dicts`` (convert.py:253): {u: {v: {'weight': w}}}
    over node names; undirected graphs list each edge both ways;
    parallel edges coalesce (weight summed)."""
    nm = _names(g)
    out: dict = {n: {} for n in nm.values()}
    base = g.coalesced_edges(directed=True)
    for r in base.collect():
        u, v, w = nm[r["src"]], nm[r["dst"]], r["weight"]
        out[u][v] = {"weight": w}
        if not g.directed:
            out[v][u] = {"weight": w}
    return out


def to_networkx_graph(
    spark: SparkSession, data: Any, directed: bool = False
) -> LinkGraph:
    """Polymorphic constructor (``nx.convert.to_networkx_graph``,
    convert.py:57): dispatches on input type — LinkGraph (pass-through),
    dict-of-dicts, pandas DataFrame (square + index==columns →
    adjacency, else edgelist), 2-D numpy array, or an (u, v[, w]) edge
    iterable."""
    import numpy as np

    if isinstance(data, LinkGraph):
        return data
    if isinstance(data, dict):
        return from_dict_of_dicts(spark, data, directed=directed)
    if isinstance(data, pd.DataFrame):
        if data.shape[0] == data.shape[1] and list(data.index) == list(data.columns):
            return from_pandas_adjacency(spark, data, directed=directed)
        cols = set(data.columns)
        src = "source" if "source" in cols else data.columns[0]
        dst = "target" if "target" in cols else data.columns[1]
        attr = "weight" if "weight" in cols else None
        return from_pandas_edgelist(
            spark, data, source=src, target=dst, edge_attr=attr, directed=directed
        )
    if isinstance(data, np.ndarray):
        return from_numpy_array(spark, data, directed=directed)
    try:
        edges = list(data)
    except TypeError:
        raise TypeError(f"cannot convert {type(data).__name__} to a LinkGraph")
    return graph_from_edge_names(spark, edges, directed=directed)
