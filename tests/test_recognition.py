"""nx-parity tests for tree/forest/Eulerian recognition predicates."""

import networkx as nx
import pytest

from linkgraph.graph import LinkGraph
from linkgraph.operators.recognition import (
    has_eulerian_path,
    is_eulerian,
    is_forest,
    is_tree,
)


def _g(spark, edges, n, directed=False):
    import pyspark.sql.functions as F

    e = spark.createDataFrame(
        [(a, b, None) for a, b in edges], "src long, dst long, weight double"
    )
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    return LinkGraph(vertices=v, edges=e, directed=directed)


CASES = [
    # (edges, n, directed)
    ([(0, 1), (1, 2), (2, 3)], 4, False),                 # path: tree
    ([(0, 1), (1, 2), (2, 0)], 3, False),                 # triangle: eulerian
    ([(0, 1), (1, 2), (2, 0), (0, 3)], 4, False),         # lollipop: euler path only
    ([(0, 1), (1, 2), (2, 0)], 4, False),                 # triangle + isolate
    ([(0, 1), (2, 3)], 4, False),                         # forest, 2 comps
    ([(0, 1), (1, 2), (2, 0), (0, 3), (3, 4), (4, 0)], 5, False),  # two cycles
    ([(0, 1), (1, 2), (2, 0)], 3, True),                  # directed 3-cycle
    ([(0, 1), (1, 2)], 3, True),                          # directed path
    ([(0, 1), (1, 2), (2, 0), (0, 2)], 3, True),          # imbalanced
]


@pytest.mark.parametrize("edges,n,directed", CASES)
def test_recognition_parity(spark, edges, n, directed):
    g = _g(spark, edges, n, directed)
    G = (nx.DiGraph if directed else nx.Graph)()
    G.add_nodes_from(range(n))
    G.add_edges_from(edges)
    if not directed:
        assert is_forest(g) == nx.is_forest(G)
        assert is_tree(g) == nx.is_tree(G)
    assert is_eulerian(g) == nx.is_eulerian(G)
    assert has_eulerian_path(g) == nx.has_eulerian_path(G)


def test_null_graph_raises(spark):
    g = _g(spark, [], 0)
    with pytest.raises(ValueError):
        is_tree(g)
    with pytest.raises(ValueError):
        is_forest(g)
