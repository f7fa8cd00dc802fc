"""partition_quality (coverage, performance) vs the live networkx
oracle (community/quality.py)."""

import networkx as nx
import pytest

from linkgraph.graph import graph_from_edge_names
from linkgraph.operators.community_metrics import partition_quality

from nx_oracle import nx_graph

EDGES = list(nx.karate_club_graph().edges())


def _labels_df(spark, g, assign):
    from pyspark.sql import functions as F

    nm = {r["url"].rsplit("/", 1)[-1]: r["id"] for r in g.vertices.collect()}
    rows = [(nm[str(n)], int(lab)) for n, lab in assign.items()]
    return spark.createDataFrame(rows, "id LONG, label LONG")


@pytest.mark.parametrize("n_parts", [2, 4])
def test_partition_quality_vs_nx(spark, n_parts):
    g = graph_from_edge_names(spark, EDGES, directed=False)
    G = nx_graph(EDGES, directed=False)
    assign = {n: n % n_parts for n in G.nodes}
    parts = [
        {n for n in G.nodes if assign[n] == p} for p in range(n_parts)
    ]
    cov, perf = nx.community.partition_quality(G, parts)
    row = partition_quality(g, _labels_df(spark, g, assign)).first()
    assert row["coverage"] == pytest.approx(cov, abs=1e-9)
    assert row["performance"] == pytest.approx(perf, abs=1e-9)
