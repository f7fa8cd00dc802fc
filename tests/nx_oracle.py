"""Live networkx-3.6.1 oracle helpers (scipy absent → pure-python paths).

Tests compare engine DataFrames against these, per SURVEY.md §5:
pagerank via `_pagerank_python` (networkx/algorithms/link_analysis/
pagerank_alg.py:115), components/communities/triangles exact.
"""

from __future__ import annotations

import networkx as nx
from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python


def nx_graph(edges, nodes=(), directed=False, multi=False):
    cls = {
        (False, False): nx.Graph,
        (True, False): nx.DiGraph,
        (False, True): nx.MultiGraph,
        (True, True): nx.MultiDiGraph,
    }[(directed, multi)]
    g = cls()
    g.add_nodes_from(nodes)
    for e in edges:
        if len(e) > 2:
            g.add_edge(e[0], e[1], weight=e[2])
        else:
            g.add_edge(e[0], e[1])
    return g


def oracle_pagerank(g, **kw):
    return _pagerank_python(g, **kw)


def ranks_by_name(graph, ranks_df):
    """engine ranks(id, rank) -> {node_name: rank} via the url dictionary."""
    v = {r["id"]: r["url"] for r in graph.vertices.collect()}
    return {v[r["id"]].rsplit("/", 1)[-1]: r["rank"] for r in ranks_df.collect()}
