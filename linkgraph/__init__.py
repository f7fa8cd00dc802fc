"""linkgraph — a from-scratch PySpark-native link-graph analytics engine.

Reimplements the reference's (networkx) link-graph capabilities —
pagerank, connected_components, label_propagation_communities,
triangles — as iterative DataFrame programs over an edge table
extracted from Common-Crawl-style web pages, plus the large-scale
training-data operators (dedup, similarity search, text analysis)
such a corpus pipeline needs. See SURVEY.md for the reference
analysis and the operator-by-operator parity map.
"""

from .graph import LinkGraph, assign_dense_ids, build_adjacency, graph_from_edge_names, graph_from_pages
from .operators.components import (
    connected_components,
    is_connected,
    node_connected_component,
    number_connected_components,
)
from .operators.label_propagation import communities, label_propagation_communities
from .operators.pagerank import pagerank
from .operators.triangles import (
    all_triangles,
    average_clustering,
    clustering,
    transitivity,
    triangle_count,
    triangles,
)
from .plans.loop import PowerIterationFailedConvergence, SuperstepLoop
from .session import get_spark

__all__ = [
    "LinkGraph",
    "PowerIterationFailedConvergence",
    "SuperstepLoop",
    "all_triangles",
    "assign_dense_ids",
    "average_clustering",
    "build_adjacency",
    "clustering",
    "communities",
    "connected_components",
    "get_spark",
    "graph_from_edge_names",
    "graph_from_pages",
    "is_connected",
    "label_propagation_communities",
    "node_connected_component",
    "number_connected_components",
    "pagerank",
    "transitivity",
    "triangle_count",
    "triangles",
]

__version__ = "0.1.0"
