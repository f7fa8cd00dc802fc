"""Graph binary set operations.

Parity with networkx/algorithms/operators/binary.py: ``union`` (:20,
disjoint node sets required), ``disjoint_union`` (:84, id-offset
relabel), ``intersection`` (:138), ``difference`` (:183),
``symmetric_difference`` (:238), ``compose`` (:301, H attrs win).
All are single equi-/semi-/anti-joins or unions on the edge tables —
no custom shuffle logic needed; Catalyst broadcasts the small side.
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def _edge_keys(g: LinkGraph) -> DataFrame:
    return g.edges.select("src", "dst").distinct()


def union(g: LinkGraph, h: LinkGraph) -> LinkGraph:
    """Graph union; raises if node sets intersect (binary.py:20-46)."""
    overlap = g.vertices.select("id").intersect(h.vertices.select("id")).count()
    if overlap:
        raise ValueError(
            f"node sets of G and H are not disjoint ({overlap} shared ids); "
            "use disjoint_union or compose"
        )
    return LinkGraph(
        vertices=g.vertices.unionByName(h.vertices, allowMissingColumns=True),
        edges=g.edges.unionByName(h.edges, allowMissingColumns=True),
        directed=g.directed,
    )


def disjoint_union(g: LinkGraph, h: LinkGraph) -> LinkGraph:
    """Union after offsetting H's ids past G's max id (binary.py:84)."""
    off = (g.vertices.agg(F.max("id")).first()[0] or -1) + 1
    hv = h.vertices.withColumn("id", F.col("id") + off)
    he = h.edges.withColumn("src", F.col("src") + off).withColumn(
        "dst", F.col("dst") + off
    )
    return LinkGraph(
        vertices=g.vertices.unionByName(hv, allowMissingColumns=True),
        edges=g.edges.unionByName(he, allowMissingColumns=True),
        directed=g.directed,
    )


def intersection(g: LinkGraph, h: LinkGraph) -> LinkGraph:
    """Edges present in both graphs, over G's vertex set ∩ H's
    (binary.py:138)."""
    e = _edge_keys(g).join(_edge_keys(h), ["src", "dst"], "left_semi")
    v = g.vertices.join(h.vertices.select("id"), "id", "left_semi")
    return replace(g, vertices=v, edges=e.withColumn("weight", F.lit(1.0)))


def difference(g: LinkGraph, h: LinkGraph) -> LinkGraph:
    """Edges in G but not in H (binary.py:183); node set = G's."""
    e = _edge_keys(g).join(_edge_keys(h), ["src", "dst"], "left_anti")
    return replace(g, edges=e.withColumn("weight", F.lit(1.0)))


def symmetric_difference(g: LinkGraph, h: LinkGraph) -> LinkGraph:
    """Edges in exactly one of G, H (binary.py:238)."""
    a = _edge_keys(g).join(_edge_keys(h), ["src", "dst"], "left_anti")
    b = _edge_keys(h).join(_edge_keys(g), ["src", "dst"], "left_anti")
    return replace(
        g, edges=a.unionByName(b).withColumn("weight", F.lit(1.0))
    )


def compose(g: LinkGraph, h: LinkGraph) -> LinkGraph:
    """Union of nodes and edges; on conflict H's attrs win
    (binary.py:301) — last-write-wins via coalesce of H over G.

    Each side is first coalesced per (src, dst) (parallel rows summed,
    the engine's multigraph→simple convention, see
    ``LinkGraph.coalesced_edges``) so multigraph input cannot M×N-blow
    up the full_outer join. Vertex attributes merge per column with
    ``coalesce(h_attr, g_attr)`` — H takes precedence, exactly the
    reference's ``G.nodes.update(H.nodes)`` ordering."""
    ge = g.edges.groupBy("src", "dst").agg(
        F.sum(F.coalesce("weight", F.lit(1.0))).alias("weight")
    )
    he = h.edges.groupBy("src", "dst").agg(
        F.sum(F.coalesce("weight", F.lit(1.0))).alias("weight_h")
    )
    merged = (
        ge.join(he, ["src", "dst"], "full_outer")
        .select("src", "dst", F.coalesce("weight_h", "weight").alias("weight"))
    )
    g_attrs = [c for c in g.vertices.columns if c != "id"]
    h_attrs = [c for c in h.vertices.columns if c != "id"]
    all_attrs = list(dict.fromkeys(g_attrs + h_attrs))
    if all_attrs:
        gv = g.vertices.select(
            "id",
            *[
                (F.col(c) if c in g_attrs else F.lit(None)).alias(f"_g_{c}")
                for c in all_attrs
            ],
        )
        hv = h.vertices.select(
            "id",
            *[
                (F.col(c) if c in h_attrs else F.lit(None)).alias(f"_h_{c}")
                for c in all_attrs
            ],
        )
        v = gv.join(hv, "id", "full_outer").select(
            "id",
            *[
                F.coalesce(F.col(f"_h_{c}"), F.col(f"_g_{c}")).alias(c)
                for c in all_attrs
            ],
        )
    else:
        v = g.vertices.unionByName(h.vertices).distinct()
    return LinkGraph(vertices=v, edges=merged, directed=g.directed)
