"""Triangle counting / enumeration via oriented wedge joins.

Reference semantics (networkx/algorithms/cluster.py):

* undirected, non-multigraph; **self-loops ignored** (cluster.py:62,82,113),
* per-node counts include zeros for triangle-free nodes (cluster.py:86),
* each triangle counted once, credited to all three corners
  (cluster.py:78-95 "later neighbors" trick),
* ``all_triangles`` enumerates each triangle exactly once using an
  internal node ordering (cluster.py:300-321),
* ``transitivity = 3·T / #triads`` (cluster.py:500-539),
* ``clustering = t / (d(d-1))`` with d = #unique neighbors excluding
  self (cluster.py:385,485-496), ``average_clustering`` (cluster.py:325).

Physical strategy (the canonical distributed-triangle plan): orient
every undirected edge from its lower to its higher endpoint under the
total order ``(degree, id)`` — the same device as the reference's
later-neighbor intersection, but the **degree-first order also bounds
wedge skew**: every wedge pivot has out-degree ≤ O(sqrt(m)) in the
oriented graph, so the self-join never explodes on hubs.  Then

    wedges  = oriented ⋈ oriented  on pivot (a→b, a→c, ord(b)<ord(c))
    closed  = wedges   ⋈ oriented  on (b,c)        [the closing edge]

Both joins are plain equi-joins → Catalyst picks shuffle-hash / SMJ /
broadcast; AQE handles residual skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def _simple_undirected(graph: LinkGraph) -> DataFrame:
    """Canonical simple edge set: src<dst, deduped, self-loops dropped."""
    return (
        graph.edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _oriented(graph: LinkGraph) -> DataFrame:
    """Orient edges low→high under (degree, id); columns (lo, hi)."""
    simple = _simple_undirected(graph)
    both = simple.unionByName(
        simple.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = both.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranked = (
        both.join(deg.withColumnRenamed("src", "_u").withColumnRenamed("deg", "du"),
                  F.col("src") == F.col("_u")).drop("_u")
        .join(deg.withColumnRenamed("src", "_v").withColumnRenamed("deg", "dv"),
              F.col("dst") == F.col("_v")).drop("_v")
    )
    keep = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("src") < F.col("dst"))
    )
    return ranked.where(keep).select(
        F.col("src").alias("lo"), F.col("dst").alias("hi"),
        F.col("du").alias("deg_lo"), F.col("dv").alias("deg_hi"),
    )


def all_triangles(graph: LinkGraph) -> DataFrame:
    """Every triangle exactly once as (a, b, c) with a<b<c by id.

    Spark analog of ``nx.all_triangles`` (cluster.py:300-321); the
    internal orientation there is insertion order, here (degree,id) —
    the enumerated *set* of triangles is identical either way.
    """
    o = _oriented(graph).select("lo", "hi")
    w1 = o.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    w2 = o.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    wedges = w1.join(w2, "a").where(F.col("b") < F.col("c"))
    # canonicalize the closing-edge probe by id so it stays an equi-join
    # (an OR of two conjunctions would degrade to a nested-loop join)
    closing = o.select(
        F.least("lo", "hi").alias("b"), F.greatest("lo", "hi").alias("c")
    )
    closed = wedges.join(closing, ["b", "c"], "left_semi")
    return closed.select(
        F.least("a", "b", "c").alias("a"),
        F.expr("array_sort(array(a, b, c))[1]").alias("b"),
        F.greatest("a", "b", "c").alias("c"),
    )


def triangles(graph: LinkGraph) -> DataFrame:
    """Per-node triangle counts, zeros included:
    (id BIGINT, triangles BIGINT) — parity with ``nx.triangles``
    (cluster.py:78-95)."""
    tri = all_triangles(graph)
    corners = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    return graph.vertices.select("id").join(corners, "id", "left").select(
        "id", F.coalesce("t", F.lit(0)).alias("triangles")
    )


def triangle_count(graph: LinkGraph) -> int:
    """Total number of distinct triangles in the graph."""
    return all_triangles(graph).count()


def _degrees_and_triangles(graph: LinkGraph) -> DataFrame:
    """(id, deg, triangles) with deg = #unique neighbors excl. self —
    the d used by clustering/transitivity (cluster.py:99-116)."""
    simple = _simple_undirected(graph)
    both = simple.unionByName(
        simple.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = both.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    t = triangles(graph)
    return (
        t.join(deg, "id", "left")
        .select("id", F.coalesce("deg", F.lit(0)).alias("deg"), "triangles")
    )


def transitivity(graph: LinkGraph) -> float:
    """3·T / #triads (cluster.py:500-539); 0.0 when no triads."""
    row = (
        _degrees_and_triangles(graph)
        .agg(
            F.sum("triangles").alias("t3"),  # already 3T summed over corners
            F.sum(F.col("deg") * (F.col("deg") - 1)).alias("triads2"),
        )
        .first()
    )
    t3, triads2 = row["t3"] or 0, row["triads2"] or 0
    if triads2 == 0:
        return 0.0
    # t3 = Σ per-corner counts = 3T; triads2 = Σ d(d−1) = 2·#triads,
    # so 3T/#triads = 2·t3/triads2
    return 2.0 * t3 / triads2


def clustering(graph: LinkGraph) -> DataFrame:
    """Per-node clustering coefficient t/(d(d-1)) (cluster.py:485-496);
    0.0 for deg<2. Columns (id, clustering)."""
    dt = _degrees_and_triangles(graph)
    return dt.select(
        "id",
        F.when(
            F.col("deg") < 2, F.lit(0.0)
        ).otherwise(
            2.0 * F.col("triangles") / (F.col("deg") * (F.col("deg") - 1))
        ).alias("clustering"),
    )


def average_clustering(graph: LinkGraph, count_zeros: bool = True) -> float:
    """Mean clustering (cluster.py:325)."""
    c = clustering(graph)
    if not count_zeros:
        c = c.where(F.col("clustering") > 0)
    v = c.agg(F.avg("clustering")).first()[0]
    return float(v) if v is not None else 0.0
