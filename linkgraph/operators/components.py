"""Connected components as an iterative DataFrame program.

Reference semantics (networkx/algorithms/components/connected.py):

* undirected only — ``@not_implemented_for("directed")`` at
  connected.py:16; web graphs are directed, so the engine computes
  components of the **symmetrized** edge set, which equals the
  reference's undirected semantics (== weakly connected components,
  networkx/algorithms/components/weakly_connected.py:15).
* a single isolated node is its own component (connected.py:30),
* null graph → ``is_connected`` raises (connected.py:204-207).

Physical strategy (Spark-first): the reference runs one BFS per
unseen node (connected.py:84-90, ``_plain_bfs`` 267-282) — inherently
sequential.  Here every vertex carries a candidate component label
(init: its own id) and each superstep does

    1. neighbor-min gather:  comp'[v] = min(comp[v], min comp[u] for
       u ~ v)            — one join + partial-agg groupBy, and
    2. pointer jumping:      comp''[v] = comp'[comp'[v]]
       (valid because comp is monotone-decreasing and always names a
       vertex in the same component),

so label distance covered doubles per superstep → O(log diameter)
iterations instead of O(diameter).  Termination: zero labels changed
(the distributed analog of BFS's "all seen" early exit,
connected.py:280-281).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.loop import SuperstepLoop


def connected_components(
    graph: LinkGraph,
    max_iter: int = 64,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    lineage: bool = False,
) -> DataFrame:
    """Returns labels(id BIGINT, component BIGINT) — component is the
    minimum vertex id in the component (deterministic representative).
    """
    spark = graph.spark
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # static: symmetrized simple edge set (self-loops are no-ops for CC)
    edges = (
        graph.symmetrized_edges()
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(num_partitions, "dst")
        .persist()
    )
    edges.count()

    labels = graph.vertices.select("id", F.col("id").alias("component"))
    loop = SuperstepLoop(
        spark,
        "connected_components",
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        lineage=lineage,
    )
    labels = loop.start(labels.repartition(num_partitions, "id"))

    def changed_count(prev: DataFrame, new: DataFrame) -> dict:
        changed = (
            new.withColumnRenamed("component", "c_new")
            .join(prev.withColumnRenamed("component", "c_old"), "id")
            .where(F.col("c_new") != F.col("c_old"))
            .count()
        )
        return {"changed": changed}

    try:
        for _ in range(max_iter):
            nbr_min = (
                edges.join(
                    labels.select(F.col("id").alias("src"), "component"), "src"
                )
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("component").alias("nbr_comp"))
            )
            stepped = (
                labels.join(nbr_min, "id", "left")
                .select(
                    "id",
                    F.least(
                        "component", F.coalesce("nbr_comp", F.col("component"))
                    ).alias("component"),
                )
            )
            # pointer jumping: component <- component(component)
            jumped = (
                stepped.alias("a")
                .join(
                    stepped.select(
                        F.col("id").alias("component"),
                        F.col("component").alias("jump"),
                    ).alias("b"),
                    "component",
                    "left",
                )
                .select(
                    F.col("a.id").alias("id"),
                    F.least(
                        F.col("component"), F.coalesce("jump", F.col("component"))
                    ).alias("component"),
                )
            )
            labels, m = loop.advance(jumped, metrics_fn=changed_count)
            if m["changed"] == 0:
                return labels
        return labels
    finally:
        edges.unpersist()


def weakly_connected_components(graph: LinkGraph, **kwargs) -> DataFrame:
    """Weakly connected components of a directed graph
    (networkx/algorithms/components/weakly_connected.py:15): identical
    to components of the symmetrized edge set, which is exactly what
    :func:`connected_components` computes (it always symmetrizes)."""
    return connected_components(graph, **kwargs)


def number_connected_components(graph: LinkGraph, **kwargs) -> int:
    """Component count (networkx/algorithms/components/connected.py:103)."""
    return (
        connected_components(graph, **kwargs)
        .agg(F.countDistinct("component"))
        .first()[0]
    )


def is_connected(graph: LinkGraph, **kwargs) -> bool:
    """Raises ValueError on the null graph — parity with
    NetworkXPointlessConcept (connected.py:204-207)."""
    if graph.num_vertices() == 0:
        raise ValueError(
            "Connectivity is undefined for the null graph "
            "(NetworkXPointlessConcept parity)"
        )
    return number_connected_components(graph, **kwargs) == 1


def node_connected_component(graph: LinkGraph, node_id: int, **kwargs) -> DataFrame:
    """Vertices of the component containing ``node_id``
    (connected.py:226)."""
    labels = connected_components(graph, **kwargs)
    target = labels.where(F.col("id") == node_id).select(
        F.col("component").alias("c")
    )
    return labels.join(
        F.broadcast(target), labels.component == F.col("c"), "left_semi"
    ).select("id")
