"""Cut/partition quality measures between vertex sets.

Parity targets: networkx/algorithms/cuts.py — ``cut_size`` (:17),
``volume`` (:79), ``normalized_cut_size`` (:125), ``conductance``
(:183), ``edge_expansion`` (:241), ``mixing_expansion`` (:294),
``node_expansion`` (:345), ``boundary_expansion`` (:390).

Every measure is one or two semi-join + aggregate scalars over the
edge table — no iteration, map-side partial aggregation throughout,
the node sets broadcast when small (Catalyst decides). Weighted
variants use the edge weight column (the reference's ``weight=``
kwarg); self-loops follow the reference's degree conventions (volume
uses out-degree including self-loops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def _ids(nbunch: DataFrame) -> DataFrame:
    return nbunch.select("id").distinct()


def _complement(graph: LinkGraph, s: DataFrame) -> DataFrame:
    return graph.vertices.select("id").join(s, "id", "left_anti")


def cut_size(
    graph: LinkGraph,
    s: DataFrame,
    t: DataFrame | None = None,
    weighted: bool = False,
) -> float:
    """Total (weight of) edges from S to T (default: complement of S)
    — cuts.py:17. Directed graphs count S→T edges only when T is
    given; with T = complement the reference sums both boundary
    directions (``if directed: cut += edge_boundary(T, S)``)."""
    sd = _ids(s)
    td = _ids(t) if t is not None else _complement(graph, sd)
    val = F.sum("weight") if weighted else F.count(F.lit(1)).cast("double")

    def one_way(we: DataFrame, a: DataFrame, b: DataFrame) -> float:
        x = (
            we.join(a.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(b.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .agg(val.alias("v"))
            .first()["v"]
        )
        return float(x or 0.0)

    if graph.directed:
        # the reference ALWAYS adds the T→S boundary for directed
        # graphs (cuts.py:17 ``chain(edges, edge_boundary(G, T, S))``)
        we = graph.weighted_edges()
        return one_way(we, sd, td) + one_way(we, td, sd)
    # undirected: one canonical (weight-summed) row per edge; a row
    # counts once if its endpoints fall on opposite sides in either
    # orientation, minus the double count when both endpoints lie in
    # S∩T (the reference's edge_boundary yields each edge once)
    canon = graph.undirected_edges()
    both = sd.join(td, "id", "left_semi")
    return (
        one_way(canon, sd, td)
        + one_way(canon, td, sd)
        - one_way(canon, both, both)
    )


def volume(graph: LinkGraph, s: DataFrame, weighted: bool = False) -> float:
    """Σ out-degree (or out-strength) over S — cuts.py:79 (the
    reference uses ``G.out_degree`` for directed, ``G.degree`` for
    undirected; self-loops count once directed, twice undirected)."""
    sd = _ids(s)
    we = graph.weighted_edges()
    if not graph.directed:
        canon = graph.undirected_edges()
        we = canon.unionByName(
            canon.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
        )
    val = F.sum("weight") if weighted else F.count(F.lit(1)).cast("double")
    x = (
        we.join(sd.withColumnRenamed("id", "src"), "src", "left_semi")
        .agg(val.alias("v"))
        .first()["v"]
    )
    return float(x or 0.0)


def normalized_cut_size(
    graph: LinkGraph, s: DataFrame, t: DataFrame | None = None,
    weighted: bool = False,
) -> float:
    """cut(S,T)·(1/vol(S) + 1/vol(T)) — cuts.py:125."""
    sd = _ids(s)
    td = _ids(t) if t is not None else _complement(graph, sd)
    c = cut_size(graph, sd, td, weighted=weighted)
    return c * (1.0 / volume(graph, sd, weighted=weighted)
                + 1.0 / volume(graph, td, weighted=weighted))


def conductance(
    graph: LinkGraph, s: DataFrame, t: DataFrame | None = None,
    weighted: bool = False,
) -> float:
    """cut(S,T) / min(vol(S), vol(T)) — cuts.py:183."""
    sd = _ids(s)
    td = _ids(t) if t is not None else _complement(graph, sd)
    c = cut_size(graph, sd, td, weighted=weighted)
    return c / min(volume(graph, sd, weighted=weighted),
                   volume(graph, td, weighted=weighted))


def edge_expansion(
    graph: LinkGraph, s: DataFrame, t: DataFrame | None = None,
    weighted: bool = False,
) -> float:
    """cut(S,T) / min(|S|, |T|) — cuts.py:241."""
    sd = _ids(s)
    td = _ids(t) if t is not None else _complement(graph, sd)
    c = cut_size(graph, sd, td, weighted=weighted)
    return c / min(sd.count(), td.count())


def mixing_expansion(
    graph: LinkGraph, s: DataFrame, t: DataFrame | None = None,
    weighted: bool = False,
) -> float:
    """cut(S,T) / (2·|E|) — cuts.py:294 (reference divides by 2m)."""
    sd = _ids(s)
    td = _ids(t) if t is not None else _complement(graph, sd)
    c = cut_size(graph, sd, td, weighted=weighted)
    m = graph.edges.count()
    return c / (2.0 * m)


def node_expansion(graph: LinkGraph, s: DataFrame) -> float:
    """|N[S]| / |S| where N[S] is the node boundary of S together
    with S — cuts.py:345."""
    from .boundary import node_boundary

    sd = _ids(s)
    nb = node_boundary(graph, sd)
    return (nb.count() + sd.count()) / float(sd.count())


def boundary_expansion(graph: LinkGraph, s: DataFrame) -> float:
    """|∂S| / |S| (node boundary over set size) — cuts.py:390."""
    from .boundary import node_boundary

    sd = _ids(s)
    return node_boundary(graph, sd).count() / float(sd.count())
