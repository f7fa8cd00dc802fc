"""Structural edge/graph statistics: local bridges, the s-metric, and
the rich-club coefficient.

All three run on the canonical simple undirected view (src < dst,
self-loops dropped) and are pure DataFrame programs — one or two
shuffles each, no iteration, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..graph import LinkGraph


def _simple_edges(graph: LinkGraph) -> DataFrame:
    """(src, dst) canonical: src < dst, distinct, endpoints restricted
    to the vertex table."""
    verts = graph.vertices.select("id")
    return (
        graph.undirected_edges()
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .join(verts.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(verts.withColumnRenamed("id", "dst"), "dst", "left_semi")
    )


def _simple_degrees(edges: DataFrame) -> DataFrame:
    """(id, deg) over a canonical simple edge set — degree in the
    simple undirected graph (each edge counts once per endpoint)."""
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def local_bridges(graph: LinkGraph) -> DataFrame:
    """(src BIGINT, dst BIGINT) — edges whose endpoints share no common
    neighbor (reference: networkx/algorithms/bridges.py:130
    ``local_bridges``, the ``with_span=False`` edge set; the per-edge
    span distance needs one BFS per bridge and is out of scope for the
    bulk operator — run ``bfs_layers`` from an endpoint for a specific
    edge instead).

    Plan: one wedge join builds the set of edges that ARE in a
    triangle (src–w, dst–w both present), one left-anti join removes
    them. Both joins are equi-joins on vertex keys; degree-orientation
    is unnecessary because the wedge side is only materialized as a
    semi-join probe.
    """
    e = _simple_edges(graph)
    # neighbor sets in both directions: (v, w) for every adjacent pair
    adj = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    closed = (
        e.alias("ed")
        .join(
            adj.select(F.col("src").alias("a_src"), F.col("dst").alias("w")),
            F.col("ed.src") == F.col("a_src"),
        )
        .join(
            adj.select(F.col("src").alias("b_src"), F.col("dst").alias("w2")),
            (F.col("ed.dst") == F.col("b_src")) & (F.col("w") == F.col("w2")),
            "left_semi",
        )
        .select(F.col("ed.src").alias("src"), F.col("ed.dst").alias("dst"))
        .distinct()
    )
    return e.join(closed, ["src", "dst"], "left_anti").select("src", "dst")


def s_metric(graph: LinkGraph) -> DataFrame:
    """One row (s_metric DOUBLE): sum of deg(u)*deg(v) over the simple
    undirected edges (reference: networkx/algorithms/smetric.py:5
    ``s_metric(G, normalized=False)`` — the Li–Alderson graph-structure
    statistic). Accumulated in DECIMAL(38,0) (ANSI mode: bigint sums of
    hub-degree products can overflow at web scale), emitted as DOUBLE.
    """
    e = _simple_edges(graph)
    deg = _simple_degrees(e)
    joined = (
        e.join(deg.select(F.col("id").alias("src"), F.col("deg").alias("ds")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("deg").alias("dd")), "dst")
    )
    return joined.agg(
        F.sum((F.col("ds") * F.col("dd")).cast("decimal(38,0)"))
        .cast("double")
        .alias("s_metric")
    )


def rich_club_coefficient(graph: LinkGraph) -> DataFrame:
    """(k INT, phi DOUBLE) for every degree threshold k with more than
    one surviving node — phi(k) = 2·E_k / (N_k·(N_k−1)) where N_k =
    #nodes with degree > k and E_k = #edges whose min endpoint degree
    > k (reference: networkx/algorithms/richclub.py:10
    ``rich_club_coefficient(G, normalized=False)`` / ``_compute_rc``).

    Plan: two tiny histograms (node degrees, edge min-degrees) with
    cumulative-from-above window sums, joined on the threshold grid —
    the full edge set is scanned exactly once; the per-k table is
    O(max_degree) rows, never O(k·m). Fully lazy: no driver action.
    The histogram windows are single-partition by construction
    (O(distinct degrees) rows), not a scale hazard.
    """
    e = _simple_edges(graph)
    deg = _simple_degrees(e)

    # threshold grid 0..max_deg-1 plus total node count, one tiny row
    bounds = deg.agg(
        F.max("deg").alias("max_deg"), F.count(F.lit(1)).alias("n_nodes")
    )
    grid = bounds.select(
        F.explode(F.sequence(F.lit(0), F.col("max_deg") - 1)).alias("k"),
        "n_nodes",
    )

    # cumulative-from-above histograms: cum_ge(b) = #items >= bucket b
    wd = Window.orderBy(F.col("deg").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wm = Window.orderBy(F.col("mdeg").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )

    # N_k = nodes with deg > k
    dh = deg.groupBy("deg").agg(F.count(F.lit(1)).alias("cnt"))
    n_ge = dh.select(F.col("deg"), F.sum("cnt").over(wd).alias("cum_ge"))

    # E_k = edges with min endpoint degree > k
    emin = (
        e.join(deg.select(F.col("id").alias("src"), F.col("deg").alias("ds")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("deg").alias("dd")), "dst")
        .select(F.least("ds", "dd").alias("mdeg"))
    )
    eh = emin.groupBy("mdeg").agg(F.count(F.lit(1)).alias("cnt"))
    e_ge = eh.select(F.col("mdeg"), F.sum("cnt").over(wm).alias("cum_ge"))

    # as-of lookup: count-above-k = cum_ge of the SMALLEST bucket > k,
    # 0 when no bucket exceeds k (histograms are O(distinct degrees)
    # rows — broadcastable; the range join is tiny)
    nk = (
        grid.join(F.broadcast(n_ge), n_ge["deg"] > grid["k"], "left")
        .groupBy("k", "n_nodes")
        .agg(F.min_by("cum_ge", "deg").alias("n_gt"))
        .select("k", F.coalesce("n_gt", F.lit(0)).alias("nk"))
    )
    ek = (
        grid.join(F.broadcast(e_ge), e_ge["mdeg"] > grid["k"], "left")
        .groupBy("k")
        .agg(F.min_by("cum_ge", "mdeg").alias("e_gt"))
        .select("k", F.coalesce("e_gt", F.lit(0)).alias("ek"))
    )
    return (
        nk.join(ek, "k")
        .where(F.col("nk") > 1)
        .select(
            F.col("k").cast("int").alias("k"),
            (
                F.lit(2.0) * F.col("ek") / (F.col("nk") * (F.col("nk") - F.lit(1)))
            ).alias("phi"),
        )
    )


def effective_size(graph: LinkGraph) -> DataFrame:
    """(id BIGINT, effective_size DOUBLE) — Burt's effective size of
    each node's ego network (networkx/algorithms/structuralholes.py
    ``effective_size``). For the unweighted undirected simple graphs
    this engine computes on, the general mutual-weight formula reduces
    to Borgatti's simplification e(u) = deg(u) − 2·tri(u)/deg(u)
    (redundancy of neighbor v = |N(u)∩N(v)|/deg(u); summing common
    neighbors over v counts each triangle at u twice). Isolated nodes
    get NULL (the reference emits nan).

    One triangles pass + one degree aggregate — reuses the exact
    oriented wedge-join plan of the clustering operator; no extra
    shuffle over it.
    """
    from .triangles import _degrees_and_triangles

    dt = _degrees_and_triangles(graph)
    return dt.select(
        "id",
        F.when(
            F.col("deg") > 0,
            F.col("deg").cast("double")
            - 2.0 * F.col("triangles").cast("double") / F.col("deg").cast("double"),
        ).alias("effective_size"),
    )


def efficiency_burt(graph: LinkGraph) -> DataFrame:
    """(id, efficiency DOUBLE) — effective size normalized by degree
    (Burt; the reference exposes it as effective_size/degree in the
    structuralholes notes). NULL for isolated nodes."""
    es = effective_size(graph)
    from .triangles import _degrees_and_triangles

    dt = _degrees_and_triangles(graph).select("id", "deg")
    return es.join(dt, "id").select(
        "id",
        F.when(
            F.col("deg") > 0, F.col("effective_size") / F.col("deg").cast("double")
        ).alias("efficiency"),
    )


def degree_centrality(graph: LinkGraph) -> DataFrame:
    """(id, centrality DOUBLE) = degree / (n-1)
    (networkx/algorithms/centrality/degree_alg.py:10). Undirected
    simple-graph degree (self-loops dropped). The reference's n<=1
    special case returns centrality 1 for the lone node — mirrored
    here."""
    e = _simple_edges(graph)
    n = graph.vertices.count()
    if n <= 1:
        return graph.vertices.select(
            "id", F.lit(1.0).alias("centrality")
        )
    scale = 1.0 / (n - 1)
    deg = _simple_degrees(e)
    return (
        graph.vertices.select("id")
        .join(deg, "id", "left")
        .select(
            "id",
            (F.coalesce("deg", F.lit(0)).cast("double") * F.lit(scale)).alias(
                "centrality"
            ),
        )
    )


def in_degree_centrality(graph: LinkGraph) -> DataFrame:
    """(id, centrality) = in-degree/(n-1) over the distinct directed
    edge set (degree_alg.py:62)."""
    return _directed_degree_centrality(graph, "dst")


def out_degree_centrality(graph: LinkGraph) -> DataFrame:
    """(id, centrality) = out-degree/(n-1) (degree_alg.py:115)."""
    return _directed_degree_centrality(graph, "src")


def _directed_degree_centrality(graph: LinkGraph, end: str) -> DataFrame:
    if not graph.directed:
        raise ValueError(
            "in/out_degree_centrality requires a directed graph "
            "(reference parity: @not_implemented_for('undirected'))"
        )
    e = graph.edges.select("src", "dst").distinct()
    n = graph.vertices.count()
    if n <= 1:
        return graph.vertices.select("id", F.lit(1.0).alias("centrality"))
    scale = 1.0 / (n - 1)
    deg = e.groupBy(F.col(end).alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    return (
        graph.vertices.select("id")
        .join(deg, "id", "left")
        .select(
            "id",
            (F.coalesce("deg", F.lit(0)).cast("double") * F.lit(scale)).alias(
                "centrality"
            ),
        )
    )


def constraint(graph: LinkGraph) -> DataFrame:
    """(id BIGINT, constraint DOUBLE) — Burt's network constraint
    (networkx/algorithms/structuralholes.py ``constraint`` /
    ``local_constraint``), unweighted undirected form: the normalized
    mutual weight p_xy reduces to 1/deg(x), so

        ℓ(u,v) = (1/d_u + Σ_{w∈N(u)∩N(v)} 1/(d_u·d_w))²
        c(u)   = Σ_{v∈N(u)} ℓ(u,v)

    Isolated nodes get NULL (reference: nan).

    Plan: one symmetric wedge join u→w→v carrying 1/(d_u·d_w)
    (filtered to adjacent (u,v) by a semi-join — the triangle-support
    shape), aggregated per directed edge, then per node. Two shuffles
    on top of the degree table; all arithmetic JVM-side.
    """
    e = _simple_edges(graph).persist()
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = _simple_degrees(e)
    # directed neighbor pairs (u -> v) with degrees on both ends
    uv = (
        sym.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(deg.select(F.col("id").alias("u"), F.col("deg").alias("du")), "u")
    )
    # wedge u -> w -> v for adjacent (u,v): indirect-path mass
    w1 = sym.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    w2 = sym.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    dw = deg.select(F.col("id").alias("w"), F.col("deg").alias("dwg"))
    adj = sym.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    indirect = (
        w1.join(w2, "w")
        .where(F.col("u") != F.col("v"))
        .join(adj, ["u", "v"], "left_semi")
        .join(dw, "w")
        .join(deg.select(F.col("id").alias("u"), F.col("deg").alias("du2")), "u")
        .groupBy("u", "v")
        .agg(F.sum(1.0 / (F.col("du2") * F.col("dwg"))).alias("ind"))
    )
    local = (
        uv.join(indirect, ["u", "v"], "left")
        .select(
            F.col("u").alias("id"),
            F.pow(1.0 / F.col("du") + F.coalesce("ind", F.lit(0.0)), 2).alias("l"),
        )
        .groupBy("id")
        .agg(F.sum("l").alias("constraint"))
    )
    return (
        graph.vertices.select("id")
        .join(local, "id", "left")
        .select("id", "constraint")
    )
