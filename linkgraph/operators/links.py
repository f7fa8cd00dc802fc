"""Common-neighbor queries and link-prediction indices.

Parity targets: ``common_neighbors`` (networkx/classes/function.py:1064
— undirected only, excludes u and v themselves), and the
link-prediction index family
(networkx/algorithms/link_prediction.py: ``jaccard_coefficient`` :217,
``adamic_adar_index`` :342, ``resource_allocation_index`` :84,
``preferential_attachment`` :404).

Physical strategy: all pair scores derive from ONE wedge self-join of
the symmetrized simple edge set on the shared-neighbor column —
(z→u) ⋈ (z→v) with u < v — followed by a groupBy on the pair. This is
the same O(Σ deg²) shape as triangle counting; at web scale the join
is bounded by orienting on degree if needed (not done here — candidate
generation for link prediction conventionally wants all wedge pairs).
Degrees broadcast-join onto the pair table (vertex-sized, small
relative to pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def _sym_simple(g: LinkGraph) -> DataFrame:
    e = g.edges.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).where(F.col("src") != F.col("dst")).distinct()
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def common_neighbors(g: LinkGraph, u: int, v: int) -> DataFrame:
    """(id) nodes adjacent to both u and v, excluding u and v
    (function.py:1064). Raises on directed input (reference parity)."""
    if g.directed:
        raise ValueError(
            "common_neighbors is not defined for directed graphs "
            "(function.py:1064 @not_implemented_for('directed'))"
        )
    e = _sym_simple(g)
    nu = e.where(F.col("src") == u).select(F.col("dst").alias("id"))
    nv = e.where(F.col("src") == v).select(F.col("dst").alias("id"))
    return nu.intersect(nv).where(~F.col("id").isin(u, v))


def wedge_pairs(g: LinkGraph) -> DataFrame:
    """(u, v, cn) for every pair sharing ≥1 neighbor, u < v — the
    candidate table all link-prediction indices score."""
    e = _sym_simple(g)
    a = e.select(F.col("src").alias("z"), F.col("dst").alias("u"))
    b = e.select(F.col("src").alias("z"), F.col("dst").alias("v"))
    return (
        a.join(b, "z")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("cn"))
    )


def _degrees(g: LinkGraph) -> DataFrame:
    e = _sym_simple(g)
    return e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )


def common_neighbor_counts(g: LinkGraph, adjacent_only: bool = False) -> DataFrame:
    """(u, v, cn BIGINT): shared-neighbor counts per candidate pair;
    ``adjacent_only`` restricts to pairs that are themselves edges
    (per-edge embeddedness — the triangle-support table)."""
    pairs = wedge_pairs(g)
    if adjacent_only:
        edge_keys = g.edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        ).where(F.col("u") != F.col("v")).distinct()
        pairs = pairs.join(edge_keys, ["u", "v"], "left_semi")
    return pairs


def jaccard_coefficient(g: LinkGraph) -> DataFrame:
    """(u, v, jaccard DOUBLE) = cn / |N(u) ∪ N(v)|
    (link_prediction.py:217) over all wedge pairs."""
    pairs = wedge_pairs(g)
    d = _degrees(g)
    return (
        pairs.join(d.withColumnRenamed("id", "u").withColumnRenamed("deg", "du"), "u")
        .join(d.withColumnRenamed("id", "v").withColumnRenamed("deg", "dv"), "v")
        .select(
            "u", "v", "cn",
            (F.col("cn") / (F.col("du") + F.col("dv") - F.col("cn")))
            .cast("double").alias("jaccard"),
        )
    )


def adamic_adar_index(g: LinkGraph) -> DataFrame:
    """(u, v, aa DOUBLE) = Σ_z 1/ln(deg z) over shared neighbors z
    (link_prediction.py:342). Computed inside the wedge join so the
    shared neighbor's degree never needs a second pass."""
    e = _sym_simple(g)
    d = _degrees(g)
    ez = e.join(d.withColumnRenamed("id", "src"), "src").select(
        F.col("src").alias("z"), F.col("dst").alias("n"), "deg"
    )
    a = ez.select("z", F.col("n").alias("u"), "deg")
    b = ez.select("z", F.col("n").alias("v"))
    return (
        a.join(b, "z")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.sum(F.lit(1.0) / F.log("deg")).alias("aa"))
    )


def resource_allocation_index(g: LinkGraph) -> DataFrame:
    """(u, v, ra DOUBLE) = Σ_z 1/deg(z) (link_prediction.py:84)."""
    e = _sym_simple(g)
    d = _degrees(g)
    ez = e.join(d.withColumnRenamed("id", "src"), "src").select(
        F.col("src").alias("z"), F.col("dst").alias("n"), "deg"
    )
    a = ez.select("z", F.col("n").alias("u"), "deg")
    b = ez.select("z", F.col("n").alias("v"))
    return (
        a.join(b, "z")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.sum(F.lit(1.0) / F.col("deg")).alias("ra"))
    )


def preferential_attachment(g: LinkGraph, pairs: DataFrame | None = None) -> DataFrame:
    """(u, v, pa BIGINT) = deg(u) * deg(v) (link_prediction.py:404)
    for the given candidate pairs (default: wedge pairs)."""
    if pairs is None:
        pairs = wedge_pairs(g).select("u", "v")
    d = _degrees(g)
    return (
        pairs.join(d.withColumnRenamed("id", "u").withColumnRenamed("deg", "du"), "u")
        .join(d.withColumnRenamed("id", "v").withColumnRenamed("deg", "dv"), "v")
        .select("u", "v", (F.col("du") * F.col("dv")).alias("pa"))
    )


def _wedge_triples(g: LinkGraph) -> DataFrame:
    """(z, u, v) with u < v — one row per common neighbor z of the
    candidate pair; the annotated form of :func:`wedge_pairs`."""
    e = _sym_simple(g)
    a = e.select(F.col("src").alias("z"), F.col("dst").alias("u"))
    b = e.select(F.col("src").alias("z"), F.col("dst").alias("v"))
    return a.join(b, "z").where(F.col("u") < F.col("v"))


def _with_communities(g: LinkGraph, communities: DataFrame) -> DataFrame:
    """Wedge triples annotated with the community of z, u, and v.
    ``communities``: (id, community) — any orderable community type."""
    c = communities.select("id", "community")
    t = _wedge_triples(g)
    return (
        t.join(
            c.select(F.col("id").alias("z"), F.col("community").alias("cz")), "z"
        )
        .join(c.select(F.col("id").alias("u"), F.col("community").alias("cu")), "u")
        .join(c.select(F.col("id").alias("v"), F.col("community").alias("cv")), "v")
    )


def cn_soundarajan_hopcroft(g: LinkGraph, communities: DataFrame) -> DataFrame:
    """(u, v, score BIGINT) = |CN| + |{z ∈ CN : comm(z)=comm(u)=comm(v)}|
    (link_prediction.py:478, Soundarajan & Hopcroft 2012) over wedge
    candidates — the same one-wedge-join shape as the other indices,
    with three community-broadcast annotations."""
    t = _with_communities(g, communities)
    return t.groupBy("u", "v").agg(
        (
            F.count(F.lit(1))
            + F.sum(
                F.when(
                    (F.col("cu") == F.col("cv")) & (F.col("cz") == F.col("cu")), 1
                ).otherwise(0)
            )
        ).alias("score")
    )


def ra_index_soundarajan_hopcroft(g: LinkGraph, communities: DataFrame) -> DataFrame:
    """(u, v, score DOUBLE) = Σ_{z ∈ CN, comm(z)=comm(u)=comm(v)} 1/deg(z);
    0 when comm(u) ≠ comm(v) (link_prediction.py:560)."""
    d = _degrees(g)
    t = _with_communities(g, communities).join(
        d.select(F.col("id").alias("z"), "deg"), "z"
    )
    return t.groupBy("u", "v").agg(
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("cu") == F.col("cv")) & (F.col("cz") == F.col("cu")),
                    F.lit(1.0) / F.col("deg"),
                ).otherwise(0.0)
            ),
            F.lit(0.0),
        ).alias("score")
    )


def within_inter_cluster(
    g: LinkGraph, communities: DataFrame, delta: float = 0.001
) -> DataFrame:
    """(u, v, score DOUBLE) = |within-CN| / (|inter-CN| + delta) when
    comm(u) = comm(v), else 0 (link_prediction.py:638). Raises on
    non-positive delta (reference parity)."""
    if delta <= 0:
        raise ValueError("Delta must be greater than zero")
    t = _with_communities(g, communities)
    same = (F.col("cu") == F.col("cv")).cast("int")
    within = F.sum(same * (F.col("cz") == F.col("cu")).cast("int"))
    inter = F.sum(same * (F.col("cz") != F.col("cu")).cast("int"))
    # cu/cv are constant within a (u, v) group — first() reads the flag
    return t.groupBy("u", "v").agg(
        F.when(
            F.first(F.col("cu") == F.col("cv")),
            within / (inter + F.lit(float(delta))),
        )
        .otherwise(F.lit(0.0))
        .alias("score")
    )


def cocitation(graph: LinkGraph, min_count: int = 1) -> DataFrame:
    """(a, b, n_citers) with a < b — pairs of pages cited by the same
    source, counted over distinct citers (Small 1973 co-citation; not
    in the reference — a §2.10 link-analysis extension). One
    self-join of the distinct edge table on ``src`` + a count
    aggregate; output volume is Σ_i C(outdeg(i), 2), bounded by
    capping hub out-degree upstream when needed."""
    e = graph.edges.select("src", "dst").distinct()
    pairs = (
        e.alias("x")
        .join(e.alias("y"), F.col("x.src") == F.col("y.src"))
        .where(F.col("x.dst") < F.col("y.dst"))
        .groupBy(F.col("x.dst").alias("a"), F.col("y.dst").alias("b"))
        .agg(F.count(F.lit(1)).alias("n_citers"))
    )
    return pairs.where(F.col("n_citers") >= min_count)


def bibliographic_coupling(graph: LinkGraph, min_count: int = 1) -> DataFrame:
    """(a, b, n_shared_refs) with a < b — pairs of pages citing the
    same target (Kessler 1963): the co-citation join on the reversed
    view."""
    e = graph.edges.select("src", "dst").distinct()
    pairs = (
        e.alias("x")
        .join(e.alias("y"), F.col("x.dst") == F.col("y.dst"))
        .where(F.col("x.src") < F.col("y.src"))
        .groupBy(F.col("x.src").alias("a"), F.col("y.src").alias("b"))
        .agg(F.count(F.lit(1)).alias("n_shared_refs"))
    )
    return pairs.where(F.col("n_shared_refs") >= min_count)


def dispersion(
    g: LinkGraph,
    normalized: bool = True,
    alpha: float = 1.0,
    b: float = 0.0,
    c: float = 0.0,
) -> DataFrame:
    """(u, v, embeddedness, dispersion) for every ORDERED adjacent
    pair (v ∈ N(u)) — Backstrom & Kleinberg's dispersion (reference
    networkx/algorithms/centrality/dispersion.py:10 ``dispersion``):
    among the common neighbors ST = N(u) ∩ N(v), count pairs
    {s, t} ⊆ ST that are (a) not adjacent to each other and (b) share
    no third mutual tie w ∈ N(u) \\ {u, v} with w ∈ N(s) ∩ N(t); the
    normalized score divides ``(total + b) ** alpha`` by the
    embeddedness ``|ST| + c`` (left unnormalized when that denominator
    is zero — the reference's exact branch structure).

    The measure is NOT symmetric: the third-tie witness w must lie in
    N(u) (the ego side), so disp(u, v) and disp(v, u) differ whenever
    some s, t share a tie inside one endpoint's neighborhood but not
    the other's — e.g. karate (0,5): disp(0,5)=0 (witness 4 ∈ N(0))
    but disp(5,0)=0.5 (no witness inside N(5)). Both orientations are
    emitted, mirroring the reference's full-graph dict-of-dicts.

    Physical plan — four equi-joins, no driver loop (ST and the s,t
    pair conditions are u↔v symmetric, so they are computed once per
    canonical edge and mirrored; only the witness anti-join runs on
    the ordered table):

      cn        = edges(a<b) ⋈ adj(a) ⋈ adj(b)   (the ST table)
      st_pairs  = cn ⋈ cn on (a,b), s < t
      non_adj   = st_pairs ▷ edges(s,t)          (anti: not adjacent)
      ordered   = non_adj ∪ mirror(non_adj)
      survivors = ordered ▷ adj(s) ⋈ adj(t) ⋈ adj(u), w ≠ v  (anti:
                            no shared third tie inside N(u))
      result    = ordered edges ⟕ count(cn) ⟕ count(survivors)

    Cost is O(Σ_edges |ST|²·d̄) — the reference's own per-pair loop has
    the same shape; at web scale restrict the input to the candidate
    edges under audit (the conventional use: score a given tie, not
    every tie) or cap |ST| upstream."""
    if g.directed:
        raise ValueError(
            "dispersion is defined on undirected graphs "
            "(dispersion.py computes over mutual-tie sets)"
        )
    sym = _sym_simple(g)
    edges = sym.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    adj_u = sym.select(F.col("src").alias("u"), F.col("dst").alias("s"))
    adj_v = sym.select(F.col("src").alias("v"), F.col("dst").alias("s"))
    cn = edges.join(adj_u, "u").join(adj_v, ["v", "s"]).persist()
    emb_canon = cn.groupBy("u", "v").agg(F.count(F.lit(1)).alias("embeddedness"))
    emb = emb_canon.unionByName(
        emb_canon.select(
            F.col("v").alias("u"), F.col("u").alias("v"), "embeddedness"
        )
    )
    st_pairs = (
        cn.join(
            cn.select("u", "v", F.col("s").alias("t")),
            ["u", "v"],
        )
        .where(F.col("s") < F.col("t"))
    )
    non_adj_canon = st_pairs.join(
        edges.select(F.col("u").alias("s"), F.col("v").alias("t")),
        ["s", "t"],
        "left_anti",
    )
    non_adj = non_adj_canon.unionByName(
        non_adj_canon.select(
            F.col("v").alias("u"), F.col("u").alias("v"), "s", "t"
        )
    )
    witnesses = (
        non_adj.join(sym.select(F.col("src").alias("s"), F.col("dst").alias("w")), "s")
        .join(sym.select(F.col("src").alias("t"), F.col("dst").alias("w")), ["t", "w"])
        .join(sym.select(F.col("src").alias("u"), F.col("dst").alias("w")), ["u", "w"])
        .where(F.col("w") != F.col("v"))
        .select("u", "v", "s", "t")
    )
    survivors = non_adj.join(witnesses, ["u", "v", "s", "t"], "left_anti")
    total = survivors.groupBy("u", "v").agg(F.count(F.lit(1)).alias("total"))
    ordered_edges = sym.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    out = (
        ordered_edges.join(emb, ["u", "v"], "left")
        .join(total, ["u", "v"], "left")
        .select(
            "u",
            "v",
            F.coalesce("embeddedness", F.lit(0)).alias("embeddedness"),
            F.coalesce("total", F.lit(0)).alias("_total"),
        )
    )
    if normalized:
        denom = F.col("embeddedness") + F.lit(float(c))
        raw = F.pow(F.col("_total") + F.lit(float(b)), F.lit(float(alpha)))
        disp = F.when(denom != 0.0, raw / denom).otherwise(raw)
    else:
        disp = F.col("_total").cast("double")
    return out.select(
        "u", "v", "embeddedness", disp.cast("double").alias("dispersion")
    )
