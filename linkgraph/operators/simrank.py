"""SimRank structural similarity as sparse pair-table power iteration.

Reference: networkx/algorithms/similarity.py ``simrank_similarity``
(_simrank_similarity_python): sim(u,u) = 1 and

    sim(u,v) = C / (|N(u)|·|N(v)|) · Σ_{w∈N(u), x∈N(v)} sim_prev(w,x)

where N = predecessors for directed graphs, neighbors for undirected
(the reference's ``Gadj = G.pred if G.is_directed() else G.adj``), and
C is ``importance_factor``. Pairs with an empty neighbor side score 0.

Spark-first shape: the n×n similarity matrix is kept as a SPARSE
(a, b, sim) table — rows exist only where sim > 0, so state is
O(co-reachable pairs), not O(n²). One iteration is two successor
joins (a pair (w,x) contributes to every (u,v) with u∈succ(w),
v∈succ(x)) + a partial-aggregated groupBy(u, v) — the canonical
two-hop join profile. Per-pair fan-out is outdeg(w)·outdeg(x), the
inherent SimRank cost; ``prune_below`` is the scale knob that drops
epsilon mass before it multiplies (documented top-k/pruned SimRank,
e.g. Lizorkin et al. VLDB'08 thresholding).

Parity: edges are deduplicated first (the reference's adjacency is a
dict — parallel edges collapse); weights are ignored (the reference
reads only adjacency keys). With ``tolerance=None`` the loop runs a
fixed ``max_iter`` supersteps with no driver-side convergence action;
with a tolerance it mirrors the reference's elementwise
``abs(new-old) <= tol·(1+abs(old))`` check and raises when
``max_iter`` is exhausted (reference ExceededMaxIterations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph


def simrank_similarity(
    graph: LinkGraph,
    importance_factor: float = 0.9,
    max_iter: int = 5,
    tolerance: float | None = None,
    prune_below: float | None = None,
    checkpoint_every: int = 3,
) -> DataFrame:
    """(a, b, sim) for every pair with sim > 0 (diagonal included,
    sim(u,u) = 1). ``max_iter`` counts reference iterations: the k-th
    output equals the reference after k loop bodies from the identity
    start."""
    if graph.directed:
        e = graph.edges.select("src", "dst").distinct()
    else:
        e = (
            graph.symmetrized_edges()
            .select("src", "dst")
            .distinct()
        )
    # in-degree of v = |N(v)| under the reference's Gadj
    indeg = e.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("din")
    )
    ea = e.select(F.col("src").alias("a"), F.col("dst").alias("_u")).persist()
    eb = e.select(F.col("src").alias("b"), F.col("dst").alias("_v")).persist()
    diag = graph.vertices.select(
        F.col("id").alias("a"), F.col("id").alias("b"), F.lit(1.0).alias("sim")
    ).persist()

    pairs = diag
    for it in range(1, max_iter + 1):
        contrib = (
            # shuffle-hash hints: build side = the (small) edge
            # relation, so the O(|pairs|·d̄) similarity stream is
            # probed hash-side and never sort-merge sorted
            # (BENCH.md §7f device)
            pairs.join(ea.hint("shuffle_hash"), "a")
            .join(eb.hint("shuffle_hash"), "b")
            .groupBy(F.col("_u").alias("a"), F.col("_v").alias("b"))
            .agg(F.sum("sim").alias("_s"))
            .where(F.col("a") != F.col("b"))
        )
        new = (
            contrib.join(indeg.select(F.col("id").alias("a"), F.col("din").alias("_da")), "a")
            .join(indeg.select(F.col("id").alias("b"), F.col("din").alias("_db")), "b")
            .select(
                "a",
                "b",
                (
                    F.lit(importance_factor)
                    * F.col("_s")
                    / (F.col("_da") * F.col("_db"))
                ).alias("sim"),
            )
        )
        if prune_below is not None:
            new = new.where(F.col("sim") >= prune_below)
        new = diag.unionByName(new)
        if it % checkpoint_every == 0 or tolerance is not None:
            new = new.localCheckpoint(eager=(tolerance is not None))
        if tolerance is not None and _converged(pairs, new, tolerance):
            return new
        pairs = new
    if tolerance is not None:
        raise RuntimeError(
            f"simrank did not converge within max_iter={max_iter} "
            "(reference ExceededMaxIterations)"
        )
    return pairs


def _converged(old: DataFrame, new: DataFrame, tolerance: float) -> bool:
    """Reference is_close: elementwise |new-old| <= tol·(1+|old|) over
    the union of supports (absent row = 0)."""
    j = (
        old.select("a", "b", F.col("sim").alias("_o"))
        .join(new.select("a", "b", F.col("sim").alias("_n")), ["a", "b"], "full_outer")
        .select(
            (
                F.abs(F.coalesce("_n", F.lit(0.0)) - F.coalesce("_o", F.lit(0.0)))
                <= tolerance * (1.0 + F.abs(F.coalesce("_o", F.lit(0.0))))
            ).alias("ok")
        )
    )
    return bool(j.agg(F.min("ok")).first()[0])
