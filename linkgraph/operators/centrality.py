"""Eigenvector centrality as a power-iteration DataFrame program.

Reference semantics — ``eigenvector_centrality``
(networkx/algorithms/centrality/eigenvector.py:18-145):

* init: x = nstart or all-ones, normalized by its sum,
* per iteration: x_new = x_last + A^T x_last (each node adds its value
  times the edge weight to every successor — eigenvector.py:125-128),
  then x_new is normalized by its EUCLIDEAN norm (``math.hypot``,
  eigenvector.py:131; a zero norm falls back to 1),
* convergence: L1 norm sum(|x - x_last|) < n * tol (the same N-scaled
  rule as pagerank, eigenvector.py:134-137),
* non-convergence raises PowerIterationFailedConvergence.

Physical strategy: identical to the pagerank gather — one persisted
salted-CSR adjacency (parallel edges coalesced, NO out-strength
normalization), one shuffle per superstep (explode pairs, groupBy dst
with map-side partial aggregation), the 2-norm and L1 error riding the
plan as one-row broadcast aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph, build_adjacency
from ..plans.loop import PowerIterationFailedConvergence, SuperstepLoop


def eigenvector_centrality(
    graph: LinkGraph,
    max_iter: int = 100,
    tol: float = 1.0e-6,
    nstart: dict | None = None,
    weight: bool = True,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    fixed_iter: int | None = None,
) -> DataFrame:
    """Returns (id BIGINT, centrality DOUBLE).

    ``fixed_iter`` runs exactly that many supersteps with no
    convergence action (oracle parity / benchmarking), mirroring the
    pagerank/hits contract. ``weight=False`` treats every edge as 1
    (the reference's ``weight=None``).
    """
    spark = graph.spark
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    base = graph.weighted_edges() if graph.directed else graph.symmetrized_edges()
    if not weight:
        base = base.select("src", "dst", F.lit(1.0).alias("weight"))
    adj = build_adjacency(
        base, num_partitions=num_partitions, coalesce_parallel=True, normalize=False
    ).persist()
    adj.count()

    nodes = graph.vertices.select("id").repartition(num_partitions, "id").persist()
    n = nodes.count()
    if n == 0:
        adj.unpersist()
        nodes.unpersist()
        return spark.createDataFrame([], "id long, centrality double")

    if nstart is None:
        x = nodes.select("id", F.lit(1.0 / n).alias("centrality"))
    else:
        if all(v == 0 for v in nstart.values()):
            raise ValueError("initial vector cannot have all zero values")
        s = float(sum(nstart.values()))
        xv = spark.createDataFrame(
            [(int(k), float(v) / s) for k, v in nstart.items()],
            "id long, centrality double",
        )
        x = nodes.join(xv, "id", "left").select(
            "id", F.coalesce("centrality", F.lit(0.0)).alias("centrality")
        )

    loop = SuperstepLoop(
        spark,
        "eigenvector",
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
    )
    x = loop.start(x.repartition(num_partitions, "id"))

    def superstep(x_cur: DataFrame) -> DataFrame:
        gathered = (
            adj.join(x_cur.withColumnRenamed("id", "src"), "src")
            .select(F.explode("pairs").alias("z"), "centrality")
            .select(
                F.col("z.dsts").alias("id"),
                (F.col("centrality") * F.col("z.wts")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("gathered"))
        )
        raw = x_cur.join(gathered, "id", "left").select(
            "id",
            (F.col("centrality") + F.coalesce("gathered", F.lit(0.0))).alias(
                "centrality"
            ),
        )
        norm = raw.agg(
            F.sqrt(F.sum(F.col("centrality") * F.col("centrality"))).alias("nrm")
        )
        return raw.crossJoin(F.broadcast(norm)).select(
            "id",
            (
                F.col("centrality")
                / F.when(F.col("nrm") > 0, F.col("nrm")).otherwise(F.lit(1.0))
            ).alias("centrality"),
        )

    def l1(prev: DataFrame, new: DataFrame) -> dict:
        err = (
            new.join(
                prev.select("id", F.col("centrality").alias("c_prev")), "id"
            )
            .agg(F.sum(F.abs(F.col("centrality") - F.col("c_prev"))))
            .first()[0]
        )
        return {"l1_error": err}

    niter = fixed_iter if fixed_iter is not None else max_iter
    converged = fixed_iter is not None
    try:
        for _ in range(niter):
            x_new = superstep(x)
            if fixed_iter is not None:
                x, _ = loop.advance(x_new, metrics_fn=lambda p, n_: {"rows": n_.count()})
                continue
            x, m = loop.advance(x_new, metrics_fn=l1)
            if m["l1_error"] < n * tol:
                converged = True
                break
        if not converged:
            raise PowerIterationFailedConvergence(max_iter)
        out = x.persist()
        out.count()
        return out
    finally:
        adj.unpersist()
        nodes.unpersist()
