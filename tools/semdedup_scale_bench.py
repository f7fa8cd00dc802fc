"""SemDeDup scale evidence (round-3 hardening): the centroid table now
broadcasts as a one-row array relation (similarity._cents_relation)
instead of riding the plan as K literal expressions, so K ~ 10³-10⁵
cells is feasible — this bench pins that with a 1M-vector / 1024-cell
assignment pass plus an end-to-end semantic_near_pairs at the √n rule.

    python tools/semdedup_scale_bench.py [cores] [n] [dim] [k]

Prints one JSON line:
  gen_s      — deterministic synthetic embedding generation (JVM-side,
               xxhash64-derived coordinates; no RNG, no Python)
  fit_s      — kmeans_fit(n_centroids=k, iters=1): one broadcast
               assignment pass + one mean-recompute shuffle
  assign_s   — one full argmin-assignment pass over all n vectors
               against the fitted k centroids (the step that was
               plan-size-infeasible at this K before round 3)
  assign_rows_per_s
  e2e_n/e2e_k/e2e_pairs/e2e_s — semantic_near_pairs end-to-end at a
               smaller n with the documented K=ceil(√n) default
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("LINKGRAPH_DRIVER_MEM", "48g")


def synth_embeddings(spark, n: int, dim: int, n_groups: int | None = None):
    """Deterministic embeddings with PLANTED near-dup structure: each
    vector = its group's base vector + 1% id-specific noise, so
    within-group cosines sit ~0.999 and cross-group ~0 — the shape
    SemDeDup exists to find. JVM-side xxhash64, no RNG, no Python."""
    from pyspark.sql import functions as F

    if n_groups is None:
        n_groups = max(n // 10, 1)
    g = F.col("id") % n_groups
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (F.xxhash64(g, i) % 1000).cast("double") / 1000.0
            + (F.xxhash64(F.col("id"), i) % 1000).cast("double") / 100000.0,
        ).alias("embedding"),
    )


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 1024

    from pyspark.sql import functions as F

    from linkgraph.functions import similarity as sim
    from linkgraph.session import get_spark

    spark = get_spark(
        f"semdedup-{cores}", master=f"local[{cores}]", shuffle_partitions=cores
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    t0 = time.monotonic()
    emb = synth_embeddings(spark, n, dim).repartition(cores).persist()
    emb.count()
    gen_s = time.monotonic() - t0

    t0 = time.monotonic()
    cents = sim.kmeans_fit(emb, n_centroids=k, iters=1)
    fit_s = time.monotonic() - t0

    t0 = time.monotonic()
    assigned = sim._auto_assign(
        emb.select("vec_id", "embedding"), cents, "embedding"
    )
    n_cells = assigned.select("cluster").distinct().count()
    assign_s = time.monotonic() - t0

    # exact HOF lane on a sample, for the lane-speed ratio the gate
    # (NP_ASSIGN_MIN_TERMS) is justified by
    exact_n = min(n, 20_000)
    sample = emb.limit(exact_n).repartition(cores).persist()
    sample.count()
    t0 = time.monotonic()
    sim._with_nearest(
        sample,
        sim._cents_relation(spark, cents),
        F.transform(F.col("embedding"), lambda x: x.cast("double")),
    ).select(F.max("cluster")).collect()
    exact_s = time.monotonic() - t0

    # end-to-end near-pair extraction at the K=ceil(sqrt n) default
    e2e_n = min(n, 50_000)
    small = synth_embeddings(spark, e2e_n, dim).persist()
    small.count()
    t0 = time.monotonic()
    pairs = sim.semantic_near_pairs(small, threshold=0.92)  # K defaults to √n
    e2e_pairs = pairs.count()
    e2e_s = time.monotonic() - t0

    print(
        json.dumps(
            {
                "cores": cores,
                "n": n,
                "dim": dim,
                "k": k,
                "n_cells_used": n_cells,
                "gen_s": round(gen_s, 2),
                "fit_s": round(fit_s, 2),
                "assign_s": round(assign_s, 2),
                "assign_rows_per_s": round(n / assign_s),
                "exact_lane_sample_n": exact_n,
                "exact_lane_s": round(exact_s, 2),
                "exact_lane_rows_per_s": round(exact_n / exact_s),
                "e2e_n": e2e_n,
                "e2e_pairs": e2e_pairs,
                "e2e_s": round(e2e_s, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
