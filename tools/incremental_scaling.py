"""Incremental-serving refresh at scale: cold vs warm, N vs 4N.

North-rule evidence for the serving composition (pages arrive, the
graph grows, per-url ranks stay fresh): builds a 1M-page Zipf corpus,
crawls 90% as epoch 1 (cold PageRank refresh), appends the remaining
10% as epoch 2 (warm refresh seeded from the epoch-1 url-keyed serving
table), and prints one JSON line with both walls, both superstep
counts (tol=1e-8: tight enough that the warm start visibly shortens
the iteration tail), and the warm/cold superstep ratio — the quantity warm starts
exist to shrink. Deterministic corpus (same generator family as
cc_scaling), so the ranks fixpoint is identical across runs and
parallelism levels.

    python tools/incremental_scaling.py <cores> [n_pages] [avg_out]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("LINKGRAPH_DRIVER_MEM", "48g")


def main() -> None:
    cores = int(sys.argv[1])
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    avg_out = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from pyspark.sql import functions as F

    from linkgraph.session import get_spark
    from linkgraph.sources.corpus import pages_from_edges
    from linkgraph.streaming.incremental import refresh_ranks

    spark = get_spark(
        f"incr-{cores}", master=f"local[{cores}]", shuffle_partitions=cores
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(1024).mapInPandas(lambda it: it, "id long").count()

    from linkgraph.sources.corpus import zipf_edges

    ids = spark.range(0, n, 1, cores)
    edges = zipf_edges(spark, n, avg_out=avg_out, partitions=cores).select(
        F.col("src").cast("string").alias("src_name"),
        F.col("dst").cast("string").alias("dst_name"),
        F.col("src").alias("skey"),
    )
    verts = ids.select(
        F.col("id").cast("string").alias("name"), F.col("id").alias("key")
    )
    # the appended epoch = the id TAIL (newly-discovered pages sit in
    # the Zipf tail; appending the hubs instead would redistribute most
    # of the rank mass and erase the warm-start advantage by design)
    cut = int(n * 0.9)
    v1 = verts.where(F.col("key") < cut).select("name")
    v2 = verts.where(F.col("key") >= cut).select("name")
    e1 = edges.where(F.col("skey") < cut).select("src_name", "dst_name")
    e2 = edges.where(F.col("skey") >= cut).select("src_name", "dst_name")

    base = f"/tmp/lg_incr_scale_{cores}"
    shutil.rmtree(base, ignore_errors=True)
    pages_path, ranks_path = base + "/pages", base + "/ranks"
    pages_from_edges(v1, e1, name="is").write.mode("overwrite").parquet(pages_path)

    cold_stats: dict = {}
    t0 = time.monotonic()
    refresh_ranks(
        spark, pages_path, ranks_path, tol=1e-8, stats_out=cold_stats,
        local_max_edges=0,
    )
    cold_s = time.monotonic() - t0

    pages_from_edges(v2, e2, name="is").write.mode("append").parquet(pages_path)
    warm_stats: dict = {}
    t0 = time.monotonic()
    serving = refresh_ranks(
        spark, pages_path, ranks_path, tol=1e-8, stats_out=warm_stats,
        local_max_edges=0,
    )
    warm_s = time.monotonic() - t0
    total_rank = serving.agg(F.sum("rank")).first()[0]

    print(
        json.dumps(
            {
                "cores": cores,
                "n_pages": n,
                "cold_refresh_s": round(cold_s, 2),
                "warm_refresh_s": round(warm_s, 2),
                "cold_supersteps": cold_stats.get("iterations"),
                "warm_supersteps": warm_stats.get("iterations"),
                "rank_mass": round(float(total_rank), 9),
            }
        )
    )
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
