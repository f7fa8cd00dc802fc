"""Incremental-serving refresh at scale: cold vs warm, store vs pages.

North-rule evidence for the serving composition (pages arrive, the
graph grows, per-url ranks stay fresh): builds a 1M-page Zipf corpus,
crawls 90% as epoch 1, appends the remaining 10% as epoch 2, and
measures the epoch-2 WARM refresh through BOTH graph sources:

* the r5 **edge store** (``ingest_pages`` extracts each batch once at
  ingest; a refresh is an O(E) parquet scan + dense-id rebuild +
  warm-started PageRank — the 100 TB shape), and
* the legacy **pages path** (re-read + re-extract the whole crawl per
  refresh — the round-4 measured scale-killer: rebuild was ≈55 s of a
  62 s warm refresh at 1M pages).

Every leg >1 min runs under the /proc/stat steal canary
(tools/steal_canary.py — the round-4 protocol fix: endpoint probes
cannot see a mid-leg steal burst), with auto-retry while interior
steal exceeds the gate. Deterministic corpus (same zipf_edges family
as cc_scaling), so the ranks fixpoint is identical across runs and
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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("LINKGRAPH_DRIVER_MEM", "48g")


def main() -> None:
    cores = int(sys.argv[1])
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    avg_out = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from pyspark.sql import functions as F

    from linkgraph.session import get_spark
    from linkgraph.sources.corpus import pages_from_edges, zipf_edges
    from linkgraph.streaming.incremental import ingest_pages, refresh_ranks
    from steal_canary import run_certified

    spark = get_spark(
        f"incr-{cores}", master=f"local[{cores}]", shuffle_partitions=cores
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(1024).mapInPandas(lambda it: it, "id long").count()

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
    pages_path = base + "/pages"
    store = base + "/store"
    ranks_store = base + "/ranks_store"
    ranks_pages = base + "/ranks_pages"
    p1, p2 = pages_path + "/b1", pages_path + "/b2"
    pages_from_edges(v1, e1, name="is").write.mode("overwrite").parquet(p1)
    pages_from_edges(v2, e2, name="is").write.mode("overwrite").parquet(p2)

    out: dict = {"cores": cores, "n_pages": n}

    # --- ingest: the once-per-page extraction cost, paid at append
    # time (this is what the refreshers no longer pay) ---------------
    t0 = time.monotonic()
    ingest_pages(spark, spark.read.parquet(p1), store)
    out["ingest_epoch1_s"] = round(time.monotonic() - t0, 2)

    cold_stats: dict = {}

    def cold_leg():
        # idempotent under canary retry: a leftover serving table from
        # an uncertified attempt would silently turn this leg warm
        shutil.rmtree(ranks_store, ignore_errors=True)
        t0 = time.monotonic()
        refresh_ranks(
            spark, None, ranks_store, store_path=store, tol=1e-8,
            stats_out=cold_stats, local_max_edges=0,
        )
        return time.monotonic() - t0

    cold_s, steal_cold = run_certified(cold_leg)
    out["cold_refresh_store_s"] = round(cold_s, 2)
    out["cold_supersteps"] = cold_stats.get("iterations")
    out["steal_cold"] = steal_cold
    # snapshot the epoch-1 serving table: BOTH warm legs below restore
    # it per attempt, so they start from the identical state and run
    # the identical supersteps — the wall difference is purely rebuild
    epoch1 = base + "/ranks_epoch1"
    shutil.copytree(ranks_store, epoch1)

    t0 = time.monotonic()
    ingest_pages(spark, spark.read.parquet(p2), store)
    out["ingest_epoch2_s"] = round(time.monotonic() - t0, 2)

    warm_stats: dict = {}

    def warm_leg():
        shutil.rmtree(ranks_store, ignore_errors=True)
        shutil.copytree(epoch1, ranks_store)  # restore outside timing
        t0 = time.monotonic()
        serving = refresh_ranks(
            spark, None, ranks_store, store_path=store, tol=1e-8,
            stats_out=warm_stats, local_max_edges=0,
        )
        dt = time.monotonic() - t0
        return dt, serving.agg(F.sum("rank")).first()[0]

    (warm_s, rank_mass), steal_warm = run_certified(warm_leg)
    out["warm_refresh_store_s"] = round(warm_s, 2)
    out["warm_supersteps"] = warm_stats.get("iterations")
    out["steal_warm"] = steal_warm
    out["rank_mass"] = round(float(rank_mass), 9)

    # --- legacy comparison: same warm refresh (identical warm-start
    # table, snapshotted after epoch 1), whole-crawl re-extraction
    # (the round-4 O(corpus) shape) ----------------------------------
    pages_warm_stats: dict = {}

    def pages_leg():
        shutil.rmtree(ranks_pages, ignore_errors=True)
        shutil.copytree(epoch1, ranks_pages)  # restore outside timing
        t0 = time.monotonic()
        refresh_ranks(
            spark, pages_path + "/b*", ranks_pages, tol=1e-8,
            stats_out=pages_warm_stats, local_max_edges=0,
        )
        return time.monotonic() - t0

    pages_s, steal_pages = run_certified(pages_leg)
    out["warm_refresh_pages_s"] = round(pages_s, 2)
    out["warm_supersteps_pages"] = pages_warm_stats.get("iterations")
    out["steal_pages"] = steal_pages

    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
