"""Two-cluster-size scaling evidence (sandbox substitution for N vs 4N
executors, per driver instruction): run the IDENTICAL job at two
parallelism levels and report throughput + efficiency.

One invocation = one measurement (fresh JVM so levels don't share a
warmed executor):

    python tools/scaling_bench.py <cores> [n_pages] [avg_out] [pr_iters]

Prints one JSON line with per-phase timings:
  corpus_s   — synthetic page generation (html bytes materialized)
  extract_s  — vectorized Arrow extraction UDF -> raw (src_url, dst_url)
  build_s    — id dictionary + edge table + counts
  pagerank_s — fixed-superstep PageRank over the salted CSR adjacency

The job is the full mandated pipeline over the input_hint page schema.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("LINKGRAPH_DRIVER_MEM", "48g")


def main() -> None:
    cores = int(sys.argv[1])
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    avg_out = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    pr_iters = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    from pyspark.sql import functions as F

    from linkgraph.graph import LinkGraph, assign_dense_ids
    from linkgraph.operators.pagerank import pagerank
    from linkgraph.session import get_spark
    from linkgraph.sources.corpus import zipf_pages
    from linkgraph.sources.extract import edges_from_pages

    spark = get_spark(
        f"scaling-{cores}", master=f"local[{cores}]", shuffle_partitions=cores
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    t0 = time.monotonic()
    pages = zipf_pages(spark, n=n_pages, avg_out=avg_out, partitions=cores).persist()
    pages.count()
    t_corpus = time.monotonic() - t0

    t0 = time.monotonic()
    raw = edges_from_pages(pages).persist()
    n_raw = raw.count()
    t_extract = time.monotonic() - t0

    t0 = time.monotonic()
    ids = assign_dense_ids(pages.select("url"), "url").persist()
    v = ids.select("id", "url")
    e = (
        raw.join(ids.withColumnRenamed("id", "src"), raw.src_url == F.col("url"))
        .drop("url")
        .join(ids.withColumnRenamed("id", "dst"), F.col("dst_url") == F.col("url"))
        .select("src", "dst", F.lit(1.0).alias("weight"))
    ).persist()
    n_edges = e.count()
    g = LinkGraph(vertices=v, edges=e, directed=True)
    t_build = time.monotonic() - t0
    pages.unpersist()
    raw.unpersist()

    # warm the pagerank codepath once (2 iters), then measure
    pagerank(g, fixed_iter=2).write.format("noop").mode("overwrite").save()
    stats: dict = {}
    t0 = time.monotonic()
    pagerank(g, fixed_iter=pr_iters, stats_out=stats).write.format("noop").mode(
        "overwrite"
    ).save()
    t_pr = time.monotonic() - t0
    t_loop = stats.get("loop_s", t_pr)

    ingest_s = t_corpus + t_extract + t_build
    print(
        json.dumps(
            {
                "cores": cores,
                "n_pages": n_pages,
                "n_raw_links": n_raw,
                "n_edges": n_edges,
                "pr_iters": pr_iters,
                "corpus_s": round(t_corpus, 2),
                "extract_s": round(t_extract, 2),
                "build_s": round(t_build, 2),
                "ingest_s": round(ingest_s, 2),
                "pagerank_s": round(t_pr, 2),
                "pagerank_prep_s": stats.get("prep_s"),
                "pagerank_loop_s": round(t_loop, 2),
                "edges_per_sec_per_superstep": round(n_edges * pr_iters / t_loop, 1),
                "ingest_pages_per_sec": round(n_pages / ingest_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
