"""Two-cluster-size scaling evidence (sandbox substitution for N vs 4N
executors, per driver instruction): run the IDENTICAL job at two
parallelism levels and report throughput + efficiency.

One invocation = one measurement (fresh JVM so levels don't share a
warmed executor):

    python tools/scaling_bench.py <cores> [n_pages] [avg_out] [pr_iters]

Prints one JSON line:
  {"cores": C, "n_pages": N, "n_edges": M, "ingest_s": ..,
   "pagerank_s": .., "edges_per_sec_per_superstep": ..,
   "ingest_pages_per_sec": ..}

The job is the full mandated pipeline: synthetic Common-Crawl-style
pages -> vectorized Arrow extraction UDF -> id dictionary -> edge
table -> salted CSR adjacency -> fixed-superstep PageRank.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    avg_out = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    pr_iters = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    from linkgraph.graph import graph_from_pages
    from linkgraph.operators.pagerank import pagerank
    from linkgraph.session import get_spark
    from linkgraph.sources.corpus import zipf_pages

    spark = get_spark(
        f"scaling-{cores}", master=f"local[{cores}]", shuffle_partitions=cores
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    t0 = time.monotonic()
    pages = zipf_pages(spark, n=n_pages, avg_out=avg_out, partitions=cores)
    g = graph_from_pages(pages, directed=True)
    g.edges.persist()
    g.vertices.persist()
    n_edges = g.edges.count()
    g.vertices.count()
    t_ingest = time.monotonic() - t0

    # warm the pagerank codepath once (2 iters), then measure
    pagerank(g, fixed_iter=2).write.format("noop").mode("overwrite").save()
    t0 = time.monotonic()
    pagerank(g, fixed_iter=pr_iters).write.format("noop").mode("overwrite").save()
    t_pr = time.monotonic() - t0

    print(
        json.dumps(
            {
                "cores": cores,
                "n_pages": n_pages,
                "n_edges": n_edges,
                "pr_iters": pr_iters,
                "ingest_s": round(t_ingest, 2),
                "pagerank_s": round(t_pr, 2),
                "edges_per_sec_per_superstep": round(n_edges * pr_iters / t_pr, 1),
                "ingest_pages_per_sec": round(n_pages / t_ingest, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
