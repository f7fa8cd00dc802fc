"""Re-pin of the headline-pipeline rows (BENCH.md §6 protocol): one
invocation = ONE fresh-JVM repetition of exactly bench.py's headline
phases (zipf pages -> extraction -> graph build, then 5 fixed PageRank
supersteps), bracketed by pure-CPU probes so host steal is visible in
the record. Run it 3+ times and report median ± spread.

    python tools/pin_pipeline_bench.py [cores] [n_pages] [pr_iters]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("LINKGRAPH_DRIVER_MEM", "48g")


def cpu_probe() -> float:
    """GFLOP/s of a fixed 1200^2 float64 matmul (BLAS, default
    threading) — a host-steal canary, not a benchmark."""
    import numpy as np

    n = 1200
    a = np.arange(n * n, dtype="float64").reshape(n, n) / (n * n)
    t0 = time.perf_counter()
    reps = 6
    for _ in range(reps):
        a @ a
    dt = time.perf_counter() - t0
    return round(reps * 2.0 * n**3 / dt / 1e9, 2)


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    pr_iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    probe_before = cpu_probe()

    from linkgraph.graph import graph_from_pages
    from linkgraph.operators.pagerank import pagerank
    from linkgraph.session import get_spark
    from linkgraph.sources.corpus import zipf_pages

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from steal_canary import StealCanary

    spark = get_spark(
        f"pin-bench-{cores}", master=f"local[{cores}]", shuffle_partitions=cores
    )
    spark.range(1).count()  # JVM warmup outside timings

    # r5: interior steal certification over both timed phases (the
    # endpoint probes bracket but cannot see a mid-leg burst)
    with StealCanary() as canary:
        t0 = time.monotonic()
        pages = zipf_pages(spark, n=n_pages, avg_out=10, partitions=cores)
        g = graph_from_pages(pages, directed=True)
        g = type(g)(
            vertices=g.vertices.persist(), edges=g.edges.persist(), directed=True
        )
        n_edges = g.edges.count()
        g.vertices.count()
        t_ingest = round(time.monotonic() - t0, 3)

        t0 = time.monotonic()
        ranks = pagerank(g, alpha=0.85, fixed_iter=pr_iters)
        ranks.write.format("noop").mode("overwrite").save()
        t_pr = round(time.monotonic() - t0, 3)

    probe_after = cpu_probe()
    print(
        json.dumps(
            {
                "cores": cores,
                "n_pages": n_pages,
                "n_edges": n_edges,
                "pages_ingest_extract": t_ingest,
                "pages_pagerank": t_pr,
                "edges_per_sec_superstep": round(n_edges * pr_iters / t_pr),
                "probe_gflops_before": probe_before,
                "probe_gflops_after": probe_after,
                "steal": canary.summary(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
