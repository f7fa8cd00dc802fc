"""Superstep-loop scaling measurement isolated from ingest.

Generates the edge table directly (same deterministic Zipf target
distribution as the corpus generator, minus html rendering) so the
measurement is pure gather-scatter loop:

    python tools/loop_scaling.py <cores> [n_nodes] [avg_out] [iters]

Prints one JSON line with prep_s / loop_s / edges_per_sec_per_superstep.
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
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    avg_out = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    from pyspark.sql import functions as F

    from linkgraph.graph import LinkGraph
    from linkgraph.operators.pagerank import pagerank
    from linkgraph.session import get_spark

    spark = get_spark(
        f"loop-{cores}", master=f"local[{cores}]", shuffle_partitions=cores
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    exponent = 0.7
    ids = spark.range(0, n, 1, cores)
    k = ids.select(
        "id",
        F.explode(
            F.sequence(F.lit(0), F.pmod(F.xxhash64("id"), F.lit(avg_out * 2 - 1)))
        ).alias("k"),
    )
    u = (F.pmod(F.xxhash64("id", "k"), F.lit(1_000_000_007)) + 1) / 1_000_000_008.0
    dst = F.least(
        F.lit(n - 1), F.floor(F.pow(u, F.lit(1.0 / (1.0 - exponent))) * n)
    ).cast("long")
    edges = (
        k.select(F.col("id").alias("src"), dst.alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .withColumn("weight", F.lit(1.0))
        .persist()
    )
    n_edges = edges.count()
    verts = ids.select("id").persist()
    verts.count()
    g = LinkGraph(vertices=verts, edges=edges, directed=True)

    warm = int(os.environ.get("LINKGRAPH_WARMUP_ITERS", "2"))
    # LINKGRAPH_DST_BLOCKS > 1 measures the 2D grid layout (BENCH §7)
    dst_blocks = int(os.environ.get("LINKGRAPH_DST_BLOCKS", "0")) or None
    pagerank(g, fixed_iter=warm, dst_blocks=dst_blocks).write.format("noop").mode(
        "overwrite"
    ).save()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from steal_canary import run_certified

    stats: dict = {}

    def leg():
        t0 = time.monotonic()
        pagerank(
            g, fixed_iter=iters, dst_blocks=dst_blocks, stats_out=stats
        ).write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    # r5: interior steal certification + auto-retry (tools/steal_canary)
    total, steal = run_certified(leg)
    loop_s = stats.get("loop_s", total)
    print(
        json.dumps(
            {
                "cores": cores,
                "n_nodes": n,
                "n_edges": n_edges,
                "iters": iters,
                "dst_blocks": dst_blocks,
                "prep_s": stats.get("prep_s"),
                "loop_s": round(loop_s, 2),
                "total_s": round(total, 2),
                "edges_per_sec_per_superstep": round(n_edges * iters / loop_s, 1),
                "steal": steal,
            }
        )
    )


if __name__ == "__main__":
    main()
