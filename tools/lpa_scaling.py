"""label_propagation_communities N-vs-4N scaling measurement — the
round-2 verdict's missing at-scale LPA row (CC and PageRank had 40M-edge
pairs; LPA's local gate is 500k, so its distributed JP-coloring sweep
loop had no committed large-graph number).

Same deterministic Zipf edge generator as cc_scaling.py; forces the
distributed path (local_max_edges=0) and prints one JSON line:

    python tools/lpa_scaling.py <cores> [n_nodes] [avg_out]
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
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 800_000
    avg_out = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    from pyspark.sql import functions as F

    from linkgraph.graph import LinkGraph
    from linkgraph.operators.label_propagation import (
        label_propagation_communities,
    )
    from linkgraph.session import get_spark

    spark = get_spark(
        f"lpa-{cores}", master=f"local[{cores}]", shuffle_partitions=cores
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
    g = LinkGraph(vertices=verts, edges=edges, directed=False)

    t0 = time.monotonic()
    labels = label_propagation_communities(g, local_max_edges=0)
    n_comm = labels.agg(F.countDistinct("label").alias("c")).collect()[0]["c"]
    total = time.monotonic() - t0
    print(
        json.dumps(
            {
                "cores": cores,
                "n_nodes": n,
                "n_edges": n_edges,
                "n_communities": n_comm,
                "lpa_s": round(total, 2),
                "edges_per_sec": round(n_edges / total, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
