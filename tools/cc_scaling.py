"""connected_components N-vs-4N scaling measurement (north-rule
evidence for a second algorithm beyond PageRank).

Same deterministic Zipf edge generator as loop_scaling.py; runs the
CSR-gather CC superstep loop and prints one JSON line:

    python tools/cc_scaling.py <cores> [n_nodes] [avg_out]
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
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    avg_out = int(sys.argv[3]) if len(sys.argv) > 3 else 40

    from pyspark.sql import functions as F

    from linkgraph.graph import LinkGraph
    from linkgraph.operators.components import connected_components
    from linkgraph.session import get_spark

    spark = get_spark(
        f"cc-{cores}", master=f"local[{cores}]", shuffle_partitions=cores
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from linkgraph.sources.corpus import zipf_edges

    ids = spark.range(0, n, 1, cores)
    edges = (
        zipf_edges(spark, n, avg_out=avg_out, partitions=cores)
        .withColumn("weight", F.lit(1.0))
        .persist()
    )
    n_edges = edges.count()
    verts = ids.select("id").persist()
    verts.count()
    g = LinkGraph(vertices=verts, edges=edges, directed=False)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from steal_canary import run_certified

    def leg():
        t0 = time.monotonic()
        ncc = (
            connected_components(g)
            .agg(F.countDistinct("component").alias("ncc"))
            .collect()[0]["ncc"]
        )
        return time.monotonic() - t0, ncc

    # r5: interior steal certification + auto-retry (tools/steal_canary)
    (total, ncc), steal = run_certified(leg)
    print(
        json.dumps(
            {
                "cores": cores,
                "n_nodes": n,
                "n_edges": n_edges,
                "n_components": ncc,
                "cc_s": round(total, 2),
                "edges_per_sec": round(n_edges / total, 1),
                "steal": steal,
            }
        )
    )


if __name__ == "__main__":
    main()
