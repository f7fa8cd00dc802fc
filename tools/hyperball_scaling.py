"""HyperBall N-vs-4N scaling measurement (north-rule evidence for the
approximate-neighbourhood algorithm family).

Same deterministic Zipf edge generator as cc_scaling.py; runs t
HyperBall supersteps (b register bits → 2^b max-agg columns) over the
persisted dst-partitioned edge table and prints one JSON line with a
determinism witness (the global register sum, exact integer):

    python tools/hyperball_scaling.py <cores> [n_nodes] [avg_out] [b] [t]
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
    avg_out = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    b = int(sys.argv[4]) if len(sys.argv) > 4 else 6
    t = int(sys.argv[5]) if len(sys.argv) > 5 else 4

    from pyspark.sql import functions as F

    from linkgraph.graph import LinkGraph
    from linkgraph.operators.hyperball import hyperball_registers
    from linkgraph.session import get_spark

    spark = get_spark(
        f"hb-{cores}", master=f"local[{cores}]", shuffle_partitions=cores
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
    g = LinkGraph(vertices=verts, edges=edges, directed=True)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from steal_canary import run_certified

    def leg():
        t0 = time.monotonic()
        regs = hyperball_registers(g, b=b, t=t)
        reg_sum = regs.select(
            sum((F.col(f"r{i}") for i in range(1 << b)), F.lit(0)).alias("s")
        ).agg(F.sum("s").alias("total")).collect()[0]["total"]
        return time.monotonic() - t0, reg_sum

    # r5: interior steal certification + auto-retry (tools/steal_canary)
    (total, reg_sum), steal = run_certified(leg)
    print(
        json.dumps(
            {
                "cores": cores,
                "n_nodes": n,
                "n_edges": n_edges,
                "b": b,
                "t": t,
                "register_sum": int(reg_sum),
                "hyperball_s": round(total, 2),
                "edge_supersteps_per_sec": round(n_edges * t / total, 1),
                "steal": steal,
            }
        )
    )


if __name__ == "__main__":
    main()
