"""Triangle-count N-vs-4N scaling measurement (north-rule evidence
for the fourth and last headline algorithm — PageRank, CC and LPA
already have 40M-edge N→4N pairs in BENCH.md; this adds triangles).

Same deterministic Zipf edge generator as cc_scaling.py /
lpa_scaling.py, sized for a wedge-bound (not edge-bound) workload:
triangle counting is O(Σ C(out-deg, 2)) over the degree-oriented
graph, so the knob that fixes the work is the wedge total, which the
tool measures and prints next to edges/s and wedges/s. The
distributed plan is pinned (``local_max_edges=0``) — this measures
the oriented wedge join + closing semi-join that runs at 100×, not
the single-task local kernel.

    python tools/triangle_scaling.py <cores> [n_nodes] [avg_out]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("LINKGRAPH_DRIVER_MEM", "48g")


def main() -> None:
    cores = int(sys.argv[1])
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 800_000
    avg_out = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    parts = int(sys.argv[4]) if len(sys.argv) > 4 else cores
    aqe = sys.argv[5] if len(sys.argv) > 5 else "on"

    from pyspark.sql import functions as F

    from linkgraph.graph import LinkGraph
    from linkgraph.operators.triangles import _oriented, all_triangles
    from linkgraph.session import get_spark

    spark = get_spark(
        f"tri-{cores}", master=f"local[{cores}]", shuffle_partitions=parts
    )
    if aqe == "off":
        spark.conf.set("spark.sql.adaptive.enabled", "false")
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

    # untimed workload-shape probe: exact oriented-wedge total — the
    # quantity the timed join below streams through the closing probe
    o = _oriented(g).persist()
    wedges = (
        o.groupBy("lo")
        .agg(F.count(F.lit(1)).alias("d"))
        .select(F.sum(F.expr("d * (d - 1) / 2")).alias("w"))
        .collect()[0]["w"]
    )
    o.unpersist()

    from pin_pipeline_bench import cpu_probe

    cpu_probe()  # warm BLAS thread pool — the first in-process matmul
    # pays init cost and reads systematically low (~40%), which would
    # starve the >=150 GFLOP/s quiet-host gate of clean legs
    probe_before = cpu_probe()
    t0 = time.monotonic()
    n_tri = all_triangles(g, local_max_edges=0).count()
    total = time.monotonic() - t0
    probe_after = cpu_probe()
    print(
        json.dumps(
            {
                "cores": cores,
                "n_nodes": n,
                "n_edges": n_edges,
                "oriented_wedges": int(wedges),
                "n_triangles": n_tri,
                "triangles_s": round(total, 2),
                "edges_per_sec": round(n_edges / total, 1),
                "wedges_per_sec": round(wedges / total, 1),
                "parts": parts,
                "aqe": aqe,
                "probe_gflops_before": probe_before,
                "probe_gflops_after": probe_after,
            }
        )
    )


if __name__ == "__main__":
    main()
