"""Reference-scale benchmark: the exact graphs BASELINE.md measured
the single-node reference on, run through the engine.

    gnm(1e5 nodes, 1e6 edges, seed=42): connected_components (ref
    0.30 s), triangles total == 1355 (ref 4.0 s)
    karate: label_propagation_communities (ref 1.5 ms)

Graph generation (networkx, driver-side) is untimed — shape parity
with the reference measurement is the point, not ingest. Prints ONE
JSON line. Usage: python tools/ref_scale_bench.py [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    import networkx as nxlib
    import pandas as pd
    from pyspark.sql import functions as F

    from linkgraph.graph import LinkGraph
    from linkgraph.operators.components import connected_components
    from linkgraph.operators.label_propagation import label_propagation_communities
    from linkgraph.operators.triangles import all_triangles
    from linkgraph.session import get_spark

    spark = get_spark(
        "ref-scale-bench", master=f"local[{cores}]", shuffle_partitions=cores
    )
    spark.range(1).count()  # JVM warmup outside timings

    out: dict = {"metric": "wall seconds at the reference's measured scale",
                 "unit": "sec", "cores": cores}

    G = nxlib.gnm_random_graph(100_000, 1_000_000, seed=42)
    epd = pd.DataFrame(list(G.edges()), columns=["src", "dst"])
    edf = spark.createDataFrame(epd).select(
        F.col("src").cast("long"), F.col("dst").cast("long"),
        F.lit(1.0).alias("weight"),
    )
    g = LinkGraph(
        vertices=spark.range(100_000).select("id").persist(),
        edges=edf.persist(),
        directed=False,
    )
    g.edges.count()
    g.vertices.count()

    t0 = time.monotonic()
    ncc = connected_components(g).agg(F.countDistinct("component")).first()[0]
    out["gnm1e6_cc_s"] = round(time.monotonic() - t0, 2)
    out["gnm1e6_cc_ncc"] = ncc
    assert ncc == 1, ncc  # reference: 1 component

    t0 = time.monotonic()
    ntri = all_triangles(g).count()
    out["gnm1e6_triangles_s"] = round(time.monotonic() - t0, 2)
    out["gnm1e6_triangles_n"] = ntri
    assert ntri == 1355, ntri  # reference: 1,355 triangles

    kar = nxlib.karate_club_graph()
    kpd = pd.DataFrame(list(kar.edges()), columns=["src", "dst"])
    kdf = spark.createDataFrame(kpd).select(
        F.col("src").cast("long"), F.col("dst").cast("long"),
        F.lit(1.0).alias("weight"),
    )
    kg = LinkGraph(
        vertices=spark.range(34).select("id"), edges=kdf, directed=False
    )
    t0 = time.monotonic()
    ncomm = (
        label_propagation_communities(kg).select("label").distinct().count()
    )
    out["lpa_karate_s"] = round(time.monotonic() - t0, 2)
    out["lpa_karate_communities"] = ncomm

    out["reference_s"] = {"gnm1e6_cc": 0.30, "gnm1e6_triangles": 4.0,
                          "lpa_karate": 0.0015}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
