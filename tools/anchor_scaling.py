"""Anchor-pipeline N-vs-4N scaling measurement (round-4 item: the
anchor workload at-scale, probe-gated like §7e/§7f).

Input: n synthetic pages rendered fully distributed via
``pages_from_edges`` over the same deterministic Zipf edge generator
as cc_scaling.py, with VARIED anchor text (17 rotating phrases keyed
off the edge hash) so the per-target profile aggregation has real
work. Measured leg = ``anchors_from_pages`` (vectorized Arrow parse of
every page) -> ``anchor_text_profile`` (two hash aggregations,
max_by top-anchor) -> noop sink; the page render/persist is input
prep, reported separately. Prints one JSON line with a determinism
witness (total anchor rows + distinct targets).

    python tools/anchor_scaling.py <cores> [n_pages] [avg_out]
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
    avg_out = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from pyspark.sql import functions as F

    from linkgraph.session import get_spark
    from linkgraph.sources.corpus import pages_from_edges
    from linkgraph.sources.extract import anchor_text_profile, anchors_from_pages

    spark = get_spark(
        f"anchors-{cores}", master=f"local[{cores}]", shuffle_partitions=cores
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from linkgraph.sources.corpus import zipf_edges

    ids = spark.range(0, n, 1, cores)
    phrases = F.array(
        *[F.lit(f"anchor phrase {i} quality") for i in range(17)]
    )
    edges = zipf_edges(spark, n, avg_out=avg_out, partitions=cores).select(
        F.col("src").cast("string").alias("src_name"),
        F.col("dst").cast("string").alias("dst_name"),
        F.element_at(
            phrases, (F.pmod(F.xxhash64("src", "dst"), F.lit(17)) + 1).cast("int")
        ).alias("label"),
    )
    verts = ids.select(F.col("id").cast("string").alias("name"))

    t_prep = time.monotonic()
    pages = pages_from_edges(verts, edges, name="as", anchor_col="label").persist()
    n_pages = pages.count()
    prep_s = time.monotonic() - t_prep

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from steal_canary import run_certified

    def leg():
        t0 = time.monotonic()
        anchors = anchors_from_pages(pages)
        prof = anchor_text_profile(anchors)
        prof.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    # r5 interior-certified leg (the r4 8->32 pair was uncertifiable
    # under endpoint brackets): /proc/stat steal sampling + auto-retry
    wall, steal = run_certified(leg)
    # determinism witness (cheap second pass over the cached pages)
    stats = anchor_text_profile(anchors_from_pages(pages)).agg(
        F.sum("n_inlinks").alias("rows"), F.count(F.lit(1)).alias("targets")
    ).first()
    print(
        json.dumps(
            {
                "cores": cores,
                "n_pages": n_pages,
                "avg_out": avg_out,
                "render_prep_s": round(prep_s, 2),
                "anchor_pipeline_s": round(wall, 2),
                "anchor_rows": int(stats["rows"]),
                "distinct_targets": int(stats["targets"]),
                "anchors_per_sec": round(int(stats["rows"]) / wall, 1),
                "steal": steal,
            }
        )
    )


if __name__ == "__main__":
    main()
