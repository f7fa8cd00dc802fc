"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

The BASELINE.json metric is PageRank throughput (edges/sec per
superstep) — measured here on the full mandated pipeline: synthetic
Common-Crawl-style pages -> vectorized extraction UDF -> edge table ->
fixed-superstep PageRank. Per-query wall times for the broader
operator surface ride along in "queries".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    pages_n = int(os.environ.get("LINKGRAPH_BENCH_PAGES", "50000"))
    pr_iters = int(os.environ.get("LINKGRAPH_BENCH_PR_ITERS", "5"))

    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    from linkgraph.graph import graph_from_pages
    from linkgraph.operators.pagerank import pagerank
    from linkgraph.session import get_spark
    from linkgraph.sources.corpus import zipf_pages

    spark = get_spark(
        "linkgraph-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.range(1).count()  # JVM warmup outside timings
    # Arrow/python-worker warmup: the first mapInPandas of a session
    # pays worker spin-up + Arrow codepath initialization (measured
    # 7.2 s cold vs 1.7 s steady-state on the 1M-edge CC local kernel);
    # the reference numbers exclude interpreter startup, so the
    # operator timings here exclude it symmetrically
    spark.range(1024).mapInPandas(lambda it: it, "id long").count()

    # host-steal canary (BENCH.md §6): GFLOP/s of a fixed matmul before
    # and after the sweep — readers calibrate the wall clocks against
    # the quiet-host value (~220 on this VM)
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    from pin_pipeline_bench import cpu_probe

    # §6b probe gate, applied to the sweep itself (round-3 hygiene
    # item): wait out host steal until the canary clears the gate, up
    # to a bounded wait so an unlucky driver run still completes; the
    # JSON records whether BOTH probes cleared so readers know if the
    # wall clocks are claimable or steal-contaminated.
    probe_gate = float(os.environ.get("LINKGRAPH_PROBE_GATE", "150"))
    probe_wait_s = float(os.environ.get("LINKGRAPH_PROBE_WAIT_S", "600"))
    t_gate = time.monotonic()
    probe_before = cpu_probe()
    while probe_before < probe_gate and time.monotonic() - t_gate < probe_wait_s:
        time.sleep(15)
        probe_before = cpu_probe()

    # r5: interior steal certification for the whole sweep (the
    # endpoint probes above cannot see a mid-run steal burst —
    # tools/steal_canary.py). Kernel-side /proc/stat sampling, zero
    # CPU cost, immune to the sweep's own load.
    from steal_canary import StealCanary

    canary = StealCanary(interval_s=10.0)
    canary.__enter__()

    timings: dict[str, float] = {}

    def run(name: str, fn) -> None:
        t0 = time.monotonic()
        fn()
        timings[name] = round(time.monotonic() - t0, 3)

    qs = entry.queries()

    # --- headline FIRST (fresh session, no accumulated checkpoint/cache
    # state): pages -> extraction -> edges -> PageRank supersteps ---
    t0 = time.monotonic()
    pages = zipf_pages(spark, n=pages_n, avg_out=10, partitions=cpus)
    g = graph_from_pages(pages, directed=True)
    g = type(g)(
        vertices=g.vertices.persist(), edges=g.edges.persist(), directed=True
    )
    n_edges = g.edges.count()
    g.vertices.count()
    t_ingest = time.monotonic() - t0
    timings["pages_ingest_extract"] = round(t_ingest, 3)

    # default engine path (the size gate picks the single-task numpy
    # kernel at this scale — the honest engine behavior a user gets,
    # and the number comparable to BASELINE.md's single-node 1.9M
    # edges/s/superstep reference row)
    t0 = time.monotonic()
    ranks = pagerank(g, alpha=0.85, fixed_iter=pr_iters)
    ranks.write.format("noop").mode("overwrite").save()
    t_pr = time.monotonic() - t0
    timings["pages_pagerank"] = round(t_pr, 3)
    edges_per_sec = n_edges * pr_iters / t_pr

    # distributed-plan twin (local_max_edges=0): the salted CSR-block
    # superstep plan that runs at 100 TB, pinned regardless of size
    t0 = time.monotonic()
    pagerank(g, alpha=0.85, fixed_iter=pr_iters, local_max_edges=0).write.format(
        "noop"
    ).mode("overwrite").save()
    t_pr_dist = time.monotonic() - t0
    timings["pages_pagerank_dist"] = round(t_pr_dist, 3)
    edges_per_sec_dist = n_edges * pr_iters / t_pr_dist

    # iterations-to-1e-6 convergence (the BASELINE.json metric's second
    # half) — convergence-mode run with the reference's N*tol rule
    stats: dict = {}
    t0 = time.monotonic()
    pagerank(g, alpha=0.85, tol=1e-6, stats_out=stats).write.format("noop").mode(
        "overwrite"
    ).save()
    timings["pages_pagerank_converge"] = round(time.monotonic() - t0, 3)

    # --- reference-scale rows (BASELINE.md: gnm 1e5 n / 1e6 e seed=42,
    # CC 0.30 s / triangles 4.0 s; karate LPA 1.5 ms) -------------------
    import networkx as nxlib
    import pandas as pd

    from linkgraph.graph import LinkGraph
    from linkgraph.operators.components import connected_components
    from linkgraph.operators.label_propagation import label_propagation_communities
    from linkgraph.operators.triangles import all_triangles

    G = nxlib.gnm_random_graph(100_000, 1_000_000, seed=42)
    epd = pd.DataFrame(list(G.edges()), columns=["src", "dst"])
    gnm = LinkGraph(
        vertices=spark.range(100_000).select("id").persist(),
        edges=spark.createDataFrame(epd)
        .select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            F.lit(1.0).alias("weight"),
        )
        .persist(),
        directed=False,
    )
    gnm.edges.count()
    run(
        "gnm1e6_connected_components",
        lambda: connected_components(gnm).agg(F.countDistinct("component")).collect(),
    )
    run("gnm1e6_triangles_total", lambda: all_triangles(gnm).count())
    kar = nxlib.karate_club_graph()
    kg = LinkGraph(
        vertices=spark.range(34).select("id"),
        edges=spark.createDataFrame(
            pd.DataFrame(list(kar.edges()), columns=["src", "dst"])
        ).select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            F.lit(1.0).alias("weight"),
        ),
        directed=False,
    )
    run(
        "lpa_karate",
        lambda: label_propagation_communities(kg).select("label").distinct().count(),
    )
    gnm.vertices.unpersist()
    gnm.edges.unpersist()

    # --- operator sweep (after the headline so its session state cannot
    # skew the BASELINE metric) -----------------------------------------
    for name in [
        "pagerank_orders",
        "cc_nation_chains",
        "triangles_parts",
        "out_degree_orders",
        "doc_stats",
        "doc_lsh_bands",
        "doc_simhash",
        "embedding_topk",
        "doc_dedup_clusters",
        "walks_orders",
        "mis_orders",
        "harmonic_sampled_orders",
        "event_sessions",
        "doc_chunks",
        "doc_decontaminate",
        "doc_repetition",
        "doc_dup_spans",
        "tfidf_topk_docs",
        "doc_c4_signals",
        "doc_dsir_weights",
        "embedding_semantic_dedup",
        "dag_longest_path_orders",
        "salsa_orders",
        "cocitation_orders",
        "dispersion_orders",
        "trustrank_orders",
        # round-3 additions: the *_dist twins pin the distributed
        # CC/LPA/triangles plans; cycles + weighted betweenness are the
        # new operator families
        "cc_nation_chains_dist",
        "triangles_parts_dist",
        "pagerank_orders_dist",
        "salsa_orders_dist",
        "lpa_nation_chains_dist",
        "find_cycle_nations",
        "simple_cycles_orders",
        "betweenness_weighted_orders",
        # round-3 additions (later session): HyperBall sketches, the
        # anchor-text render->parse round-trip, spam mass (PR+TrustRank)
        "hyperball_orders",
        "anchor_profile_orders",
        "spam_mass_orders",
        # round-4 additions: the b=6 packed-register HyperBall twin,
        # the gated-local core decomposition, weighted LPA
        "hyperball_orders_b6",
        "core_number_parts",
        "lpa_weighted_nation_chains",
        # round-5: distributed k-truss now peels with incremental
        # support maintenance (one wedge enumeration total, delta
        # probes per round) — this row evidences the change at 1.2M e
        "ktruss_parts_dist",
    ]:
        run(name, lambda n=name: qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save())

    # serving-refresh pin, bench-sized (r5 sweep hygiene, VERDICT r4
    # wrong-5: the full-size two-epoch fixture is ~44 s and masked
    # sweep regressions at ~19% of total; the sf0.01 fixture exercises
    # the identical two-refresh store-backed plan, while the full-size
    # fixture stays in the driver/selfcheck ORACLE gates unchanged)
    run(
        "incremental_cc_epoch2_sf001",
        lambda: qs["incremental_cc_epoch2"](spark, "/root/testdata/sf0.01")
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )

    # xxhash64 scale lane vs the md5 oracle lane (same banding shape,
    # BIGINT keys, JVM-intrinsic hash — the documented 100 TB swap)
    from linkgraph.functions.dedup import lsh_band_table

    docs_df = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(cpus)
    run(
        "doc_lsh_bands_fast_xxhash64",
        lambda: lsh_band_table(docs_df, hasher="xxhash64")
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )

    canary.__exit__()
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                **{("sweep_" + k): v for k, v in canary.summary().items()},
                "metric": "total wall time, headline queries + pages->extract->edges->pagerank pipeline",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
                "cpus": cpus,
                "pagerank_edges_per_sec_per_superstep": round(edges_per_sec, 1),
                "pagerank_edges_per_sec_per_superstep_dist": round(
                    edges_per_sec_dist, 1
                ),
                "pagerank_iters_to_1e6": stats.get("iterations"),
                "pagerank_final_l1": stats.get("l1_error"),
                "pages_n": pages_n,
                "n_edges": n_edges,
                "pr_iters": pr_iters,
                "probe_gflops_before": probe_before,
                "probe_gflops_after": (probe_after := cpu_probe()),
                "probe_gate_gflops": probe_gate,
                "probe_gate_passed": bool(
                    probe_before >= probe_gate and probe_after >= probe_gate
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
