"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — smoke: PageRank over an edge table derived from
sf0.001. ``queries()`` — one callable per implemented operator;
``oracle_sql()`` — DuckDB-equivalent ANSI SQL for each (omitted only
for genuinely non-SQL-expressible iterative/pipeline ops, which get
the weaker rows-only check).

Graph queries run on edge tables DERIVED DETERMINISTICALLY from the
driver's parquet (so the DuckDB oracle sees the same graph):

* order graph (directed):  src = o_custkey, dst = o_orderkey % |customer|
* nation chains (undirected): consecutive custkeys within a nation
* part co-occurrence (undirected): parts sharing an l_orderkey

Floating-point columns are rounded on BOTH sides (engine math and
oracle math are both double; summation-order differences are ~1e-15).
All cross-engine hashing is md5 (identical hex in Spark and DuckDB).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from linkgraph.graph import LinkGraph
from linkgraph.functions import dedup as ddp
from linkgraph.functions import similarity as sim
from linkgraph.functions import textops as tx
from linkgraph.operators import degrees as deg
from linkgraph.operators import setops
from linkgraph.operators.components import connected_components
from linkgraph.operators.label_propagation import label_propagation_communities
from linkgraph.operators.pagerank import pagerank
from linkgraph.operators.core import core_number, k_core
from linkgraph.operators.hits import hits
from linkgraph.operators.subgraph import induced_subgraph
from linkgraph.operators.traversal import bfs_layers
from linkgraph.operators.triangles import all_triangles, clustering, transitivity, triangles

PR_ITERS = 12
PR_ALPHA = 0.85


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _read_wide(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read + spread across the session's partitions. The test tables
    are single small parquet files (one input split), so a
    compute-heavy narrow chain (md5 per token/shingle, per-dim vector
    math) would otherwise run as ONE task no matter how many cores the
    session has. At production scale the scan has many splits and this
    is a no-op cost-wise; here the tiny shuffle (<1 MB) buys full
    parallelism for the hash/vector work."""
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return _read(spark, sf_dir, name).repartition(n)


# ----------------------------------------------------------------- graphs
def order_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    n = cust.count()
    edges = orders.select(
        F.col("o_custkey").cast("long").alias("src"),
        F.pmod(F.col("o_orderkey"), F.lit(n)).cast("long").alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    vertices = cust.select(F.col("c_custkey").cast("long").alias("id"))
    return LinkGraph(vertices=vertices, edges=edges, directed=True)


def nation_chain_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    cust = _read(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    edges = (
        cust.select(
            F.col("c_custkey").cast("long").alias("src"),
            F.lead("c_custkey").over(w).cast("long").alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .withColumn("weight", F.lit(1.0))
    )
    vertices = cust.select(F.col("c_custkey").cast("long").alias("id"))
    return LinkGraph(vertices=vertices, edges=edges, directed=False)


def part_cooccurrence_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("pa") < F.col("pb"))
        .select(
            F.col("pa").cast("long").alias("src"),
            F.col("pb").cast("long").alias("dst"),
        )
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    vertices = _read(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("long").alias("id")
    )
    return LinkGraph(vertices=vertices, edges=edges, directed=False)


# ---------------------------------------------------------------- queries
def q_pagerank_orders(spark, sf_dir):
    g = order_graph(spark, sf_dir)
    ranks = pagerank(g, alpha=PR_ALPHA, fixed_iter=PR_ITERS)
    return ranks.select("id", F.round("rank", 8).alias("rank_r"))


def q_pagerank_orders_dist(spark, sf_dir):
    """Distributed-plan twin of q_pagerank_orders: local_max_edges=0
    pins the salted CSR-block superstep plan (pagerank.py:364) — the
    plan that actually runs at 100 TB — not the size-gated
    single-Arrow-task numpy kernel (pagerank.py:57)."""
    g = order_graph(spark, sf_dir)
    ranks = pagerank(g, alpha=PR_ALPHA, fixed_iter=PR_ITERS, local_max_edges=0)
    return ranks.select("id", F.round("rank", 8).alias("rank_r"))


def q_cc_nation_chains(spark, sf_dir):
    g = nation_chain_graph(spark, sf_dir)
    return connected_components(g).select("id", "component")


def q_cc_nation_chains_dist(spark, sf_dir):
    """Same output as q_cc_nation_chains but with local_max_edges=0 so
    the driver's hash check pins the DISTRIBUTED superstep plan
    (neighbor-min gather over the salted CSR + pointer jumping,
    components.py:93) — the plan that actually runs at 100 TB — not the
    size-gated single-Arrow-task fast path."""
    g = nation_chain_graph(spark, sf_dir)
    return connected_components(g, local_max_edges=0).select("id", "component")


def q_component_sizes(spark, sf_dir):
    g = nation_chain_graph(spark, sf_dir)
    return (
        connected_components(g)
        .groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


def q_triangles_parts(spark, sf_dir):
    g = part_cooccurrence_graph(spark, sf_dir)
    return triangles(g).select("id", "triangles")


def q_triangles_parts_dist(spark, sf_dir):
    """Distributed-plan twin of q_triangles_parts: local_max_edges=0
    forces the degree-oriented wedge + closing semi-join plan
    (triangles.py:143-198) so CORRECTNESS hash-verifies the O(m^1.5)
    superstep-free distributed shape, not the local fast path."""
    g = part_cooccurrence_graph(spark, sf_dir)
    return triangles(g, local_max_edges=0).select("id", "triangles")


def q_triangle_total_parts(spark, sf_dir):
    g = part_cooccurrence_graph(spark, sf_dir)
    return all_triangles(g).agg(F.count(F.lit(1)).alias("n_triangles"))


def q_transitivity_parts(spark, sf_dir):
    g = part_cooccurrence_graph(spark, sf_dir)
    t = transitivity(g)
    return spark.createDataFrame([(round(t, 8),)], "transitivity_r double")


def q_out_degree_orders(spark, sf_dir):
    g = order_graph(spark, sf_dir)
    return deg.out_degrees(g).select("id", "degree")


def q_degree_histogram_orders(spark, sf_dir):
    g = order_graph(spark, sf_dir)
    return deg.degree_histogram(g).select("degree", "num_nodes")


def q_isolates_parts(spark, sf_dir):
    g = part_cooccurrence_graph(spark, sf_dir)
    return deg.isolates(g).select("id")


def q_selfloops_orders(spark, sf_dir):
    g = order_graph(spark, sf_dir)
    return (
        g.edges.where(F.col("src") == F.col("dst"))
        .agg(F.count(F.lit(1)).alias("n_selfloops"))
    )


def q_density_orders(spark, sf_dir):
    g = order_graph(spark, sf_dir)
    return spark.createDataFrame(
        [(round(deg.density(g), 10),)], "density_r double"
    )


def q_mutual_edges_orders(spark, sf_dir):
    g = order_graph(spark, sf_dir)
    return setops.intersection(g, g.reverse()).edges.select("src", "dst")


def q_oneway_edges_orders(spark, sf_dir):
    g = order_graph(spark, sf_dir)
    return setops.difference(g, g.reverse()).edges.select("src", "dst")


def q_compose_orders(spark, sf_dir):
    g = order_graph(spark, sf_dir)
    gd = LinkGraph(
        vertices=g.vertices,
        edges=g.edges.select("src", "dst").distinct().withColumn("weight", F.lit(1.0)),
        directed=True,
    )
    return setops.compose(gd, gd.reverse()).edges.select("src", "dst")


def q_subgraph_high_balance(spark, sf_dir):
    g = order_graph(spark, sf_dir)
    rich = (
        _read(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").cast("long").alias("id"))
    )
    return induced_subgraph(g, rich).edges.select("src", "dst")


def q_hits_orders(spark, sf_dir):
    g = order_graph(spark, sf_dir)
    out = hits(g, fixed_iter=8)
    return out.select(
        "id", F.round("hub", 8).alias("hub_r"), F.round("authority", 8).alias("auth_r")
    )


def q_hits_orders_dist(spark, sf_dir):
    """Distributed-plan twin: local_max_edges=0 pins the persisted-CSR
    double-gather superstep plan (hits.py) — the 100 TB path — not the
    size-gated single-task numpy kernel."""
    g = order_graph(spark, sf_dir)
    out = hits(g, fixed_iter=8, local_max_edges=0)
    return out.select(
        "id", F.round("hub", 8).alias("hub_r"), F.round("authority", 8).alias("auth_r")
    )


def q_clustering_parts(spark, sf_dir):
    g = part_cooccurrence_graph(spark, sf_dir)
    return clustering(g).select("id", F.round("clustering", 8).alias("clustering_r"))


def q_bfs_layers_orders(spark, sf_dir):
    g = order_graph(spark, sf_dir)
    return bfs_layers(g, [1]).select("id", F.col("layer").cast("long").alias("layer"))


# ------------------------------------------------------- documents / text
def q_doc_exact_dedup(spark, sf_dir):
    docs = _read_wide(spark, sf_dir, "documents")
    return ddp.exact_dedup_groups(docs).select("text_hash", "keep_id", "n_dups")


def q_doc_dup_spans(spark, sf_dir):
    """Per-doc duplicated-span fraction (Lee et al. 2022 substring
    dedup at fixed 4-token span granularity; dedup.duplicated_span_stats)."""
    docs = _read_wide(spark, sf_dir, "documents")
    return ddp.duplicated_span_stats(docs, n=4, stride=4)


def q_doc_span_dedup(spark, sf_dir):
    """Span-deduplicated corpus: repeated 4-token spans removed except
    the globally first occurrence (dedup.drop_duplicated_spans)."""
    docs = _read_wide(spark, sf_dir, "documents")
    return ddp.drop_duplicated_spans(docs, n=4, stride=4)


def q_doc_stats(spark, sf_dir):
    docs = _read_wide(spark, sf_dir, "documents")
    s = tx.text_stats(docs)
    return s.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        F.round("alpha_ratio", 8).alias("alpha_ratio_r"),
        F.round("digit_ratio", 8).alias("digit_ratio_r"),
        F.round("space_ratio", 8).alias("space_ratio_r"),
        F.round("mean_token_len", 8).alias("mean_token_len_r"),
        "pred_lang",
        "fingerprint",
    )


def q_doc_lang_counts(spark, sf_dir):
    docs = _read_wide(spark, sf_dir, "documents")
    return (
        docs.select(tx.lang_id(F.col("text")).alias("pred_lang"))
        .groupBy("pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q_doc_lsh_bands(spark, sf_dir):
    docs = _read_wide(spark, sf_dir, "documents")
    return ddp.lsh_band_table(
        docs, num_bands=4, rows_per_band=2, shingle_n=3
    ).select("id", "band", "key")


def q_doc_near_dup_jaccard(spark, sf_dir):
    docs = _read_wide(spark, sf_dir, "documents")
    cand = ddp.minhash_candidate_pairs(docs, num_bands=4, rows_per_band=2, shingle_n=3)
    return ddp.jaccard_pairs(docs, cand).select(
        "id_a", "id_b", F.round("jaccard", 8).alias("jaccard_r")
    )


def q_doc_dedup_clusters(spark, sf_dir):
    """Transitive near-dup clusters (dedup.py ``near_dup_clusters``):
    LSH-verified Jaccard≥0.8 pairs → undirected connected components →
    (doc_id, cluster = min doc_id, is_survivor)."""
    docs = _read_wide(spark, sf_dir, "documents")
    return ddp.near_dup_clusters(
        docs, threshold=0.8, num_bands=4, rows_per_band=2, shingle_n=3
    )


def q_doc_training_mix(spark, sf_dir):
    """End-to-end curation pipeline (pipeline.py ``training_mix``):
    quality gates + language whitelist + near-dup survivorship in one
    composed plan — the kept set a tokenizer run would consume."""
    from linkgraph.functions.pipeline import training_mix

    docs = _read_wide(spark, sf_dir, "documents")
    return training_mix(
        docs,
        min_tokens=10,
        min_alpha_ratio=0.5,
        max_digit_ratio=0.3,
        langs=("de", "en", "es", "fr"),
        dedup_threshold=0.8,
        num_bands=4,
        rows_per_band=2,
        shingle_n=3,
    )


def q_doc_simhash(spark, sf_dir):
    docs = _read_wide(spark, sf_dir, "documents")
    sh = tx.simhash_table(docs).withColumnRenamed("simhash", "sh")
    mask = F.lit(0xFFFFFFFF).cast("long")
    return sh.select(
        "doc_id",
        F.shiftright(F.col("sh"), 32).bitwiseAND(mask).alias("simhash_hi"),
        F.col("sh").bitwiseAND(mask).alias("simhash_lo"),
    )


def q_embedding_topk(spark, sf_dir):
    emb = _read_wide(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 8)
    top = sim.cosine_topk(emb, queries, k=10, round_to=6)
    return top.select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("rnk")
    )


def q_embedding_quantized_topk(spark, sf_dir):
    """int8-quantized exact cosine top-k — the 4x-smaller-corpus ANN
    lane; ranks only (scores are quantization-dependent by design)."""
    from linkgraph.functions.similarity import (
        quantize_embeddings,
        quantized_cosine_topk,
    )

    emb = _read_wide(spark, sf_dir, "embeddings")
    q = quantize_embeddings(emb)
    top = quantized_cosine_topk(q, q.where(F.col("vec_id") < 8), k=10)
    return top.select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("rnk")
    )


def q_event_type_stats(spark, sf_dir):
    ev = _read(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value_r"),
        F.countDistinct("user_id").alias("n_users"),
    )


# -------------------------------------------- non-SQL-expressible (rows-only)
def q_lpa_nation_chains(spark, sf_dir):
    """Semi-synchronous LPA communities. Deterministic (JP coloring
    with xxhash64 priorities + ordered color-class sweeps) but not
    SQL-expressible — xxhash64 has no DuckDB twin and the sweep count
    is data-dependent, so this stays a rows-only check; label
    correctness (valid fixpoint, exact community sets on the reference
    fixtures L1-L4 + karate) is pytest-verified against live
    networkx (tests/test_label_propagation.py)."""
    g = nation_chain_graph(spark, sf_dir)
    return label_propagation_communities(g).select("id", "label")


def _two_epoch_refresh(spark, sf_dir, name, mod, chain, refresh, state_sub):
    """Shared two-epoch serving fixture behind every
    q_incremental_*_epoch2 entry: epoch 1 renders the pages of
    customers with custkey % mod != 0 (links to un-crawled pages drop
    at graph build), ingests them ONCE into the append-only edge store
    (streaming/incremental.py ``ingest_pages`` — the r5 O(Δ) shape:
    HTML extraction runs exactly once per page, a refresh reads only
    the store) and runs one COLD refresh; epoch 2 ingests the
    remaining pages and runs the WARM refresh, whose serving table is
    returned. ``chain=True`` uses the nation-chain edges, else the
    order graph; ``refresh(store_path, state_path)`` runs one serving
    refresh and returns its table. Keeping this in ONE place keeps all
    five entries in lockstep with their SQL oracles — which pin that
    the store-built graph is bit-identical to whole-crawl
    re-extraction."""
    import os
    import shutil

    from linkgraph.sources.corpus import pages_from_edges
    from linkgraph.streaming.incremental import ingest_pages

    # PID-suffixed scratch (ADVICE r4): two drivers running the same
    # entry query on one host must not corrupt each other's page/state
    # tables; rmtree still resets state for re-runs within one driver
    base = f"/tmp/lg_entry_{name}_{os.getpid()}"
    shutil.rmtree(base, ignore_errors=True)
    pages_path, state_path = base + "/pages", base + "/" + state_sub
    store_path = base + "/store"
    cust = _read(spark, sf_dir, "customer")
    if chain:
        w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
        edges = (
            cust.select(
                F.col("c_custkey").alias("skey"),
                F.lead("c_custkey").over(w).alias("dkey"),
            )
            .where(F.col("dkey").isNotNull())
            .select(
                F.col("skey").cast("string").alias("src_name"),
                F.col("dkey").cast("string").alias("dst_name"),
                "skey",
            )
        )
    else:
        orders = _read(spark, sf_dir, "orders")
        n = cust.count()
        edges = orders.select(
            F.col("o_custkey").cast("string").alias("src_name"),
            F.pmod(F.col("o_orderkey"), F.lit(n)).cast("string").alias("dst_name"),
            F.col("o_custkey").alias("skey"),
        )
    verts = cust.select(
        F.col("c_custkey").cast("string").alias("name"),
        F.col("c_custkey").alias("key"),
    )
    v1 = verts.where(F.pmod(F.col("key"), F.lit(mod)) != 0).select("name")
    v2 = verts.where(F.pmod(F.col("key"), F.lit(mod)) == 0).select("name")
    e1 = edges.where(F.pmod(F.col("skey"), F.lit(mod)) != 0).select(
        "src_name", "dst_name"
    )
    e2 = edges.where(F.pmod(F.col("skey"), F.lit(mod)) == 0).select(
        "src_name", "dst_name"
    )
    # each batch is written then ingested FROM ITS OWN parquet drop —
    # extraction touches every page exactly once across both epochs
    p1, p2 = pages_path + "/b1", pages_path + "/b2"
    pages_from_edges(v1, e1, name=name).write.mode("overwrite").parquet(p1)
    ingest_pages(spark, spark.read.parquet(p1), store_path)
    refresh(store_path, state_path)
    pages_from_edges(v2, e2, name=name).write.mode("overwrite").parquet(p2)
    ingest_pages(spark, spark.read.parquet(p2), store_path)
    return refresh(store_path, state_path)


def q_incremental_pagerank_epoch2(spark, sf_dir):
    """Two-epoch incremental PageRank serving
    (streaming/incremental.py ``refresh_ranks``): epoch 1 crawls the
    order-graph pages of customers with custkey % 4 != 0 and converges
    a cold serving table (fixed_iter=5); epoch 2 appends the remaining
    pages and refreshes WARM-STARTED from the epoch-1 table (url-keyed
    nstart, renormalized, new urls at mass 0 —
    pagerank_alg.py:139-154 semantics). The oracle replays BOTH phases
    in SQL — unrolled epoch-1 iterations seed the unrolled epoch-2
    iterations through the same coalesce-0/renormalize step — so the
    warm-start plumbing itself (url seeding, renormalization, new-page
    zero mass) is what the hash verifies, not just the final graph."""
    from linkgraph.streaming.incremental import refresh_ranks

    serving = _two_epoch_refresh(
        spark, sf_dir, "incrpr", 4, False,
        lambda p, s: refresh_ranks(spark, None, s, store_path=p, fixed_iter=5), "ranks",
    )
    return serving.select("url", F.round("rank", 8).alias("rank_r"))


def q_incremental_cc_epoch2(spark, sf_dir):
    """Two-epoch incremental connected-components serving
    (streaming/incremental.py ``refresh_components``): epoch 1 crawls
    the nation-chain pages of customers with custkey % 5 != 0 (chains
    split into segments where the missing pages break them), epoch 2
    appends the rest and refreshes warm-started from the epoch-1
    serving table. Under appends the warm fixpoint is BIT-IDENTICAL to
    a cold run (labels_start contract), so the oracle is simply the
    full graph's components: per nation, every chain page maps to the
    lexicographically-min url (dense ids are assigned in url sort
    order, graph.py assign_dense_ids). This entry run at sf0.1 is what
    exposed the round-4 distributed-CC non-convergence bug."""
    from linkgraph.streaming.incremental import refresh_components

    serving = _two_epoch_refresh(
        spark, sf_dir, "incrcc", 5, True,
        lambda p, s: refresh_components(spark, None, s, store_path=p), "labels",
    )
    return serving.select("url", "component_url")


def q_incremental_triangles_epoch2(spark, sf_dir):
    """Two-epoch incremental TRIANGLE-COUNT serving
    (streaming/incremental.py ``refresh_triangles``): epoch 1 builds
    the full per-url counts cold; epoch 2 appends the remaining pages
    and refreshes via the Δ-edge common-neighbor probe (every gained
    triangle contains ≥1 new edge under appends), adding corner deltas
    onto the stored counts. Per-url triangle counts are EXACT and the
    warm result equals a cold recount, so the oracle is the plain
    per-node triangle count of the full undirected order graph."""
    from linkgraph.streaming.incremental import refresh_triangles

    stats: dict = {}
    serving = _two_epoch_refresh(
        spark, sf_dir, "incrtri", 4, False,
        lambda p, s: refresh_triangles(spark, None, s, store_path=p, stats_out=stats), "tri",
    )
    assert stats.get("mode") == "delta", stats  # the path under test
    return serving.select(
        "url", F.col("triangles").cast("long").alias("n_tri")
    )


def q_incremental_reach_epoch2(spark, sf_dir):
    """Two-epoch incremental HyperBall-REACH serving
    (streaming/incremental.py ``refresh_reach``): epoch 1 sketches the
    custkey%4!=0 crawl cold (b=4, 4 supersteps, registers hashed from
    the URL — the rebuild-stable key that makes warm sketches valid
    lower bounds); epoch 2 appends the rest and refreshes warm-started
    from the stored url-keyed registers. The oracle replays BOTH phases
    in exact integer SQL (per-register GREATEST warm merge between two
    unrolled superstep chains), so the url-hash init, the warm lattice
    merge and the packed-wire superstep all hash-verify together. The
    float reach_est column (libm ln) is excluded, as everywhere."""
    from linkgraph.streaming.incremental import refresh_reach

    serving = _two_epoch_refresh(
        spark, sf_dir, "incrreach", 4, False,
        lambda p, s: refresh_reach(spark, None, s, store_path=p, b=4, max_t=4), "reach",
    )
    reg_sum = sum((F.col(f"r{i}") for i in range(16)), F.lit(0))
    return serving.select(
        "url", *[f"r{i}" for i in range(16)], reg_sum.cast("int").alias("reg_sum")
    )


def q_incremental_communities_epoch2(spark, sf_dir):
    """Two-epoch incremental LPA serving
    (streaming/incremental.py ``refresh_communities``): epoch 1 labels
    the partial nation-chain crawl, epoch 2 appends the rest and
    refreshes warm-started (warmup_rounds=0 — only disturbed
    neighborhoods re-label). Rows-only like every LPA entry, and an
    exact SQL pin is IMPOSSIBLE here, not merely inconvenient (r5
    investigation, VERDICT r4 next-round 6): on a chain of n nodes
    the valid Prec-Max fixpoints are EXACTLY the partitions into
    contiguous runs of length >= 2 — a singleton interior/end node's
    sole-or-both neighbors outvote it, so singletons only survive as
    isolates — giving Fibonacci-many (compositions of n into parts
    >= 2) alternative truths per chain; which one the engine lands on
    is decided by the xxhash64 sweep schedule, which DuckDB cannot
    replay. The committed membership check
    (tests/test_incremental.py::test_incremental_communities_entry_membership)
    asserts the serving table IS one of those valid segmentations
    (contiguous runs >= 2 per nation chain) — strictly stronger than
    rows-only — plus the usual fixpoint/stability contract tests."""
    from linkgraph.streaming.incremental import refresh_communities

    serving = _two_epoch_refresh(
        spark, sf_dir, "incrlpa", 5, True,
        lambda p, s: refresh_communities(spark, None, s, store_path=p), "labels",
    )
    return serving.select("url", "label_url")


def q_lpa_weighted_nation_chains(spark, sf_dir):
    """Weighted LPA (label_propagation.py ``weight=`` — reference
    community/label_propagation.py:216, asyn_lpa weight semantics):
    chain edges get deterministic integer weights 1-5, so heavy edges
    outvote unit edges and the converged segmentation differs from the
    unweighted run. Rows-only for the same reason as its siblings
    (xxhash64 sweep priorities have no DuckDB twin); the weighted
    fixpoint contract is pytest-verified
    (tests/test_label_propagation.py weighted suite)."""
    from linkgraph.graph import LinkGraph

    g = nation_chain_graph(spark, sf_dir)
    edges = g.edges.withColumn(
        "weight", (F.pmod(F.col("src") + F.col("dst"), F.lit(5)) + 1).cast("double")
    )
    gw = LinkGraph(vertices=g.vertices, edges=edges, directed=False)
    return label_propagation_communities(gw, weight="weight").select("id", "label")


def q_find_cycle_nations(spark, sf_dir):
    """Deterministic cycle witness (cycles.py find_cycle analog,
    networkx/algorithms/cycles.py:93) on the directed 25-nation ring:
    anchor = min cycle vertex (0), witness = the ring itself, emitted
    as (pos, src, dst) edges."""
    from linkgraph.operators.cycles import find_cycle

    g = nation_ring_graph(spark, sf_dir, closed=True, directed=True)
    return find_cycle(g).select("pos", "src", "dst")


def q_find_cycle_nations_dist(spark, sf_dir):
    """Distributed-plan twin: local_max_edges=0 pins the SCC + BFS
    tree + pointer-doubling witness composition."""
    from linkgraph.operators.cycles import find_cycle

    g = nation_ring_graph(spark, sf_dir, closed=True, directed=True)
    return find_cycle(g, local_max_edges=0).select("pos", "src", "dst")


def q_simple_cycles_orders(spark, sf_dir):
    """Bounded simple-cycle enumeration (cycles.py:180 with
    length_bound) over the directed order graph — the link-spam-loop
    workload: every self-loop, reciprocal pair, and 3-cycle, each in
    canonical min-first rotation."""
    from linkgraph.operators.cycles import simple_cycles

    g = order_graph(spark, sf_dir)
    return simple_cycles(g, length_bound=3).select("cycle", "k")


def q_girth_parts(spark, sf_dir):
    """Girth (shortest undirected cycle, reference cycles.py girth)
    of the part co-occurrence graph, bounded search to length 4 —
    co-purchase graphs are triangle-dense so the expected answer is
    3; the oracle mirrors the k=3/k=4 existence checks exactly."""
    from linkgraph.operators.cycles import girth

    g = part_cooccurrence_graph(spark, sf_dir)
    v = girth(g, length_bound=4)
    return spark.createDataFrame([(float(v),)], "girth double")


def q_lpa_nation_chains_dist(spark, sf_dir):
    """Distributed-plan twin of q_lpa_nation_chains: local_max_edges=0
    forces the JP-colored semi-synchronous superstep plan
    (label_propagation.py:195,231-303) that runs at scale. Rows-only
    for the same reason as the local twin (xxhash64 priorities have no
    DuckDB twin); the two paths use different deterministic update
    schedules so may converge to different VALID labelings — both are
    pytest-verified Prec-Max fixpoints with exact community sets on
    the reference fixtures (tests/test_label_propagation.py)."""
    g = nation_chain_graph(spark, sf_dir)
    return label_propagation_communities(g, local_max_edges=0).select(
        "id", "label"
    )


def q_media_image_features(spark, sf_dir):
    """Image features from REAL zero-dependency codecs over the
    deterministic mixed-container media fixture: every 2nd image is
    baseline JPEG (alternating 4:4:4 / 4:2:0, decoded by the
    pure-numpy T.81 decoder in functions/jpeg.py), the rest binary
    PPM. Rows-only by necessity — DuckDB has no image codecs, so no
    SQL can recompute pixel statistics; the codecs themselves are
    round-trip- and spec-structure-verified in tests/test_jpeg.py."""
    from linkgraph.functions.multimodal import image_features, synthetic_media

    media = synthetic_media(spark, n=96, partitions=8, jpeg_every=2)
    feats = image_features(media)
    return feats.select(
        "media_id",
        "width",
        "height",
        "channels",
        "n_bytes",
        F.round(F.element_at("embedding", 1), 6).alias("emb0_r"),
        F.round(F.element_at("embedding", 7), 6).alias("emb6_r"),
    )


def q_louvain_parts(spark, sf_dir):
    """Greedy-modularity (Louvain) communities of the part
    co-occurrence graph. Deterministic (ascending-id sweeps, no RNG)
    but not SQL-expressible — rows-only check; quality/invariants are
    pytest-verified against nx.community.louvain_communities."""
    from linkgraph.operators.louvain import louvain_communities

    g = part_cooccurrence_graph(spark, sf_dir)
    return louvain_communities(g).select("id", "community")


def q_greedy_modularity_chains(spark, sf_dir):
    """Clauset-Newman-Moore greedy modularity communities (r5;
    reference community/modularity_max.py) of the nation-chain graph,
    community = min member id. Deterministic (largest-dQ merge,
    smallest-(u, v) tie-break — no RNG anywhere) but the heap-driven
    merge schedule is not SQL-replayable, so rows-only like the other
    community entries; exact nx-verbatim parity (karate, weighted,
    cutoff/best_n) is pytest-verified in tests/test_louvain.py."""
    from linkgraph.operators.louvain import greedy_modularity_communities

    g = nation_chain_graph(spark, sf_dir)
    return greedy_modularity_communities(g).select("id", "community")


def q_pages_pipeline_pagerank(spark, sf_dir):
    """Full mandated pipeline: pages in the input_hint schema ->
    vectorized extraction UDF -> edge table -> PageRank.

    The pages are rendered distributedly from the orders parquet edge
    list (one <a href> per order row, one page per customer), so a
    DuckDB oracle can derive the identical graph straight from the
    parquet tables — the extraction round-trip (render html -> parse
    hrefs back out) is exactly what the oracle cross-checks. Links to
    uncrawled urls (o_orderkey % n == 0, no such customer page) are
    dropped by graph_from_pages, matching the oracle's dst filter."""
    from linkgraph.graph import graph_from_pages
    from linkgraph.sources.corpus import pages_from_edges

    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    n = cust.count()
    verts = cust.select(F.col("c_custkey").cast("string").alias("name"))
    edges = orders.select(
        F.col("o_custkey").cast("string").alias("src_name"),
        F.pmod(F.col("o_orderkey"), F.lit(n)).cast("string").alias("dst_name"),
    )
    pages = pages_from_edges(verts, edges, name="ord")
    g = graph_from_pages(pages, directed=True)
    ranks = pagerank(g, alpha=PR_ALPHA, fixed_iter=5)
    return ranks.join(g.vertices, "id").select(
        "url", F.round("rank", 8).alias("rank_r")
    )


def q_anchor_profile_orders(spark, sf_dir):
    """Anchor-text profiles per target page (extract.py
    ``anchors_from_pages`` + ``anchor_text_profile``): pages rendered
    distributedly from the orders edge list with o_orderpriority as
    each link's anchor text, parsed back by the vectorized anchor UDF,
    then aggregated per dst — the classic in-link anchor-text signal
    search indexers attach to the TARGET document. The oracle derives
    the identical profile straight from the parquet tables, so the
    render→parse round-trip is what gets cross-checked."""
    from linkgraph.sources.corpus import pages_from_edges
    from linkgraph.sources.extract import anchor_text_profile, anchors_from_pages

    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    n = cust.count()
    verts = cust.select(F.col("c_custkey").cast("string").alias("name"))
    edges = orders.select(
        F.col("o_custkey").cast("string").alias("src_name"),
        F.pmod(F.col("o_orderkey"), F.lit(n)).cast("string").alias("dst_name"),
        F.col("o_orderpriority").alias("anchor_name"),
    )
    pages = pages_from_edges(verts, edges, name="ord", anchor_col="anchor_name")
    return anchor_text_profile(anchors_from_pages(pages)).select(
        "dst_url", "n_inlinks", "n_unique_anchors", "top_anchor", "top_anchor_n"
    )


def q_scc_orders(spark, sf_dir):
    from linkgraph.operators.strongly_connected import strongly_connected_components

    g = order_graph(spark, sf_dir)
    return strongly_connected_components(g).select("id", "component")


def q_flow_hierarchy_orders(spark, sf_dir):
    """Luo–Magee flow hierarchy of the order graph (fraction of edges
    outside any cycle; hierarchy.py:10). Edges deduped to match the
    oracle's DISTINCT edge CTE."""
    from linkgraph.operators.strongly_connected import flow_hierarchy_df

    g = order_graph(spark, sf_dir)
    g2 = LinkGraph(
        vertices=g.vertices,
        edges=g.edges.select("src", "dst")
        .distinct()
        .withColumn("weight", F.lit(1.0)),
        directed=True,
    )
    return flow_hierarchy_df(g2)


def q_wl_hashes_chains(spark, sf_dir):
    """Weisfeiler-Lehman subgraph hashes (2 iterations, md5 lane) on
    the undirected nation-chain graph (graph_hashing.py)."""
    from linkgraph.operators.graph_hashing import wl_subgraph_hashes

    g = nation_chain_graph(spark, sf_dir)
    return wl_subgraph_hashes(g, iterations=2).select(
        "id", F.col("iteration").cast("long").alias("iteration"), "label"
    )


def q_node_class_chains(spark, sf_dir):
    """Zhu harmonic-function label spreading on the nation-chain
    graph; seeds = every 10th customer labeled by market segment.
    Chain degrees are 1/2, so every mass is a dyadic rational —
    bit-exact across engines (node_classification.py)."""
    from linkgraph.operators.node_classification import harmonic_function

    g = nation_chain_graph(spark, sf_dir)
    cust = _read(spark, sf_dir, "customer")
    seeds = cust.where(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").cast("long").alias("id"),
        F.col("c_mktsegment").alias("label"),
    )
    return harmonic_function(g, seeds, max_iter=6)


def _harmonic_sql(iters: int = 6) -> str:
    """Unrolled harmonic-function oracle on the nation-chain graph
    (same device as _pagerank_sql): f1 = seed one-hot block, then
    ``iters - 1`` spread CTEs — seeds clamped, unlabeled rows =
    degree-normalized neighbor sums."""
    ctes = []
    for k in range(2, iters + 1):
        ctes.append(f"""f{k} AS (
  SELECT id, lid, mass FROM sl1
  UNION ALL
  SELECT e.src AS id, f.lid, sum(f.mass / d.deg) AS mass
  FROM e JOIN f{k - 1} f ON f.id = e.dst JOIN d ON d.id = e.src
  WHERE e.src NOT IN (SELECT id FROM sl)
  GROUP BY e.src, f.lid
)""")
    spread_ctes = ",\n".join(ctes)
    return f"""
WITH ch AS (
  SELECT c_custkey AS src,
         lead(c_custkey) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS dst
  FROM customer
),
e0 AS (SELECT src, dst FROM ch WHERE dst IS NOT NULL),
e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
v AS (SELECT c_custkey AS id FROM customer),
d AS (
  SELECT v.id,
         CASE WHEN coalesce(dd.s, 0) = 0 THEN 1.0 ELSE dd.s END AS deg
  FROM v LEFT JOIN (SELECT src AS id, sum(1.0) AS s FROM e GROUP BY src) dd
    ON dd.id = v.id
),
seeds AS (
  SELECT c_custkey AS id, c_mktsegment AS label
  FROM customer WHERE c_custkey % 10 = 0
),
ldict AS (
  SELECT label, row_number() OVER (ORDER BY min(id), label) - 1 AS lid
  FROM seeds GROUP BY label
),
sl AS (SELECT s.id, l.lid FROM seeds s JOIN ldict l ON l.label = s.label),
sl1 AS (SELECT id, lid, CAST(1.0 AS DOUBLE) AS mass FROM sl),
f1 AS (SELECT * FROM sl1),
{spread_ctes},
ranked AS (
  SELECT id, lid,
         row_number() OVER (PARTITION BY id ORDER BY round(mass, 9) DESC, lid ASC) AS rn
  FROM f{iters}
)
SELECT v.id, l.label
FROM v
LEFT JOIN ranked b ON b.id = v.id AND b.rn = 1
JOIN ldict l ON l.lid = coalesce(b.lid, 0)"""


def q_simrank_chains(spark, sf_dir):
    """Four SimRank iterations on the undirected nation-chain graph
    (operators/simrank.py); off-diagonal pairs with sim > 0, a < b
    (the table is symmetric)."""
    from linkgraph.operators.simrank import simrank_similarity

    g = nation_chain_graph(spark, sf_dir)
    s = simrank_similarity(g, max_iter=4)
    # +1e-12 before rounding: four iterations of 0.9^k over dyadic
    # chain degrees give FINITE decimal expansions that can land
    # exactly on a half boundary of the 9th decimal (e.g.
    # 0.1588359375); the nudge resolves the tie identically in both
    # engines while double noise stays ~1e-16
    return s.where(F.col("a") < F.col("b")).select(
        "a", "b", F.round(F.col("sim") + F.lit(1e-12), 9).alias("sim_r")
    )


def _simrank_sql(iters: int = 4, c: float = 0.9) -> str:
    """Unrolled SimRank on the nation-chain graph: s0 = identity, each
    step = diagonal UNION ALL the C/(din·din')-scaled two-hop spread
    (mirror of operators/simrank.py one iteration)."""
    ctes = []
    for k in range(1, iters + 1):
        ctes.append(f"""s{k} AS MATERIALIZED (
  SELECT id AS a, id AS b, CAST(1.0 AS DOUBLE) AS sim FROM v
  UNION ALL
  SELECT ea.dst AS a, eb.dst AS b,
         {c} * sum(s.sim) / (max(da.din) * max(db.din)) AS sim
  FROM s{k - 1} s
  JOIN e ea ON ea.src = s.a
  JOIN e eb ON eb.src = s.b
  JOIN d da ON da.id = ea.dst
  JOIN d db ON db.id = eb.dst
  WHERE ea.dst <> eb.dst
  GROUP BY ea.dst, eb.dst
)""")
    spread_ctes = ",\n".join(ctes)
    return f"""
WITH ch AS (
  SELECT c_custkey AS src,
         lead(c_custkey) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS dst
  FROM customer
),
e0 AS (SELECT src, dst FROM ch WHERE dst IS NOT NULL),
e AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
v AS MATERIALIZED (SELECT c_custkey AS id FROM customer),
d AS MATERIALIZED (SELECT dst AS id, count(*) AS din FROM e GROUP BY dst),
s0 AS (SELECT id AS a, id AS b, CAST(1.0 AS DOUBLE) AS sim FROM v),
{spread_ctes}
SELECT a, b, round(sim + 1e-12, 9) AS sim_r FROM s{iters} WHERE a < b"""


def q_lca_orders(spark, sf_dir):
    """Deterministic lowest common ancestors on the DAG restriction
    (src < dst) of the order graph, for 15 fixed customer pairs
    (operators/dag.py lowest_common_ancestors)."""
    from linkgraph.operators.dag import lowest_common_ancestors

    g = order_graph(spark, sf_dir)
    dag = LinkGraph(
        vertices=g.vertices,
        edges=g.edges.where(F.col("src") < F.col("dst")),
        directed=True,
    )
    n = g.vertices.count()
    cust = _read(spark, sf_dir, "customer")
    pairs = cust.where(F.col("c_custkey") % 100 == 0).select(
        F.col("c_custkey").cast("long").alias("u"),
        ((F.col("c_custkey") * 3) % n + 1).cast("long").alias("v"),
    )
    return lowest_common_ancestors(dag, pairs)


_LCA_SQL = """
WITH RECURSIVE nn AS MATERIALIZED (SELECT count(*) AS n FROM customer),
e AS MATERIALIZED (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
         CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT) AS dst
  FROM orders
  WHERE o_custkey < o_orderkey % (SELECT n FROM nn)
),
lp(id, len) AS (
  SELECT CAST(c_custkey AS BIGINT), 0 FROM customer
  UNION
  SELECT e.dst, lp.len + 1 FROM lp JOIN e ON e.src = lp.id
),
gen AS MATERIALIZED (SELECT id, max(len) AS generation FROM lp GROUP BY id),
qp AS MATERIALIZED (
  SELECT CAST(c_custkey AS BIGINT) AS u,
         CAST((c_custkey * 3) % (SELECT n FROM nn) + 1 AS BIGINT) AS v
  FROM customer WHERE c_custkey % 100 = 0
),
qn AS MATERIALIZED (SELECT u AS q FROM qp UNION SELECT v FROM qp),
anc(q, a) AS (
  SELECT q, q FROM qn
  UNION
  SELECT anc.q, e.src FROM anc JOIN e ON e.dst = anc.a
),
cand AS (
  SELECT qp.u, qp.v, au.a, gen.generation
  FROM qp
  JOIN anc au ON au.q = qp.u
  JOIN anc av ON av.q = qp.v AND av.a = au.a
  JOIN gen ON gen.id = au.a
),
ranked AS (
  SELECT u, v, a,
         row_number() OVER (PARTITION BY u, v
                            ORDER BY generation DESC, a ASC) AS rn
  FROM cand
)
SELECT u, v, a AS lca FROM ranked WHERE rn = 1"""


def q_trophic_orders(spark, sf_dir):
    """Trophic levels on the DAG restriction (src < dst) of the order
    graph — acyclic, so the Jacobi fixpoint is exact after depth
    supersteps (operators/trophic.py)."""
    from linkgraph.operators.trophic import trophic_levels

    g = order_graph(spark, sf_dir)
    dag = LinkGraph(
        vertices=g.vertices,
        edges=g.edges.where(F.col("src") < F.col("dst")),
        directed=True,
    )
    lv = trophic_levels(dag, max_iter=60)
    return lv.select(
        "id", F.round(F.col("level") + F.lit(1e-12), 8).alias("level_r")
    )


def _trophic_sql(iters: int = 30) -> str:
    """Unrolled Jacobi t = 1 + P·t on the order-DAG (depth 25 at
    sf0.01, so ``iters`` = 30 reaches the exact fixpoint); levels =
    t + 1 for non-basal nodes, 1 for basal — mirror of
    operators/trophic.py."""
    ctes = []
    for k in range(1, iters + 1):
        ctes.append(f"""t{k} AS MATERIALIZED (
  SELECT r.id, 1.0 + COALESCE(g.v, 0.0) AS t
  FROM rs r LEFT JOIN (
    SELECT p.id, sum(p.p * t.t) AS v
    FROM p JOIN t{k - 1} t ON t.id = p.prey GROUP BY p.id
  ) g ON g.id = r.id
)""")
    spread_ctes = ",\n".join(ctes)
    return f"""
WITH nn AS MATERIALIZED (SELECT count(*) AS n FROM customer),
e AS MATERIALIZED (
  SELECT CAST(o_custkey AS BIGINT) AS src,
         CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT) AS dst
  FROM orders
  WHERE o_custkey < o_orderkey % (SELECT n FROM nn)
),
ew AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM e GROUP BY src, dst),
rs AS MATERIALIZED (SELECT dst AS id, sum(w) AS s FROM ew GROUP BY dst),
p AS MATERIALIZED (
  SELECT ew.dst AS id, ew.src AS prey, ew.w / rs.s AS p
  FROM ew JOIN rs ON rs.id = ew.dst
  WHERE ew.src IN (SELECT id FROM rs)
),
t0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS t FROM rs),
{spread_ctes}
SELECT c.c_custkey AS id,
       round(CASE WHEN t.id IS NULL THEN 1.0 ELSE t.t + 1.0 END + 1e-12, 8) AS level_r
FROM customer c LEFT JOIN t{iters} t ON t.id = c.c_custkey"""


def q_mst_custlattice(spark, sf_dir):
    """Borůvka minimum spanning forest on a 400-node customer lattice
    (edges (u, u+d), d = 1..4) with deterministic ALL-DISTINCT weights
    — the MSF is therefore unique, so the oracle can verify it by the
    cycle property (an edge is in the MSF iff its endpoints are NOT
    connected using strictly lighter edges)."""
    from linkgraph.operators.mst import minimum_spanning_forest

    cust = _read(spark, sf_dir, "customer").where(F.col("c_custkey") <= 400)
    ids = cust.select(F.col("c_custkey").cast("long").alias("id"))
    base = ids.select(
        "id", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3), F.lit(4))).alias("d")
    )
    edges = (
        base.where(F.col("id") + F.col("d") <= 400)
        .select(
            F.col("id").alias("src"),
            (F.col("id") + F.col("d")).cast("long").alias("dst"),
            (
                ((F.col("id") * 131 + F.col("d") * 77) % 97).cast("double")
                + F.col("id") / F.lit(1000000.0)
                + F.col("d") / F.lit(100000000.0)
            ).alias("weight"),
        )
    )
    g = LinkGraph(vertices=ids, edges=edges, directed=False)
    mst = minimum_spanning_forest(g)
    return mst.select(
        "a", "b", F.round(F.col("w") + F.lit(1e-12), 6).alias("w_r")
    )


_MST_SQL = """
WITH RECURSIVE ew AS MATERIALIZED (
  SELECT CAST(c_custkey AS BIGINT) AS a,
         CAST(c_custkey + d AS BIGINT) AS b,
         CAST((c_custkey * 131 + d * 77) % 97 AS DOUBLE)
           + c_custkey / 1000000.0 + d / 100000000.0 AS w
  FROM customer, UNNEST([1, 2, 3, 4]) AS t(d)
  WHERE c_custkey <= 400 AND c_custkey + d <= 400
),
eid AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY a, b) AS eid, a, b, w FROM ew
),
sym AS MATERIALIZED (
  SELECT a AS x, b AS y, w FROM eid UNION ALL SELECT b, a, w FROM eid
),
r(eid, node, w) AS (
  SELECT eid, a, w FROM eid
  UNION
  SELECT r.eid, s.y, r.w FROM r JOIN sym s ON s.x = r.node AND s.w < r.w
)
SELECT e.a, e.b, round(e.w + 1e-12, 6) AS w_r
FROM eid e
WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.eid = e.eid AND r.node = e.b)"""


def q_kclique_parts(spark, sf_dir):
    """Triangle (k=3 clique) percolation communities on the part
    co-occurrence graph restricted to partkey < 250 (864 triangles at
    sf0.01 — the recursive-closure oracle stays sub-second);
    overlapping membership rows labeled by the lexicographically
    smallest member triangle."""
    from linkgraph.operators.kclique import k_clique_communities

    g0 = part_cooccurrence_graph(spark, sf_dir)
    g = LinkGraph(
        vertices=g0.vertices.where(F.col("id") < 250),
        edges=g0.edges.where((F.col("src") < 250) & (F.col("dst") < 250)),
        directed=False,
    )
    return k_clique_communities(g, 3)


_KCLIQUE_SQL = """
WITH RECURSIVE e AS MATERIALIZED (
  SELECT DISTINCT CAST(a.l_partkey AS BIGINT) AS s, CAST(b.l_partkey AS BIGINT) AS d
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey AND a.l_partkey < 250 AND b.l_partkey < 250
),
tri AS MATERIALIZED (
  SELECT e1.s AS x, e1.d AS y, e2.d AS z,
         row_number() OVER (ORDER BY e1.s, e1.d, e2.d) AS tid
  FROM e e1 JOIN e e2 ON e2.s = e1.d JOIN e e3 ON e3.s = e1.s AND e3.d = e2.d
),
tedge AS MATERIALIZED (
  SELECT tid, x AS u, y AS v FROM tri
  UNION ALL SELECT tid, x, z FROM tri
  UNION ALL SELECT tid, y, z FROM tri
),
tadj AS MATERIALIZED (
  SELECT a.tid AS ta, b.tid AS tb
  FROM tedge a JOIN tedge b ON a.u = b.u AND a.v = b.v AND a.tid <> b.tid
),
reach(t, l) AS (
  SELECT tid, tid FROM tri
  UNION
  SELECT tadj.tb, reach.l FROM reach JOIN tadj ON tadj.ta = reach.t
),
lbl AS (SELECT t, min(l) AS c FROM reach GROUP BY t),
lt AS (
  SELECT lbl.t, tc.x AS ca, tc.y AS cb, tc.z AS cc
  FROM lbl JOIN tri tc ON tc.tid = lbl.c
),
mem AS (
  SELECT tid, x AS id FROM tri
  UNION ALL SELECT tid, y FROM tri
  UNION ALL SELECT tid, z FROM tri
)
SELECT DISTINCT lt.ca, lt.cb, lt.cc, mem.id
FROM lt JOIN mem ON mem.tid = lt.t"""


def q_numeric_assortativity_orders(spark, sf_dir):
    """Numeric (c_acctbal) assortativity of the directed order graph
    — one corr aggregate (operators/assortativity.py
    numeric_assortativity_coefficient)."""
    from linkgraph.operators.assortativity import (
        numeric_assortativity_coefficient,
    )

    g = order_graph(spark, sf_dir)
    cust = _read(spark, sf_dir, "customer")
    g = LinkGraph(
        vertices=g.vertices.join(
            cust.select(
                F.col("c_custkey").cast("long").alias("id"),
                F.col("c_acctbal").cast("double").alias("bal"),
            ),
            "id",
        ),
        edges=g.edges,
        directed=True,
    )
    r = numeric_assortativity_coefficient(g, "bal")
    return spark.createDataFrame([(round(r, 8),)], "r double")


_NUMERIC_ASSORT_SQL = """
WITH nn AS (SELECT count(*) AS n FROM customer),
e AS (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
         CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT) AS dst
  FROM orders
)
SELECT round(corr(ca.c_acctbal, cb.c_acctbal), 8) AS r
FROM e
JOIN customer ca ON ca.c_custkey = e.src
JOIN customer cb ON cb.c_custkey = e.dst"""


def q_tfidf_topk_docs(spark, sf_dir):
    """Sparse TF-IDF cosine top-5 neighbors over a deterministic 10%
    document slice (functions/tfidf.py tfidf_topk — inverted-index
    self-join, no cross join). The slice bounds the dense all-pairs
    blow-up the synthetic 31-token vocabulary would otherwise force;
    the operator itself is posting-list-bounded via max_df at scale."""
    from linkgraph.functions.tfidf import tfidf_topk

    docs = _read_wide(spark, sf_dir, "documents").where(
        F.col("doc_id") % 10 == 0
    )
    return tfidf_topk(docs, k=5)


_TFIDF_TOPK_SQL = """
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
tk AS (SELECT doc_id AS id,
              unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
       FROM d),
tf AS (SELECT id, tok, CAST(count(*) AS DOUBLE) AS tf
       FROM tk GROUP BY id, tok),
dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM d),
vec AS (SELECT id, tf.tok, tf * ln((SELECT n FROM nn) / df) AS w
        FROM tf JOIN dfq USING (tok)),
nrm AS (SELECT id, sqrt(sum(w * w)) AS nrm FROM vec GROUP BY id),
dots AS (SELECT a.id AS ida, b.id AS idb, sum(a.w * b.w) AS dot
         FROM vec a JOIN vec b ON a.tok = b.tok AND a.id < b.id
         GROUP BY a.id, b.id),
sym AS (SELECT ida, idb, dot FROM dots
        UNION ALL SELECT idb, ida, dot FROM dots),
sims AS (SELECT sym.ida AS query_id, sym.idb AS neighbor_id,
                round(dot / (na.nrm * nb.nrm) + 1e-12, 6) AS s
         FROM sym
         JOIN nrm na ON na.id = sym.ida
         JOIN nrm nb ON nb.id = sym.idb),
rk AS (SELECT query_id, neighbor_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY s DESC, neighbor_id ASC) AS rnk
       FROM sims)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk
FROM rk WHERE rnk <= 5"""


def q_kcore_parts(spark, sf_dir):
    sub = k_core(part_cooccurrence_graph(spark, sf_dir), k=3)
    return sub.edges.select("src", "dst")


def q_core_number_parts(spark, sf_dir):
    g = part_cooccurrence_graph(spark, sf_dir)
    return core_number(g).select("id", F.col("core").cast("long").alias("core"))


def q_core_number_parts_dist(spark, sf_dir):
    """Distributed-plan twin: local_max_edges=0 pins the Montresor
    h-index superstep loop (core.py:200s) — the 100 TB plan — while
    the default entry takes the size-gated single-task BZ peeling."""
    g = part_cooccurrence_graph(spark, sf_dir)
    return core_number(g, local_max_edges=0).select(
        "id", F.col("core").cast("long").alias("core")
    )


def q_ktruss_parts_dist(spark, sf_dir):
    """Distributed-plan twin of q_ktruss_parts: local_max_edges=0 pins
    the per-round degree-oriented wedge + shuffle_hash closing-join
    peeling plan; the default entry takes the size-gated single-task
    support-peel kernel. The k-truss is a unique maximal subgraph, so
    both physical shapes hash to the same edge set."""
    from linkgraph.operators.core import k_truss

    g = part_cooccurrence_graph(spark, sf_dir)
    return k_truss(g, k=4, local_max_edges=0).edges.select("src", "dst")


def q_embedding_lsh_topk(spark, sf_dir):
    emb = _read_wide(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 8)
    top = sim.lsh_topk(emb, queries, dim=64, k=10, bits=8)
    return top.select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("rnk")
    )


def q_eigenvector_orders(spark, sf_dir):
    from linkgraph.operators.centrality import eigenvector_centrality

    g = order_graph(spark, sf_dir)
    x = eigenvector_centrality(g, fixed_iter=8)
    return x.select("id", F.round("centrality", 8).alias("centrality_r"))


def q_ppr_orders(spark, sf_dir):
    """Personalized PageRank: teleport ∝ max(c_acctbal, 1)."""
    g = order_graph(spark, sf_dir)
    pers = _read(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("id"),
        F.greatest(F.col("c_acctbal").cast("double"), F.lit(1.0)).alias("value"),
    )
    ranks = pagerank(g, alpha=PR_ALPHA, personalization=pers, fixed_iter=PR_ITERS)
    return ranks.select("id", F.round("rank", 8).alias("rank_r"))


def q_reciprocity_orders(spark, sf_dir):
    from linkgraph.operators.reciprocity import reciprocity

    g = order_graph(spark, sf_dir)
    return reciprocity(g).select(
        "id", F.round("reciprocity", 8).alias("reciprocity_r")
    )


def q_overall_reciprocity_orders(spark, sf_dir):
    from linkgraph.operators.reciprocity import overall_reciprocity

    g = order_graph(spark, sf_dir)
    r = overall_reciprocity(g)
    return spark.createDataFrame([(round(r, 8),)], "reciprocity_r double")


def q_sssp_orders(spark, sf_dir):
    """Weighted SSSP from node 1: weight = 1 + o_orderkey % 5 (min
    over parallel edges), distributed Bellman–Ford relaxation."""
    from linkgraph.operators.shortest_paths import (
        single_source_bellman_ford_path_length,
    )

    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    n = cust.count()
    edges = orders.select(
        F.col("o_custkey").cast("long").alias("src"),
        F.pmod(F.col("o_orderkey"), F.lit(n)).cast("long").alias("dst"),
        (1.0 + F.pmod(F.col("o_orderkey"), F.lit(5)).cast("double")).alias("weight"),
    )
    g = LinkGraph(
        vertices=cust.select(F.col("c_custkey").cast("long").alias("id")),
        edges=edges,
        directed=True,
    )
    d = single_source_bellman_ford_path_length(g, source=1)
    return d.select("id", F.round("dist", 6).alias("dist_r"))


def q_sssp_tree_orders(spark, sf_dir):
    """Shortest-path TREE from node 1 on the weighted order graph:
    dist + deterministic min-src tight-edge predecessor (-1 at the
    source so the column stays BIGINT for the hash compare)."""
    from linkgraph.operators.shortest_paths import shortest_path_tree

    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    n = cust.count()
    edges = orders.select(
        F.col("o_custkey").cast("long").alias("src"),
        F.pmod(F.col("o_orderkey"), F.lit(n)).cast("long").alias("dst"),
        (1.0 + F.pmod(F.col("o_orderkey"), F.lit(5)).cast("double")).alias("weight"),
    )
    g = LinkGraph(
        vertices=cust.select(F.col("c_custkey").cast("long").alias("id")),
        edges=edges,
        directed=True,
    )
    t = shortest_path_tree(g, source=1)
    return t.select(
        "id",
        F.round("dist", 6).alias("dist_r"),
        F.coalesce("pred", F.lit(-1)).alias("pred"),
    )


def q_topo_generations_orders(spark, sf_dir):
    """Kahn generations on the DAG restriction (src < dst) of the
    order graph — guaranteed acyclic."""
    from linkgraph.operators.dag import topological_generations

    g = order_graph(spark, sf_dir)
    dag = LinkGraph(
        vertices=g.vertices,
        edges=g.edges.where(F.col("src") < F.col("dst")),
        directed=True,
    )
    return topological_generations(dag).select("id", "generation")


def q_embedding_ivf_topk(spark, sf_dir):
    emb = _read_wide(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 8)
    top = sim.ivf_topk(
        emb, queries, k=10, n_centroids=8, kmeans_iters=2, nprobe=2
    )
    return top.select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("rnk")
    )


def q_doc_fingerprints(spark, sf_dir):
    docs = _read_wide(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        tx.rolling_fingerprint(F.col("text")).alias("rolling_fp"),
        tx.bpe_token_count(F.col("text")).cast("long").alias("bpe_tokens"),
    )


def q_avg_nbr_degree_orders(spark, sf_dir):
    from linkgraph.operators.assortativity import average_neighbor_degree

    g = order_graph(spark, sf_dir)
    return average_neighbor_degree(g).select(
        "id", F.round("avg_nbr_degree", 8).alias("avg_nbr_degree_r")
    )


def q_condensation_orders(spark, sf_dir):
    """Condensation DAG (strongly_connected.py:279) of the order
    graph restricted to o_orderkey % 3 != 0 — the full order graph is
    one giant SCC (condensation would be empty); the restriction
    yields ~500 SCCs with ~500 cross edges, a real check."""
    from linkgraph.operators.strongly_connected import condensation_edges

    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders").where(
        F.pmod(F.col("o_orderkey"), F.lit(3)) != 0
    )
    n = cust.count()
    edges = orders.select(
        F.col("o_custkey").cast("long").alias("src"),
        F.pmod(F.col("o_orderkey"), F.lit(n)).cast("long").alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    g = LinkGraph(
        vertices=cust.select(F.col("c_custkey").cast("long").alias("id")),
        edges=edges,
        directed=True,
    )
    return condensation_edges(g).select("src", "dst")


def q_topo_sort_orders(spark, sf_dir):
    """Deterministic topological order (generation, then id) on the
    DAG restriction of the order graph."""
    from linkgraph.operators.dag import topological_sort

    g = order_graph(spark, sf_dir)
    dag = LinkGraph(
        vertices=g.vertices,
        edges=g.edges.where(F.col("src") < F.col("dst")),
        directed=True,
    )
    return topological_sort(dag).select("id", "generation", "topo_rank")


def q_ktruss_parts(spark, sf_dir):
    from linkgraph.operators.core import k_truss

    g = part_cooccurrence_graph(spark, sf_dir)
    return k_truss(g, k=4).edges.select("src", "dst")


def q_nation_quotient_orders(spark, sf_dir):
    """Quotient (block) graph: contract the order graph along the
    customer -> nation partition; weight = cross-edge count."""
    from linkgraph.operators.minors import quotient_graph

    g = order_graph(spark, sf_dir)
    part = _read(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("id"),
        F.col("c_nationkey").cast("long").alias("block"),
    )
    q = quotient_graph(g, part)
    return q.edges.select("src", "dst", F.col("weight").cast("double").alias("w"))


def q_part_projection(spark, sf_dir):
    """Bipartite projection of the lineitem part<->order membership
    onto parts; weight = shared-order count."""
    from linkgraph.operators.bipartite import weighted_projected_graph

    li = _read(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("long").alias("part"),
        F.col("l_orderkey").cast("long").alias("ord"),
    )
    return weighted_projected_graph(li, "part", "ord").select(
        "u1", "u2", F.col("weight").cast("double").alias("w")
    )


def q_closeness_orders(spark, sf_dir):
    """Closeness + harmonic centrality of node 1 (incoming-distance
    BFS over the reversed order graph)."""
    from linkgraph.operators.centrality import (
        closeness_centrality,
        harmonic_centrality,
    )

    g = order_graph(spark, sf_dir)
    cc = closeness_centrality(g, 1)
    hc = harmonic_centrality(g, 1)
    return spark.createDataFrame(
        [(round(cc, 8), round(hc, 8))], "closeness_r double, harmonic_r double"
    )


def q_betweenness_orders(spark, sf_dir):
    """Source-sampled Brandes betweenness (centrality.py
    ``betweenness_centrality``, batched multi-source sweeps) on the
    order graph — 15 deterministic sources (custkey % 100 == 1),
    unnormalized raw dependency sums."""
    from linkgraph.operators.centrality import betweenness_centrality

    g = order_graph(spark, sf_dir)
    srcs = [
        r["id"]
        for r in g.vertices.where(F.pmod(F.col("id"), F.lit(100)) == 1).collect()
    ]
    return betweenness_centrality(g, sources=srcs, normalized=False).select(
        "id", F.round("betweenness", 6).alias("betweenness_r")
    )


def weighted_order_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    """order_graph with deterministic INTEGER-VALUED weights
    w = 1 + (o_orderkey % 5): weighted shortest paths genuinely differ
    from hop-count paths, while every path sum stays exact in float —
    the weighted-centrality fixture."""
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    n = cust.count()
    edges = orders.select(
        F.col("o_custkey").cast("long").alias("src"),
        F.pmod(F.col("o_orderkey"), F.lit(n)).cast("long").alias("dst"),
        (1 + F.pmod(F.col("o_orderkey"), F.lit(5))).cast("double").alias("weight"),
    )
    vertices = cust.select(F.col("c_custkey").cast("long").alias("id"))
    return LinkGraph(vertices=vertices, edges=edges, directed=True)


def q_betweenness_weighted_orders(spark, sf_dir):
    """Weighted Brandes betweenness (centrality.py
    ``_weighted_betweenness``: batched Bellman-Ford -> tight-edge DAG
    -> depth-stratified sigma/delta; reference betweenness.py:110
    ``weight=``) on the weighted order graph, same 15 deterministic
    sources as q_betweenness_orders, unnormalized."""
    from linkgraph.operators.centrality import betweenness_centrality

    g = weighted_order_graph(spark, sf_dir)
    srcs = [
        r["id"]
        for r in g.vertices.where(F.pmod(F.col("id"), F.lit(100)) == 1).collect()
    ]
    return betweenness_centrality(
        g, sources=srcs, normalized=False, weight=True
    ).select("id", F.round("betweenness", 6).alias("betweenness_r"))


def q_edge_betweenness_weighted_orders(spark, sf_dir):
    """WEIGHTED Brandes EDGE betweenness (centrality.py
    ``_weighted_betweenness`` edge_mode — reference betweenness.py:190
    ``edge_betweenness_centrality`` with ``weight=``): per-tight-edge
    credit sigma(v)*(1+delta(w))/sigma(w) on the weighted order graph,
    same 15 deterministic sources, unnormalized; closes the round-2
    NotImplementedError."""
    from linkgraph.operators.centrality import edge_betweenness_centrality

    g = weighted_order_graph(spark, sf_dir)
    srcs = [
        r["id"]
        for r in g.vertices.where(F.pmod(F.col("id"), F.lit(100)) == 1).collect()
    ]
    return edge_betweenness_centrality(
        g, sources=srcs, normalized=False, weight=True
    ).select("src", "dst", F.round("betweenness", 6).alias("betweenness_r"))


def q_betweenness_orders_dist(spark, sf_dir):
    """Distributed-plan twin: local_max_edges=0 pins the batched
    multi-source BFS sigma/delta superstep sweep."""
    from linkgraph.operators.centrality import betweenness_centrality

    g = order_graph(spark, sf_dir)
    srcs = [
        r["id"]
        for r in g.vertices.where(F.pmod(F.col("id"), F.lit(100)) == 1).collect()
    ]
    return betweenness_centrality(
        g, sources=srcs, normalized=False, local_max_edges=0
    ).select("id", F.round("betweenness", 6).alias("betweenness_r"))


def q_betweenness_weighted_orders_dist(spark, sf_dir):
    """Distributed-plan twin: local_max_edges=0 pins the weighted
    Bellman-Ford -> tight-DAG -> depth-stratified superstep sweep."""
    from linkgraph.operators.centrality import betweenness_centrality

    g = weighted_order_graph(spark, sf_dir)
    srcs = [
        r["id"]
        for r in g.vertices.where(F.pmod(F.col("id"), F.lit(100)) == 1).collect()
    ]
    return betweenness_centrality(
        g, sources=srcs, normalized=False, weight=True, local_max_edges=0
    ).select("id", F.round("betweenness", 6).alias("betweenness_r"))


def q_edge_betweenness_weighted_orders_dist(spark, sf_dir):
    """Distributed-plan twin of edge_betweenness_weighted_orders."""
    from linkgraph.operators.centrality import edge_betweenness_centrality

    g = weighted_order_graph(spark, sf_dir)
    srcs = [
        r["id"]
        for r in g.vertices.where(F.pmod(F.col("id"), F.lit(100)) == 1).collect()
    ]
    return edge_betweenness_centrality(
        g, sources=srcs, normalized=False, weight=True, local_max_edges=0
    ).select("src", "dst", F.round("betweenness", 6).alias("betweenness_r"))


def q_edge_betweenness_orders(spark, sf_dir):
    """Source-sampled Brandes EDGE betweenness on the order graph —
    same 15 deterministic sources as q_betweenness_orders, raw
    (unnormalized) credits; directed, so edges keep orientation."""
    from linkgraph.operators.centrality import edge_betweenness_centrality

    g = order_graph(spark, sf_dir)
    srcs = [
        r["id"]
        for r in g.vertices.where(F.pmod(F.col("id"), F.lit(100)) == 1).collect()
    ]
    return edge_betweenness_centrality(g, sources=srcs, normalized=False).select(
        "src", "dst", F.round("betweenness", 6).alias("betweenness_r")
    )


def q_harmonic_sampled_orders(spark, sf_dir):
    """Pivot-sampled closeness/harmonic aggregates for EVERY node from
    60 deterministic origins (custkey % 25 == 1) — one batched
    multi-source BFS (Eppstein–Wang estimator inputs)."""
    from linkgraph.operators.centrality import sampled_closeness_harmonic

    g = order_graph(spark, sf_dir)
    srcs = [
        r["id"]
        for r in g.vertices.where(F.pmod(F.col("id"), F.lit(25)) == 1).collect()
    ]
    return sampled_closeness_harmonic(g, srcs).select(
        "id",
        "n_reached",
        "dist_sum",
        F.round("harmonic_sum", 8).alias("harmonic_r"),
    )


def q_harmonic_sampled_orders_dist(spark, sf_dir):
    """Distributed-plan twin: local_max_edges=0 pins the bitset MS-BFS
    superstep plan (traversal.py multi_source_bfs_counts) that runs at
    100 TB, not the size-gated single-task numpy kernel."""
    from linkgraph.operators.centrality import sampled_closeness_harmonic

    g = order_graph(spark, sf_dir)
    srcs = [
        r["id"]
        for r in g.vertices.where(F.pmod(F.col("id"), F.lit(25)) == 1).collect()
    ]
    return sampled_closeness_harmonic(g, srcs, local_max_edges=0).select(
        "id",
        "n_reached",
        "dist_sum",
        F.round("harmonic_sum", 8).alias("harmonic_r"),
    )


def q_katz_orders(spark, sf_dir):
    """Katz centrality (centrality.py ``katz_centrality``) on the order
    graph at 8 fixed supersteps, alpha=0.05, beta=1, L2-normalized."""
    from linkgraph.operators.centrality import katz_centrality

    g = order_graph(spark, sf_dir)
    x = katz_centrality(g, alpha=0.05, beta=1.0, fixed_iter=8)
    return x.select("id", F.round("centrality", 8).alias("katz_r"))


def q_eigenvector_orders_dist(spark, sf_dir):
    """Distributed-plan twin: local_max_edges=0 pins the salted-CSR
    gather superstep plan (centrality.py eigenvector_centrality)."""
    from linkgraph.operators.centrality import eigenvector_centrality

    g = order_graph(spark, sf_dir)
    x = eigenvector_centrality(g, fixed_iter=8, local_max_edges=0)
    return x.select("id", F.round("centrality", 8).alias("centrality_r"))


def q_katz_orders_dist(spark, sf_dir):
    """Distributed-plan twin: local_max_edges=0 pins the salted-CSR
    gather superstep plan (centrality.py katz_centrality)."""
    from linkgraph.operators.centrality import katz_centrality

    g = order_graph(spark, sf_dir)
    x = katz_centrality(g, alpha=0.05, beta=1.0, fixed_iter=8, local_max_edges=0)
    return x.select("id", F.round("centrality", 8).alias("katz_r"))


def q_mis_orders(spark, sf_dir):
    """Luby maximal independent set (independent_set.py
    ``maximal_independent_set``) on the symmetrized order graph —
    deterministic hashed priorities, seed 0."""
    from linkgraph.operators.independent_set import maximal_independent_set

    g = order_graph(spark, sf_dir)
    return maximal_independent_set(g, seed=0)


def q_mis_orders_dist(spark, sf_dir):
    """Distributed-plan twin: local_max_edges=0 pins the two-shuffle
    Luby round plan (independent_set.py) that runs at 100 TB."""
    from linkgraph.operators.independent_set import maximal_independent_set

    g = order_graph(spark, sf_dir)
    return maximal_independent_set(g, seed=0, local_max_edges=0)


def q_eccentricity_orders(spark, sf_dir):
    """Pivot eccentricities (distance_measures.py
    ``eccentricity_sampled``) from 60 deterministic origins
    (custkey % 25 == 1) — reachable-set max hop distance."""
    from linkgraph.operators.distance_measures import eccentricity_sampled

    g = order_graph(spark, sf_dir)
    srcs = g.vertices.where(F.pmod(F.col("id"), F.lit(25)) == 1).select("id")
    return eccentricity_sampled(g, srcs)


def q_distance_summary_orders(spark, sf_dir):
    """One-row diameter/radius bounds + sampled global efficiency
    (distance_measures.py ``distance_summary_sampled``) from the same
    60 pivots."""
    from linkgraph.operators.distance_measures import distance_summary_sampled

    g = order_graph(spark, sf_dir)
    srcs = g.vertices.where(F.pmod(F.col("id"), F.lit(25)) == 1).select("id")
    return distance_summary_sampled(g, srcs).select(
        "diameter_lb",
        "radius_ub",
        F.round("global_efficiency", 8).alias("global_efficiency_r"),
    )


def q_hyperball_orders(spark, sf_dir):
    """HyperBall distance-≤3 out-ball sketches for EVERY vertex
    (hyperball.py ``hyperball_registers``; Boldi & Vigna 2013 — the
    published web-scale approximate-neighbourhood algorithm nx lacks;
    exact counterpart = one nx BFS per node). b=4 → 16 registers per
    vertex; one superstep = registers⋈edges join + 16-column max hash
    agg, pure JVM. The oracle compares the exact INTEGER registers —
    the float ball estimate (linear-counting branch needs libm ``ln``)
    is pytest-verified instead (tests/test_hyperball.py)."""
    from linkgraph.operators.hyperball import hyperball_registers

    g = order_graph(spark, sf_dir)
    regs = hyperball_registers(g, b=4, t=3)
    reg_sum = sum((F.col(f"r{i}") for i in range(16)), F.lit(0))
    return regs.select(
        "id", *[f"r{i}" for i in range(16)], reg_sum.cast("int").alias("reg_sum")
    )


def q_hyperball_orders_b6(spark, sf_dir):
    """Production-width twin of ``hyperball_orders``: b=6 → 64
    registers per vertex, the width the module defaults to at web
    scale. Internally the superstep ships 8 broadword-packed BIGINT
    columns (hyperball.py module docstring — 8× narrower messages than
    the unpacked r2/r3 layout); the oracle hashes the exact UNPACKED
    integer registers, so this pins the packed wire format's
    correctness at the width that matters, not just the b=4 toy."""
    from linkgraph.operators.hyperball import hyperball_registers

    g = order_graph(spark, sf_dir)
    regs = hyperball_registers(g, b=6, t=3)
    reg_sum = sum((F.col(f"r{i}") for i in range(64)), F.lit(0))
    return regs.select(
        "id", *[f"r{i}" for i in range(64)], reg_sum.cast("int").alias("reg_sum")
    )


def q_hyperball_harmonic_orders(spark, sf_dir):
    """HyperBall geometric centralities for EVERY vertex
    (hyperball.py ``harmonic_centrality_hyperball``; Boldi & Vigna
    2013 §4): harmonic/closeness/reach estimates from in-ball shell
    increments. Rows-only by necessity: the ball estimates pass
    through libm ``ln`` (linear-counting branch), so the floats have
    no bit-stable SQL twin; estimate ACCURACY is pytest-verified
    against exact nx harmonic/closeness (tests/test_hyperball.py).
    Values are rounded to stabilize the row shape only."""
    from linkgraph.operators.hyperball import harmonic_centrality_hyperball

    g = order_graph(spark, sf_dir)
    hc = harmonic_centrality_hyperball(g, b=4, max_t=6)
    return hc.select(
        "id",
        F.round("harmonic_est", 4).alias("harmonic_r"),
        F.round("n_in_est", 4).alias("n_in_r"),
        F.round("closeness_est", 6).alias("closeness_r"),
    )


def q_walks_orders(spark, sf_dir):
    """Deterministic random walks (walks.py ``random_walks``) on the
    order graph: starts = custkey % 10 == 1, 6 steps, seed 1 —
    DeepWalk-style corpus generation, one CSR join per step."""
    from linkgraph.operators.walks import random_walks

    g = order_graph(spark, sf_dir)
    starts = g.vertices.where(F.pmod(F.col("id"), F.lit(10)) == 1).select("id")
    return random_walks(g, walk_length=6, seed=1, starts=starts)


def q_node2vec_orders(spark, sf_dir):
    """node2vec biased walks (walks.py ``node2vec_walks``) on the
    order graph: starts = custkey % 10 == 1, 4 steps, bias weights
    (w_return, w_common, w_explore) = (1, 4, 2) i.e. p=4, q=2, seed 1.
    Integer-weight cumulative sampler — SQL-replayable exactly."""
    from linkgraph.operators.walks import node2vec_walks

    g = order_graph(spark, sf_dir)
    starts = g.vertices.where(F.pmod(F.col("id"), F.lit(10)) == 1).select("id")
    return node2vec_walks(
        g, walk_length=4, w_return=1, w_common=4, w_explore=2,
        seed=1, starts=starts,
    )


def q_vertex_cover_orders(spark, sf_dir):
    """2-approx vertex cover = endpoints of a Luby-style maximal
    matching (matching.py) on the undirected simple order graph."""
    from linkgraph.operators.matching import vertex_cover_approx

    g = order_graph(spark, sf_dir)
    return vertex_cover_approx(g, seed=0)


def q_local_bridges_parts(spark, sf_dir):
    """Edges with no common neighbor (structural.py ``local_bridges``)
    on the part co-occurrence graph."""
    from linkgraph.operators.structural import local_bridges

    g = part_cooccurrence_graph(spark, sf_dir)
    return local_bridges(g)


def q_s_metric_parts(spark, sf_dir):
    """Li–Alderson s-metric (structural.py ``s_metric``) of the part
    co-occurrence graph — one row."""
    from linkgraph.operators.structural import s_metric

    g = part_cooccurrence_graph(spark, sf_dir)
    return s_metric(g)


def q_rich_club_parts(spark, sf_dir):
    """Rich-club coefficient phi(k) per degree threshold
    (structural.py ``rich_club_coefficient``) on the part graph."""
    from linkgraph.operators.structural import rich_club_coefficient

    g = part_cooccurrence_graph(spark, sf_dir)
    return rich_club_coefficient(g).select(
        "k", F.round("phi", 8).alias("phi_r")
    )


def q_modularity_nations(spark, sf_dir):
    """Modularity (community/quality.py:81) of the nation partition
    over the nation-chain graph — one labels⋈edges join + two
    aggregates (community_metrics.py ``modularity``)."""
    from linkgraph.operators.community_metrics import modularity

    g = nation_chain_graph(spark, sf_dir)
    labels = _read(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("id"),
        F.col("c_nationkey").cast("long").alias("label"),
    )
    return modularity(g, labels).select(
        F.round("modularity", 8).alias("modularity_r")
    )


def q_partition_quality_nations(spark, sf_dir):
    """Coverage + performance (community/quality.py
    ``partition_quality``) of the nation partition over the
    nation-chain graph."""
    from linkgraph.operators.community_metrics import partition_quality

    g = nation_chain_graph(spark, sf_dir)
    labels = _read(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("id"),
        F.col("c_nationkey").cast("long").alias("label"),
    )
    return partition_quality(g, labels).select(
        F.round("coverage", 8).alias("coverage_r"),
        F.round("performance", 8).alias("performance_r"),
    )


def q_assortativity_parts(spark, sf_dir):
    from linkgraph.operators.assortativity import degree_assortativity_coefficient

    g = part_cooccurrence_graph(spark, sf_dir)
    r = degree_assortativity_coefficient(g)
    return spark.createDataFrame([(round(r, 6),)], "assortativity_r double")


def q_link_embeddedness_parts(spark, sf_dir):
    from linkgraph.operators import links

    g = part_cooccurrence_graph(spark, sf_dir)
    return links.common_neighbor_counts(g, adjacent_only=True).select(
        "u", "v", "cn"
    )


def q_dispersion_orders(spark, sf_dir):
    from linkgraph.operators import links

    g = undirected_order_graph(spark, sf_dir)
    return links.dispersion(g).select(
        "u", "v", "embeddedness", F.round("dispersion", 8).alias("dispersion_r")
    )


def q_embedding_near_pairs(spark, sf_dir):
    emb = _read_wide(spark, sf_dir, "embeddings")
    return sim.lsh_self_join(emb, dim=64, bits=8, round_to=6).select(
        "id_a", "id_b", F.col("score").alias("score_r")
    )


def undirected_order_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    """Undirected simple view of the order graph, self-loops dropped
    (several operators — onion, degree centrality — are
    undirected-only, reference parity)."""
    g = order_graph(spark, sf_dir)
    edges = (
        g.edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    return LinkGraph(vertices=g.vertices, edges=edges, directed=False)


def partsupp_bipartite_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    """Bipartite part–supplier graph from lineitem; supplier ids are
    offset by max(p_partkey) so the two sides share one id space."""
    li = _read(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    part = _read(spark, sf_dir, "part")
    supp = _read(spark, sf_dir, "supplier")
    off = part.agg(F.max("p_partkey")).first()[0]
    edges = li.select(
        F.col("l_partkey").cast("long").alias("src"),
        (F.col("l_suppkey") + F.lit(off)).cast("long").alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    vertices = (
        part.select(F.col("p_partkey").cast("long").alias("id"))
        .unionByName(
            supp.select((F.col("s_suppkey") + F.lit(off)).cast("long").alias("id"))
        )
    )
    return LinkGraph(vertices=vertices, edges=edges, directed=False)


def nation_ring_graph(
    spark: SparkSession, sf_dir: str, closed: bool = True, directed: bool = False
) -> LinkGraph:
    """Cycle (or open path) over the 25 nations ordered by key —
    the recognition-predicate fixture: a closed ring is Eulerian, an
    open path is a tree with an Euler path."""
    nat = _read(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("id")
    )
    e = (
        nat.select(
            F.col("id").alias("src"),
            F.lead("id").over(Window.orderBy("id")).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
    )
    if closed:
        e = e.unionByName(nat.agg(F.max("id").alias("src"), F.min("id").alias("dst")))
    return LinkGraph(
        vertices=nat, edges=e.withColumn("weight", F.lit(1.0)), directed=directed
    )


def q_doc_chunks(spark, sf_dir):
    from linkgraph.functions.pipeline import chunk_documents

    docs = _read_wide(spark, sf_dir, "documents")
    return chunk_documents(docs, size=128, overlap=64)


def q_doc_repetition(spark, sf_dir):
    from linkgraph.functions.textops import repetition_features

    docs = _read_wide(spark, sf_dir, "documents")
    return repetition_features(docs)


def q_doc_pii_scrub(spark, sf_dir):
    """PII redaction counts + scrubbed-text digest. The synthetic
    corpus contains no digits at all, so each doc's text is first
    augmented with a deterministic doc_id-derived contact block (one
    email, SSN, phone, IPv4 each) — same expression in the oracle —
    making every PII class exercise nonzero matches."""
    from linkgraph.functions.scrub import pii_scrub_table

    docs = _read_wide(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), sid, F.lit("@example.com"),
            F.lit(" ssn 123-45-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" tel 555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-6789 ip 10."),
            (F.col("doc_id") % 256).cast("string"), F.lit(".0.1"),
        ).alias("text"),
    )
    t = pii_scrub_table(aug)
    return t.select(
        "doc_id",
        *[F.col(f"n_{k}").cast("long").alias(f"n_{k}")
          for k in ("email", "ssn", "phone", "ipv4")],
        F.md5("scrubbed").alias("scrub_md5"),
    )


def q_doc_unigram_logprob(spark, sf_dir):
    """Corpus-self-trained unigram-LM quality score per document (the
    perplexity-filter proxy; scrub.unigram_logprob)."""
    from linkgraph.functions.scrub import unigram_logprob

    docs = _read_wide(spark, sf_dir, "documents")
    return unigram_logprob(docs).select(
        "doc_id", "n_tokens", F.round("avg_logprob", 6).alias("avg_logprob_r")
    )


def q_event_sessions(spark, sf_dir):
    """8-hour-gap sessionization of the event stream + per-session
    stats — the canonical clickstream shape."""
    from linkgraph.functions.events import session_stats

    ev = _read_wide(spark, sf_dir, "events")
    return session_stats(ev, gap_seconds=28800)


def _synth_urls(spark, sf_dir):
    cust = _read(spark, sf_dir, "customer")
    scheme = F.when(F.pmod("c_custkey", F.lit(3)) == 0, "http").otherwise("https")
    path = F.concat(
        F.lit("/c/"),
        F.col("c_custkey").cast("string"),
        F.when(F.pmod("c_custkey", F.lit(2)) == 0, F.lit("/items")).otherwise(
            F.lit("")
        ),
    )
    query = (
        F.when(
            F.pmod("c_custkey", F.lit(5)) == 0,
            F.concat(F.lit("?utm_source=feed&pid="), F.col("c_custkey").cast("string")),
        )
        .when(
            F.pmod("c_custkey", F.lit(5)) == 1,
            F.concat(F.lit("?pid="), F.col("c_custkey").cast("string")),
        )
        .otherwise(F.lit(""))
    )
    return cust.select(
        F.col("c_custkey").cast("long").alias("id"),
        F.concat(
            scheme,
            F.lit("://nation"),
            F.col("c_nationkey").cast("string"),
            F.lit(".shop.example.com"),
            path,
            query,
        ).alias("url"),
    )


def q_url_parts(spark, sf_dir):
    """JVM-side URL parsing (parse_url/regexp) over deterministic
    synthesized customer URLs."""
    from linkgraph.functions.urls import (
        is_https,
        path_depth,
        registered_domain,
        strip_tracking_params,
        url_host,
    )

    u = _synth_urls(spark, sf_dir)
    return u.select(
        "id",
        url_host(F.col("url")).alias("host"),
        registered_domain(F.col("url")).alias("domain"),
        path_depth(F.col("url")).cast("long").alias("depth"),
        is_https(F.col("url")).alias("https"),
        strip_tracking_params(F.col("url")).alias("clean_url"),
    )


def q_link_sh_parts(spark, sf_dir):
    """Soundarajan–Hopcroft community-aware common-neighbor score on
    the part co-occurrence graph, community = p_brand."""
    from linkgraph.operators.links import cn_soundarajan_hopcroft

    g = part_cooccurrence_graph(spark, sf_dir)
    comm = _read(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("long").alias("id"),
        F.col("p_brand").alias("community"),
    )
    return cn_soundarajan_hopcroft(g, comm).select("u", "v", "score")


def q_voterank_orders(spark, sf_dir):
    from linkgraph.operators.voterank import voterank

    g = order_graph(spark, sf_dir)
    return voterank(g, number_of_nodes=6)


def q_graph_recognition(spark, sf_dir):
    from linkgraph.operators.recognition import (
        has_eulerian_path,
        is_eulerian,
        is_forest,
        is_tree,
    )

    chains = nation_chain_graph(spark, sf_dir)
    ring = nation_ring_graph(spark, sf_dir, closed=True)
    dring = nation_ring_graph(spark, sf_dir, closed=True, directed=True)
    path = nation_ring_graph(spark, sf_dir, closed=False)
    row = (
        is_forest(chains),
        is_tree(chains),
        is_eulerian(ring),
        has_eulerian_path(ring),
        is_tree(ring),
        is_eulerian(dring),
        is_eulerian(path),
        has_eulerian_path(path),
        is_tree(path),
    )
    return spark.createDataFrame(
        [row],
        "forest_chains boolean, tree_chains boolean, euler_ring boolean, "
        "euler_path_ring boolean, tree_ring boolean, euler_ring_directed boolean, "
        "euler_circuit_path boolean, euler_path_path boolean, tree_path boolean",
    )


def q_doc_decontaminate(spark, sf_dir):
    from linkgraph.functions.pipeline import decontaminate

    docs = _read_wide(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 20 == 0)
    train = docs.where(F.col("doc_id") % 20 != 0)
    return decontaminate(train, bench, n=5)


def q_doc_split(spark, sf_dir):
    from linkgraph.functions.pipeline import hash_split

    return hash_split(_read(spark, sf_dir, "documents"))


def q_doc_stratified_sample(spark, sf_dir):
    from linkgraph.functions.pipeline import stratified_sample

    return stratified_sample(_read_wide(spark, sf_dir, "documents"), 0.2, by="lang")


def supplier_ringchain_graph(
    spark: SparkSession, sf_dir: str, max_nation: int | None = None
) -> LinkGraph:
    """Per-nation supplier rings joined by an inter-nation rep chain.

    Within each nation, suppliers (ordered by s_suppkey) form a path;
    nations with >= 3 suppliers close the path into a ring (cycle).
    The min-suppkey supplier of each nation is its *rep*; reps,
    ordered by s_nationkey, form a chain. Chain edges (and the lone
    edge of a 2-supplier nation) are exactly the graph's bridges, the
    rings are exactly its cycle blocks — so biconnectivity has a
    closed-form oracle."""
    sup = _read(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long").alias("k"),
        F.col("s_nationkey").cast("long").alias("nk"),
    )
    if max_nation is not None:
        sup = sup.where(F.col("nk") < max_nation)
    wn = Window.partitionBy("nk").orderBy("k")
    wall = Window.partitionBy("nk")
    ranked = sup.select(
        "k",
        "nk",
        F.row_number().over(wn).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("cnt"),
        F.lead("k").over(wn).alias("nxt"),
        F.min("k").over(wall).alias("rep"),
    )
    path = ranked.where(F.col("nxt").isNotNull()).select(
        F.col("k").alias("src"), F.col("nxt").alias("dst")
    )
    closing = ranked.where(
        (F.col("rn") == F.col("cnt")) & (F.col("cnt") >= 3)
    ).select(F.col("k").alias("src"), F.col("rep").alias("dst"))
    reps = sup.groupBy("nk").agg(F.min("k").alias("rep"))
    # 25 nations — the unpartitioned window is a deliberate one-task step
    chain = (
        reps.select("rep", F.lead("rep").over(Window.orderBy("nk")).alias("nxt"))
        .where(F.col("nxt").isNotNull())
        .select(F.col("rep").alias("src"), F.col("nxt").alias("dst"))
    )
    edges = (
        path.unionByName(closing).unionByName(chain).withColumn("weight", F.lit(1.0))
    )
    vertices = sup.select(F.col("k").alias("id"))
    return LinkGraph(vertices=vertices, edges=edges, directed=False)


def q_bridges_suppliers(spark, sf_dir):
    from linkgraph.operators.biconnected import bridges

    g = supplier_ringchain_graph(spark, sf_dir)
    return bridges(g).select("src", "dst")


def q_articulation_suppliers(spark, sf_dir):
    from linkgraph.operators.biconnected import articulation_points

    # local_max_edges=0 forces the distributed Tarjan–Vishkin path so
    # the driver oracle exercises it (the local path is covered by
    # q_bridges_suppliers / q_biconn_labels_suppliers). Bounded to 8
    # nations: every sweep in the distributed path is O(tree depth)
    # jobs, and the rep chain dominates the depth — full nx parity on
    # deeper/random graphs lives in tests/test_biconnected.py.
    g = supplier_ringchain_graph(spark, sf_dir, max_nation=8)
    return articulation_points(g, local_max_edges=0).select("id")


def q_biconn_labels_suppliers(spark, sf_dir):
    from linkgraph.operators.biconnected import biconnected_components

    g = supplier_ringchain_graph(spark, sf_dir)
    return biconnected_components(g).select("src", "dst", "bc_src", "bc_dst")


def q_onion_orders(spark, sf_dir):
    from linkgraph.operators.core import onion_layers

    g = undirected_order_graph(spark, sf_dir)
    return onion_layers(g).select("id", "layer")


def q_kshell_parts(spark, sf_dir):
    from linkgraph.operators.core import k_shell

    g = part_cooccurrence_graph(spark, sf_dir)
    sub = k_shell(g)  # default k = max core number (SF-independent)
    return sub.edges.select("src", "dst")


def q_avg_degree_connectivity_parts(spark, sf_dir):
    from linkgraph.operators.assortativity import average_degree_connectivity

    g = part_cooccurrence_graph(spark, sf_dir)
    return average_degree_connectivity(g).select(
        "degree", F.round("avg_connectivity", 8).alias("avg_connectivity_r")
    )


def q_attr_assortativity_orders(spark, sf_dir):
    from linkgraph.operators.assortativity import (
        attribute_assortativity_coefficient,
    )

    g = order_graph(spark, sf_dir)
    cust = _read(spark, sf_dir, "customer")
    attrs = cust.select(
        F.col("c_custkey").cast("long").alias("id"),
        F.col("c_nationkey").cast("long").alias("nation"),
    )
    g = LinkGraph(
        vertices=g.vertices.join(attrs, "id"), edges=g.edges, directed=True
    )
    r = attribute_assortativity_coefficient(g, "nation")
    return spark.createDataFrame([(round(r, 8),)], "attr_assortativity_r double")


def q_degree_centrality_orders(spark, sf_dir):
    from linkgraph.operators.structural import degree_centrality

    g = undirected_order_graph(spark, sf_dir)
    return degree_centrality(g).select(
        "id", F.round("centrality", 8).alias("centrality_r")
    )


def q_effective_size_parts(spark, sf_dir):
    from linkgraph.operators.structural import effective_size

    g = part_cooccurrence_graph(spark, sf_dir)
    return effective_size(g).select(
        "id", F.round("effective_size", 8).alias("effective_size_r")
    )


def q_edge_boundary_orders(spark, sf_dir):
    from linkgraph.operators.boundary import edge_boundary

    g = order_graph(spark, sf_dir)
    rich = (
        _read(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").cast("long").alias("id"))
    )
    return edge_boundary(g, rich).select("src", "dst")


def q_weighted_clustering_parts(spark, sf_dir):
    from linkgraph.operators.triangles import weighted_clustering

    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("pa") < F.col("pb"))
        .groupBy(
            F.col("pa").cast("long").alias("src"),
            F.col("pb").cast("long").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )
    vertices = _read(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("long").alias("id")
    )
    g = LinkGraph(vertices=vertices, edges=edges, directed=False)
    return weighted_clustering(g).select(
        "id", F.round("clustering", 8).alias("clustering_r")
    )


def q_conductance_orders(spark, sf_dir):
    from linkgraph.operators.cuts import conductance, cut_size, volume

    g = order_graph(spark, sf_dir)
    rich = (
        _read(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").cast("long").alias("id"))
    )
    c = conductance(g, rich)
    cs = cut_size(g, rich)
    vol = volume(g, rich)
    return spark.createDataFrame(
        [(round(c, 8), cs, vol)],
        "conductance_r double, cut_size double, volume double",
    )


def q_constraint_parts(spark, sf_dir):
    from linkgraph.operators.structural import constraint

    g = part_cooccurrence_graph(spark, sf_dir)
    return constraint(g).select(
        "id", F.round("constraint", 8).alias("constraint_r")
    )


def q_square_clustering_parts(spark, sf_dir):
    from linkgraph.operators.triangles import square_clustering

    g = part_cooccurrence_graph(spark, sf_dir)
    return square_clustering(g).select(
        "id", F.round("sq_clustering", 8).alias("sq_clustering_r")
    )


def q_doc_packing(spark, sf_dir):
    from linkgraph.functions.pipeline import pack_sequences

    docs = _read_wide(spark, sf_dir, "documents")
    return pack_sequences(docs, budget=512).select(
        F.col("id").alias("doc_id"),
        "n_tokens",
        "start_offset",
        "pack_id",
        "pack_offset",
    )


def q_triadic_census_orders(spark, sf_dir):
    from linkgraph.operators.triads import triadic_census

    g = order_graph(spark, sf_dir)
    return triadic_census(g).select("triad_type", "n_triads")


def q_bipartite_color_partsupp(spark, sf_dir):
    from linkgraph.operators.bipartite import bipartite_color

    g = partsupp_bipartite_graph(spark, sf_dir)
    return bipartite_color(g).select("id", "color")


def q_dag_longest_path_orders(spark, sf_dir):
    """Weighted longest-path-ending-at-v labels (dag_longest_path's
    length table) on the DAG restriction (src < dst) of the order
    graph, deterministic integer weights w = (src + dst) % 4 + 1."""
    from linkgraph.operators.dag import longest_path_lengths

    g = order_graph(spark, sf_dir)
    dag = LinkGraph(
        vertices=g.vertices,
        edges=g.edges.where(F.col("src") < F.col("dst")).select(
            "src",
            "dst",
            (F.pmod(F.col("src") + F.col("dst"), F.lit(4)) + 1)
            .cast("double")
            .alias("weight"),
        ),
        directed=True,
    )
    return longest_path_lengths(dag, weighted=True).select(
        "id", F.round("dist", 6).alias("dist_r")
    )


def q_dag_longest_path_orders_dist(spark, sf_dir):
    """Distributed-plan twin: local_max_edges=0 pins the max-plus
    frontier superstep plan (dag.py longest_path_lengths) that runs at
    100 TB."""
    from linkgraph.operators.dag import longest_path_lengths

    g = order_graph(spark, sf_dir)
    dag = LinkGraph(
        vertices=g.vertices,
        edges=g.edges.where(F.col("src") < F.col("dst")).select(
            "src",
            "dst",
            (F.pmod(F.col("src") + F.col("dst"), F.lit(4)) + 1)
            .cast("double")
            .alias("weight"),
        ),
        directed=True,
    )
    return longest_path_lengths(dag, weighted=True, local_max_edges=0).select(
        "id", F.round("dist", 6).alias("dist_r")
    )


def skip_chain_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    """Directed per-nation customer chains with lead-2 and lead-4 skip
    edges — a DAG whose transitive reduction is exactly the lead-1
    chain (every skip edge is covered by consecutive hops)."""
    cust = _read(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    parts = []
    for k in (1, 2, 4):
        parts.append(
            cust.select(
                F.col("c_custkey").cast("long").alias("src"),
                F.lead("c_custkey", k).over(w).cast("long").alias("dst"),
            ).where(F.col("dst").isNotNull())
        )
    edges = parts[0].unionByName(parts[1]).unionByName(parts[2]).withColumn(
        "weight", F.lit(1.0)
    )
    vertices = cust.select(F.col("c_custkey").cast("long").alias("id"))
    return LinkGraph(vertices=vertices, edges=edges, directed=True)


def q_transitive_reduction_chains(spark, sf_dir):
    from linkgraph.operators.dag import transitive_reduction

    g = skip_chain_graph(spark, sf_dir)
    return transitive_reduction(g).select("src", "dst")


_DAG_LONGEST_PATH_SQL = """
WITH RECURSIVE nn AS (SELECT count(*) AS n FROM customer),
e AS (
  SELECT src, dst, CAST((src + dst) % 4 + 1 AS DOUBLE) AS w FROM (
    SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
           CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT) AS dst
    FROM orders
    WHERE o_custkey < o_orderkey % (SELECT n FROM nn)
  )
),
g(id, d) AS (
  SELECT CAST(c_custkey AS BIGINT), CAST(0 AS DOUBLE) FROM customer
  UNION
  SELECT e.dst, g.d + e.w FROM g JOIN e ON e.src = g.id
),
m AS (SELECT id, max(d) AS dist FROM g GROUP BY id)
SELECT id, round(dist, 6) AS dist_r FROM m"""


_TRANSITIVE_REDUCTION_SQL = """
WITH RECURSIVE ch AS (
  SELECT CAST(c_custkey AS BIGINT) AS src,
         CAST(lead(c_custkey, 1) OVER w AS BIGINT) AS d1,
         CAST(lead(c_custkey, 2) OVER w AS BIGINT) AS d2,
         CAST(lead(c_custkey, 4) OVER w AS BIGINT) AS d4
  FROM customer
  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_custkey)
),
e AS (
  SELECT src, d1 AS dst FROM ch WHERE d1 IS NOT NULL
  UNION SELECT src, d2 FROM ch WHERE d2 IS NOT NULL
  UNION SELECT src, d4 FROM ch WHERE d4 IS NOT NULL
),
clos(src, dst) AS (
  SELECT src, dst FROM e
  UNION
  SELECT c.src, e.dst FROM clos c JOIN e ON e.src = c.dst
),
redundant AS (
  SELECT DISTINCT e.src, c.dst
  FROM e JOIN clos c ON c.src = e.dst
  WHERE c.dst <> e.src
)
SELECT e.src, e.dst FROM e
LEFT JOIN redundant r ON r.src = e.src AND r.dst = e.dst
WHERE r.src IS NULL"""


def _mod3_order_graph(spark, sf_dir):
    """The restricted order graph shared with q_condensation_orders:
    ~500 SCCs with real cross edges."""
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders").where(
        F.pmod(F.col("o_orderkey"), F.lit(3)) != 0
    )
    n = cust.count()
    edges = orders.select(
        F.col("o_custkey").cast("long").alias("src"),
        F.pmod(F.col("o_orderkey"), F.lit(n)).cast("long").alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    return LinkGraph(
        vertices=cust.select(F.col("c_custkey").cast("long").alias("id")),
        edges=edges,
        directed=True,
    )


def q_attracting_orders(spark, sf_dir):
    """Vertices of attracting (sink-SCC) components of the restricted
    order graph."""
    from linkgraph.operators.strongly_connected import attracting_components

    return attracting_components(_mod3_order_graph(spark, sf_dir)).select(
        "id", "component"
    )


_ATTRACTING_SQL = """
WITH RECURSIVE nn AS (SELECT count(*) AS n FROM customer),
e AS (
  SELECT DISTINCT o_custkey AS src, o_orderkey % (SELECT n FROM nn) AS dst
  FROM orders WHERE o_orderkey % 3 <> 0
),
nodes AS (SELECT c_custkey AS id FROM customer),
reach(a, b) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
),
scc AS (
  SELECT r1.a AS id, max(r1.b) AS component
  FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a
  GROUP BY r1.a
),
has_out AS (
  SELECT DISTINCT cs.component
  FROM e JOIN scc cs ON cs.id = e.src JOIN scc cd ON cd.id = e.dst
  WHERE cs.component <> cd.component
)
SELECT s.id, s.component FROM scc s
LEFT JOIN has_out h ON h.component = s.component
WHERE h.component IS NULL"""


def _c4_synth_docs(spark, sf_dir):
    """documents with deterministic line structure: ' table ' becomes
    a sentence break, every 17th doc gets a code brace, every 23rd a
    'lorem ipsum' — the corpus has no newlines/punctuation of its own,
    so the C4 rules need synthetic-but-deterministic structure to be a
    real check (oracle applies the identical expression)."""
    docs = _read_wide(spark, sf_dir, "documents")
    did = F.col("doc_id")
    synth = F.concat(
        F.when(F.pmod(did, F.lit(23)) == 0, F.lit("lorem ipsum ")).otherwise(
            F.lit("")
        ),
        F.replace(F.col("text"), F.lit(" table "), F.lit(".\n")),
        F.when(F.pmod(did, F.lit(17)) == 0, F.lit(" {")).otherwise(F.lit("")),
    )
    return docs.select("doc_id", synth.alias("text"))


def q_doc_c4_signals(spark, sf_dir):
    from linkgraph.functions.quality import c4_signals

    return c4_signals(_c4_synth_docs(spark, sf_dir)).select(
        "doc_id",
        "n_lines",
        "n_kept_lines",
        "n_sentences",
        "has_lorem_ipsum",
        "has_brace",
        "c4_keep",
    )


def q_doc_c4_clean(spark, sf_dir):
    from linkgraph.functions.quality import c4_clean

    return c4_clean(_c4_synth_docs(spark, sf_dir)).select("doc_id", "text")


_C4_SYNTH_SQL = """
synth AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 23 = 0 THEN 'lorem ipsum ' ELSE '' END)
    || replace(text, ' table ', '.' || chr(10))
    || (CASE WHEN doc_id % 17 = 0 THEN ' {' ELSE '' END) AS text
  FROM documents
),
kept AS (
  SELECT doc_id, text,
    len(string_split(text, chr(10))) AS n_lines,
    list_filter(string_split(text, chr(10)),
      ln -> right(trim(ln), 1) IN ('.', '!', '?', '"')
        AND len(regexp_split_to_array(trim(ln), '\\s+')) >= 5
        AND NOT contains(lower(ln), 'javascript')) AS kl
  FROM synth
),
sig AS (
  SELECT doc_id, text, n_lines,
    len(kl) AS n_kept_lines,
    CAST(length(coalesce(array_to_string(kl, chr(10)), ''))
      - length(translate(coalesce(array_to_string(kl, chr(10)), ''), '.!?', ''))
      AS BIGINT) AS n_sentences,
    contains(lower(text), 'lorem ipsum') AS has_lorem_ipsum,
    contains(text, '{') AS has_brace,
    coalesce(array_to_string(kl, chr(10)), '') AS kept_text
  FROM kept
)"""


_C4_SIGNALS_SQL = (
    "WITH "
    + _C4_SYNTH_SQL.lstrip()
    + """
SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
  CAST(n_kept_lines AS BIGINT) AS n_kept_lines, n_sentences,
  has_lorem_ipsum, has_brace,
  (NOT has_lorem_ipsum AND NOT has_brace AND n_sentences >= 3) AS c4_keep
FROM sig"""
)


_C4_CLEAN_SQL = (
    "WITH "
    + _C4_SYNTH_SQL.lstrip()
    + """
SELECT doc_id, kept_text AS text FROM sig
WHERE NOT has_lorem_ipsum AND NOT has_brace AND n_sentences >= 3"""
)


def q_doc_dsir_weights(spark, sf_dir):
    """DSIR importance log-weights (Xie et al. 2023) for every
    document against the English subset as the target distribution."""
    from linkgraph.functions.pipeline import dsir_logweights

    docs = _read_wide(spark, sf_dir, "documents")
    target = docs.where(F.col("lang") == "en")
    return dsir_logweights(docs, target, n_buckets=64).select(
        "doc_id", "n_grams", F.round("log_weight", 6).alias("log_weight_r")
    )


def _dsir_sql(n_buckets: int = 64) -> str:
    hex8 = _hex8_duck("md5(gram)")
    return f"""
WITH t AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS tk
  FROM documents WHERE length(trim(text)) > 0
),
grams AS (
  SELECT doc_id, lang, unnest(tk) AS gram FROM t
  UNION ALL
  SELECT doc_id, lang,
    unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i + 1]))
  FROM t
),
bkt AS (
  SELECT doc_id, lang, {hex8} % {n_buckets} AS bucket FROM grams
),
rawc AS (SELECT bucket, count(*) AS c FROM bkt GROUP BY bucket),
tgtc AS (SELECT bucket, count(*) AS c FROM bkt WHERE lang = 'en' GROUP BY bucket),
rt AS (SELECT sum(c) AS tot FROM rawc),
tt AS (SELECT sum(c) AS tot FROM tgtc),
buckets AS (SELECT unnest(range({n_buckets})) AS bucket),
ratio AS (
  SELECT b.bucket,
    (ln(coalesce(tc.c, 0) + 1.0) - ln((SELECT tot FROM tt) + {n_buckets}.0))
    - (ln(coalesce(rc.c, 0) + 1.0) - ln((SELECT tot FROM rt) + {n_buckets}.0))
    AS log_ratio
  FROM buckets b
  LEFT JOIN tgtc tc ON tc.bucket = b.bucket
  LEFT JOIN rawc rc ON rc.bucket = b.bucket
)
SELECT bkt.doc_id, count(*) AS n_grams,
  round(sum(r.log_ratio), 6) AS log_weight_r
FROM bkt JOIN ratio r ON r.bucket = bkt.bucket
GROUP BY bkt.doc_id"""


def q_embedding_semantic_dedup(spark, sf_dir):
    """SemDeDup survivorship over the embeddings table (threshold low
    enough that the synthetic corpus yields real near-dup groups)."""
    emb = _read_wide(spark, sf_dir, "embeddings")
    return sim.semantic_dedup(
        emb, threshold=0.3, n_centroids=8, kmeans_iters=2
    ).select("vec_id", "cluster", "is_survivor")


def _semantic_dedup_sql(
    dim: int = 64,
    n_centroids: int = 8,
    iters: int = 2,
    threshold: float = 0.3,
) -> str:
    """Mirror of ``similarity.semantic_dedup``: the `_ivf_sql` k-means
    unroll, within-cell pairs with cosine rounded to 6 >= threshold,
    transitive closure by recursive reachability, cluster = min
    reachable id, survivor = own cluster min."""
    d_expr = _sqdist_duck("e.ed", "c.c", dim)
    parts = [f"""
WITH RECURSIVE emb AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ed FROM embeddings
),
cent0 AS MATERIALIZED (
  SELECT vec_id AS cid, ed AS c FROM emb WHERE vec_id < {n_centroids}
)"""]
    for t in range(1, iters + 1):
        parts.append(f""",
asg{t} AS MATERIALIZED (
  SELECT vec_id, ed, cid FROM (
    SELECT e.vec_id, e.ed, c.cid,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY round({d_expr}, 6) ASC, c.cid ASC) AS rn
    FROM emb e CROSS JOIN cent{t - 1} c
  ) WHERE rn = 1
),
m{t} AS MATERIALIZED (
  SELECT cid, i AS pos, round(avg(ed[i]), 9) AS m
  FROM asg{t}, UNNEST(range(1, {dim + 1})) AS u(i)
  GROUP BY cid, i
),
cent{t} AS MATERIALIZED (
  SELECT c.cid, COALESCE(lst.l, c.c) AS c
  FROM cent{t - 1} c LEFT JOIN (
    SELECT cid, list(m ORDER BY pos) AS l FROM m{t} GROUP BY cid
  ) lst ON lst.cid = c.cid
)""")
    parts.append(f""",
fa AS MATERIALIZED (
  SELECT vec_id, ed, cid AS cluster FROM (
    SELECT e.vec_id, e.ed, c.cid,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY round({d_expr}, 6) ASC, c.cid ASC) AS rn
    FROM emb e CROSS JOIN cent{iters} c
  ) WHERE rn = 1
),
ed AS MATERIALIZED (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM fa a JOIN fa b ON b.cluster = a.cluster AND a.vec_id < b.vec_id
  WHERE round(list_dot_product(a.ed, b.ed)
    / greatest(sqrt(list_dot_product(a.ed, a.ed))
        * sqrt(list_dot_product(b.ed, b.ed)), 1e-300), 6) >= {threshold}
),
sym AS (
  SELECT id_a AS a, id_b AS b FROM ed
  UNION SELECT id_b, id_a FROM ed
),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON s.a = r.b WHERE s.b <> r.a
),
cl AS (
  SELECT e.vec_id,
    least(e.vec_id, coalesce(min(r.b), e.vec_id)) AS cluster
  FROM emb e LEFT JOIN reach r ON r.a = e.vec_id
  GROUP BY e.vec_id
)
SELECT vec_id, cluster, (vec_id = cluster) AS is_survivor FROM cl""")
    return "".join(parts)


def q_reaching_orders(spark, sf_dir):
    """Per-node local reaching centrality on the restricted order
    graph (directed unweighted reaching.py semantics)."""
    from linkgraph.operators.reaching import local_reaching_centrality

    return local_reaching_centrality(_mod3_order_graph(spark, sf_dir)).select(
        "id", F.round("lrc", 8).alias("lrc_r")
    )


def q_grc_orders(spark, sf_dir):
    from linkgraph.operators.reaching import global_reaching_centrality

    return global_reaching_centrality(_mod3_order_graph(spark, sf_dir)).select(
        F.round("grc", 8).alias("grc_r")
    )


_REACHING_CTE = """
WITH RECURSIVE nn AS (SELECT count(*) AS n FROM customer),
e AS (
  SELECT DISTINCT o_custkey AS src, o_orderkey % (SELECT n FROM nn) AS dst
  FROM orders WHERE o_orderkey % 3 <> 0
),
nodes AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer),
reach(a, b) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
),
lrc AS (
  SELECT n0.id,
    CAST(count(r.b) FILTER (r.b <> n0.id) AS DOUBLE)
      / ((SELECT n FROM nn) - 1) AS lrc
  FROM nodes n0 LEFT JOIN reach r ON r.a = n0.id
  GROUP BY n0.id
)"""


_REACHING_SQL = _REACHING_CTE + """
SELECT id, round(lrc, 8) AS lrc_r FROM lrc"""


_GRC_SQL = _REACHING_CTE + """
SELECT round(sum((SELECT max(lrc) FROM lrc) - lrc)
  / ((SELECT n FROM nn) - 1), 8) AS grc_r FROM lrc"""


def q_snap_orders(spark, sf_dir):
    """SNAP AR-compatible grouping of the order graph by market
    segment, 3 fixed refinement supersteps (idempotent past the
    fixpoint; the oracle unrolls the same 3 rounds)."""
    from linkgraph.operators.summarization import snap_groups

    g = order_graph(spark, sf_dir)
    attrs = _read(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("id"),
        F.col("c_mktsegment").alias("attr"),
    )
    return snap_groups(g, attrs, rounds=3).select("id", "group")


def _snap_sql(rounds: int = 3) -> str:
    parts = ["""
WITH nn AS (SELECT count(*) AS n FROM customer),
e AS (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
         CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT) AS dst
  FROM orders
),
l0 AS (
  SELECT CAST(c_custkey AS BIGINT) AS id, md5(c_mktsegment) AS label
  FROM customer
)"""]
    for t in range(1, rounds + 1):
        parts.append(f""",
s{t} AS (
  SELECT e.src AS id,
    array_to_string(list_sort(list_distinct(list(l.label || ':'))), '|') AS sig
  FROM e JOIN l{t - 1} l ON l.id = e.dst
  GROUP BY e.src
),
l{t} AS (
  SELECT l.id, md5(l.label || '|' || coalesce(s.sig, '')) AS label
  FROM l{t - 1} l LEFT JOIN s{t} s ON s.id = l.id
)""")
    parts.append(f"""
SELECT l.id, g.grp AS "group"
FROM l{rounds} l JOIN (
  SELECT label, min(id) AS grp FROM l{rounds} GROUP BY label
) g ON g.label = l.label""")
    return "".join(parts)


def q_aperiodic_orders(spark, sf_dir):
    """Markov-chain aperiodicity of the (strongly connected) order
    graph and periodicity of a directed nation ring — two driver
    booleans surfaced as one row."""
    from linkgraph.operators.strongly_connected import is_aperiodic

    g = order_graph(spark, sf_dir)
    dring = nation_ring_graph(spark, sf_dir, closed=True, directed=True)
    return spark.createDataFrame(
        [(bool(is_aperiodic(g)), bool(is_aperiodic(dring)))],
        "orders_aperiodic BOOLEAN, ring_aperiodic BOOLEAN",
    )


def _aperiodic_sql(rounds: int = 8) -> str:
    """BFS levels from the min-id source unrolled ``rounds`` min-relax
    steps (>= graph eccentricity), then period = gcd over all edges of
    level[u] - level[v] + 1 (tree-consistent edges contribute 0). The
    ring half: per-nation cycle length = nation size, gcd > 1 unless a
    nation has a single customer (self-loop)."""
    parts = ["""
WITH nn AS (SELECT count(*) AS n FROM customer),
nodes AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer),
e AS (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
         CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT) AS dst
  FROM orders
  WHERE o_custkey IN (SELECT id FROM nodes)
    AND o_orderkey % (SELECT n FROM nn) IN (SELECT id FROM nodes)
),
l0 AS (SELECT (SELECT min(id) FROM nodes) AS id, 0 AS l)"""]
    for t in range(1, rounds + 1):
        parts.append(f""",
l{t} AS (
  SELECT id, min(l) AS l FROM (
    SELECT id, l FROM l{t - 1}
    UNION ALL
    SELECT e.dst, p.l + 1 FROM l{t - 1} p JOIN e ON e.src = p.id
  ) GROUP BY id
)""")
    parts.append(f""",
diffs AS (
  SELECT DISTINCT lu.l - lv.l + 1 AS d
  FROM e JOIN l{rounds} lu ON lu.id = e.src JOIN l{rounds} lv ON lv.id = e.dst
)
SELECT
  (list_reduce(list_prepend(0, list(d)), (a, b) -> gcd(a, b)) = 1)
    AS orders_aperiodic,
  (SELECT count(*) = 1 FROM nation) AS ring_aperiodic
FROM diffs""")
    return "".join(parts)


def q_voronoi_orders(spark, sf_dir):
    """Outward Voronoi cells of the order graph from 5 fixed centers
    (min-center-id tie-break)."""
    from linkgraph.operators.traversal import voronoi_cells

    g = order_graph(spark, sf_dir)
    return voronoi_cells(g, [0, 1, 2, 3, 4]).select(
        "id", "center", F.col("dist").cast("long").alias("dist")
    )


def _voronoi_sql(rounds: int = 10, n_centers: int = 5) -> str:
    """Min-relax over encoded (dist, center) keys: enc = dist * 1e6 +
    center, so BIGINT min is lexicographic (dist, center) min — the
    engine's nearest-center-then-smallest-id rule."""
    parts = [f"""
WITH nn AS (SELECT count(*) AS n FROM customer),
nodes AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer),
e AS (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
         CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT) AS dst
  FROM orders
  WHERE o_custkey IN (SELECT id FROM nodes)
    AND o_orderkey % (SELECT n FROM nn) IN (SELECT id FROM nodes)
),
l0 AS (
  SELECT id, id AS enc FROM nodes WHERE id < {n_centers}
)"""]
    for t in range(1, rounds + 1):
        parts.append(f""",
l{t} AS (
  SELECT id, min(enc) AS enc FROM (
    SELECT id, enc FROM l{t - 1}
    UNION ALL
    SELECT e.dst, p.enc + 1000000 FROM l{t - 1} p JOIN e ON e.src = p.id
  ) GROUP BY id
)""")
    parts.append(f"""
SELECT id, enc % 1000000 AS center, enc // 1000000 AS dist FROM l{rounds}""")
    return "".join(parts)


def q_embedding_decontaminate(spark, sf_dir):
    """Semantic benchmark decontamination: corpus items too similar to
    the 8-vector 'benchmark' slice (broadcast side)."""
    from linkgraph.functions.pipeline import semantic_decontaminate

    emb = _read_wide(spark, sf_dir, "embeddings")
    bench = emb.where(F.col("vec_id") < 8)
    return semantic_decontaminate(emb, bench, threshold=0.35).select(
        "vec_id", "max_benchmark_sim", "contaminated"
    )


_EMB_DECONTAM_SQL = """
WITH emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ed FROM embeddings
),
bench AS (SELECT vec_id AS bid, ed AS bv FROM emb WHERE vec_id < 8),
scored AS (
  SELECT e.vec_id,
    max(round(list_dot_product(e.ed, b.bv)
      / greatest(sqrt(list_dot_product(e.ed, e.ed))
          * sqrt(list_dot_product(b.bv, b.bv)), 1e-300), 6))
      AS max_benchmark_sim
  FROM emb e CROSS JOIN bench b
  GROUP BY e.vec_id
)
SELECT vec_id, max_benchmark_sim,
  (max_benchmark_sim >= 0.35) AS contaminated
FROM scored"""


def q_salsa_orders(spark, sf_dir):
    """SALSA hubs/authorities at 6 fixed supersteps on the order
    graph."""
    from linkgraph.operators.hits import salsa

    g = order_graph(spark, sf_dir)
    return salsa(g, fixed_iter=6).select(
        "id",
        F.round("hub", 8).alias("hub_r"),
        F.round("authority", 8).alias("authority_r"),
    )


def q_salsa_orders_dist(spark, sf_dir):
    """Distributed-plan twin: local_max_edges=0 pins the normalized
    two-gather superstep plan (hits.py salsa) that runs at 100 TB."""
    from linkgraph.operators.hits import salsa

    g = order_graph(spark, sf_dir)
    return salsa(g, fixed_iter=6, local_max_edges=0).select(
        "id",
        F.round("hub", 8).alias("hub_r"),
        F.round("authority", 8).alias("authority_r"),
    )


def _salsa_sql(iters: int = 6) -> str:
    parts = ["""
WITH nn AS MATERIALIZED (SELECT count(*) AS n FROM customer),
nodes AS MATERIALIZED (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer),
e0 AS MATERIALIZED (
  SELECT CAST(o_custkey AS BIGINT) AS src,
         CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT) AS dst,
         CAST(count(*) AS DOUBLE) AS w
  FROM orders GROUP BY 1, 2
),
os AS MATERIALIZED (SELECT src, sum(w) AS os FROM e0 GROUP BY src),
ivs AS MATERIALIZED (SELECT dst, sum(w) AS iv FROM e0 GROUP BY dst),
e AS MATERIALIZED (
  SELECT e0.src, e0.dst, e0.w / os.os AS w_out, e0.w / ivs.iv AS w_in
  FROM e0 JOIN os ON os.src = e0.src JOIN ivs ON ivs.dst = e0.dst
),
h0 AS MATERIALIZED (
  SELECT id, 1.0 / (SELECT n FROM nn) AS hub FROM nodes
)"""]
    for t in range(1, iters + 1):
        parts.append(f""",
ar{t} AS MATERIALIZED (
  SELECT n0.id, COALESCE(g.v, 0.0) AS authority FROM nodes n0 LEFT JOIN (
    SELECT e.dst AS id, sum(h.hub * e.w_out) AS v
    FROM e JOIN h{t - 1} h ON h.id = e.src GROUP BY e.dst
  ) g ON g.id = n0.id
),
a{t} AS MATERIALIZED (
  SELECT id, authority / (SELECT sum(authority) FROM ar{t}) AS authority
  FROM ar{t}
),
hr{t} AS MATERIALIZED (
  SELECT n0.id, COALESCE(g.v, 0.0) AS hub FROM nodes n0 LEFT JOIN (
    SELECT e.src AS id, sum(a.authority * e.w_in) AS v
    FROM e JOIN a{t} a ON a.id = e.dst GROUP BY e.src
  ) g ON g.id = n0.id
),
h{t} AS MATERIALIZED (
  SELECT id, hub / (SELECT sum(hub) FROM hr{t}) AS hub FROM hr{t}
)""")
    parts.append(f"""
SELECT h.id, round(h.hub, 8) AS hub_r, round(a.authority, 8) AS authority_r
FROM h{iters} h JOIN a{iters} a ON a.id = h.id""")
    return "".join(parts)


def q_cocitation_orders(spark, sf_dir):
    from linkgraph.operators.links import cocitation

    g = order_graph(spark, sf_dir)
    return cocitation(g, min_count=2).select("a", "b", "n_citers")


def q_coupling_orders(spark, sf_dir):
    from linkgraph.operators.links import bibliographic_coupling

    g = order_graph(spark, sf_dir)
    return bibliographic_coupling(g, min_count=2).select(
        "a", "b", "n_shared_refs"
    )


_COCITATION_SQL = """
WITH nn AS (SELECT count(*) AS n FROM customer),
e AS (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
         CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT) AS dst
  FROM orders
)
SELECT x.dst AS a, y.dst AS b, count(*) AS n_citers
FROM e x JOIN e y ON y.src = x.src AND x.dst < y.dst
GROUP BY 1, 2 HAVING count(*) >= 2"""


_COUPLING_SQL = """
WITH nn AS (SELECT count(*) AS n FROM customer),
e AS (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
         CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT) AS dst
  FROM orders
)
SELECT x.src AS a, y.src AS b, count(*) AS n_shared_refs
FROM e x JOIN e y ON y.dst = x.dst AND x.src < y.src
GROUP BY 1, 2 HAVING count(*) >= 2"""


def q_trustrank_orders(spark, sf_dir):
    """TrustRank: teleport + dangling mass restricted to the BUILDING
    market-segment customers as the trusted seed set."""
    from linkgraph.operators.pagerank import trustrank

    g = order_graph(spark, sf_dir)
    seeds = _read(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    ).select(F.col("c_custkey").cast("long").alias("id"))
    return trustrank(g, seeds, alpha=PR_ALPHA, fixed_iter=PR_ITERS).select(
        "id", F.round("rank", 8).alias("rank_r")
    )


def _trustrank_sql(iters: int = PR_ITERS, alpha: float = PR_ALPHA) -> str:
    """`_ppr_sql` with the seed-indicator personalization (uniform
    over BUILDING customers), dangling weights = the same vector —
    the VLDB'04 TrustRank semantics the engine wrapper encodes."""
    head = f"""
WITH nn AS MATERIALIZED (SELECT count(*) AS n FROM customer),
e AS MATERIALIZED (SELECT o_custkey AS src, o_orderkey % (SELECT n FROM nn) AS dst FROM orders),
ec AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM e GROUP BY src, dst),
os AS MATERIALIZED (SELECT src, sum(w) AS s FROM ec GROUP BY src),
ne AS MATERIALIZED (SELECT ec.src, ec.dst, ec.w / os.s AS w FROM ec JOIN os ON os.src = ec.src),
nodes AS MATERIALIZED (SELECT c_custkey AS id FROM customer),
praw AS MATERIALIZED (
  SELECT c_custkey AS id,
    CASE WHEN c_mktsegment = 'BUILDING' THEN 1.0 ELSE 0.0 END AS v
  FROM customer),
p AS MATERIALIZED (SELECT id, v / (SELECT sum(v) FROM praw) AS p FROM praw),
dang AS MATERIALIZED (SELECT id FROM nodes WHERE id NOT IN (SELECT src FROM os)),
x0 AS MATERIALIZED (SELECT id, 1.0 / (SELECT n FROM nn) AS r FROM nodes)"""
    steps = []
    for i in range(iters):
        steps.append(f"""
x{i + 1} AS MATERIALIZED (
  SELECT p.id,
    {alpha} * (COALESCE(g.gathered, 0)
      + (SELECT COALESCE(sum(x.r), 0) FROM x{i} x JOIN dang d ON d.id = x.id)
        * p.p)
    + {1.0 - alpha} * p.p AS r
  FROM p
  LEFT JOIN (
    SELECT ne.dst AS id, sum(x.r * ne.w) AS gathered
    FROM x{i} x JOIN ne ON ne.src = x.id GROUP BY ne.dst
  ) g ON g.id = p.id
)""")
    return (
        head + "," + ",".join(steps)
        + f"\nSELECT id, round(r, 8) AS rank_r FROM x{iters}"
    )


def q_spam_mass_orders(spark, sf_dir):
    """Relative spam mass (pagerank.py ``spam_mass``; Gyöngyi et al.
    VLDB 2006) on the order graph, trusted core = BUILDING customers —
    the fraction of each page's rank not backed by the trusted seeds.
    Joins the two rank vectors the engine already computes (PageRank +
    TrustRank, same gather substrate)."""
    from linkgraph.operators.pagerank import spam_mass

    g = order_graph(spark, sf_dir)
    seeds = _read(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    ).select(F.col("c_custkey").cast("long").alias("id"))
    return spam_mass(g, seeds, alpha=PR_ALPHA, fixed_iter=PR_ITERS).select(
        "id",
        F.round("rank", 8).alias("rank_r"),
        F.round("trust_rank", 8).alias("trust_r"),
        F.round("spam_mass", 6).alias("spam_mass_r"),
    )


def _spam_mass_sql(iters: int = PR_ITERS, alpha: float = PR_ALPHA) -> str:
    """The `_pagerank_sql` (uniform) and `_trustrank_sql` (seed-
    biased) iteration chains side by side over shared graph CTEs,
    joined into the VLDB'06 relative-mass ratio."""
    head = f"""
WITH nn AS MATERIALIZED (SELECT count(*) AS n FROM customer),
e AS MATERIALIZED (SELECT o_custkey AS src, o_orderkey % (SELECT n FROM nn) AS dst FROM orders),
ec AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM e GROUP BY src, dst),
os AS MATERIALIZED (SELECT src, sum(w) AS s FROM ec GROUP BY src),
ne AS MATERIALIZED (SELECT ec.src, ec.dst, ec.w / os.s AS w FROM ec JOIN os ON os.src = ec.src),
nodes AS MATERIALIZED (SELECT c_custkey AS id FROM customer),
praw AS MATERIALIZED (
  SELECT c_custkey AS id,
    CASE WHEN c_mktsegment = 'BUILDING' THEN 1.0 ELSE 0.0 END AS v
  FROM customer),
p AS MATERIALIZED (SELECT id, v / (SELECT sum(v) FROM praw) AS p FROM praw),
dang AS MATERIALIZED (SELECT id FROM nodes WHERE id NOT IN (SELECT src FROM os)),
x0 AS MATERIALIZED (SELECT id, 1.0 / (SELECT n FROM nn) AS r FROM nodes),
y0 AS MATERIALIZED (SELECT id, 1.0 / (SELECT n FROM nn) AS r FROM nodes)"""
    steps = []
    for i in range(iters):
        steps.append(f"""
x{i + 1} AS MATERIALIZED (
  SELECT nodes.id,
    {alpha} * (COALESCE(g.gathered, 0)
      + (SELECT COALESCE(sum(x.r), 0) FROM x{i} x JOIN dang d ON d.id = x.id)
        * (1.0 / (SELECT n FROM nn)))
    + {1.0 - alpha} * (1.0 / (SELECT n FROM nn)) AS r
  FROM nodes
  LEFT JOIN (
    SELECT ne.dst AS id, sum(x.r * ne.w) AS gathered
    FROM x{i} x JOIN ne ON ne.src = x.id GROUP BY ne.dst
  ) g ON g.id = nodes.id
),
y{i + 1} AS MATERIALIZED (
  SELECT p.id,
    {alpha} * (COALESCE(g.gathered, 0)
      + (SELECT COALESCE(sum(y.r), 0) FROM y{i} y JOIN dang d ON d.id = y.id)
        * p.p)
    + {1.0 - alpha} * p.p AS r
  FROM p
  LEFT JOIN (
    SELECT ne.dst AS id, sum(y.r * ne.w) AS gathered
    FROM y{i} y JOIN ne ON ne.src = y.id GROUP BY ne.dst
  ) g ON g.id = p.id
)""")
    return (
        head + "," + ",".join(steps)
        + f"""
SELECT x.id, round(x.r, 8) AS rank_r, round(y.r, 8) AS trust_r,
       round((x.r - y.r) / x.r, 6) AS spam_mass_r
FROM x{iters} x JOIN y{iters} y ON y.id = x.id"""
    )


def q_skipgram_orders(spark, sf_dir):
    """Skip-gram (center, context, offset) pairs from the same walks
    as q_walks_orders, window 2 — the DeepWalk corpus step."""
    from linkgraph.operators.walks import random_walks, skipgram_pairs

    g = order_graph(spark, sf_dir)
    starts = g.vertices.where(F.pmod(F.col("id"), F.lit(10)) == 1).select("id")
    walks = random_walks(g, walk_length=6, seed=1, starts=starts)
    return (
        skipgram_pairs(walks, window=2)
        .groupBy("center", "context", "offset")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def _skipgram_sql(window: int = 2) -> str:
    """The `_walks_sql` replay wrapped as a derived table, self-joined
    on walk with the bounded step offset."""
    inner = _walks_sql()
    return f"""
WITH wt AS MATERIALIZED (SELECT * FROM ({inner}) _w)
SELECT a.node AS center, b.node AS context,
  CAST(b.step - a.step AS BIGINT) AS "offset",
  count(*) AS n_pairs
FROM wt a JOIN wt b ON b.walk = a.walk
  AND b.step BETWEEN a.step - {window} AND a.step + {window}
  AND b.step <> a.step
WHERE a.node <> b.node
GROUP BY 1, 2, 3"""


def q_moral_orders(spark, sf_dir):
    """Moralized order graph (moral.py): undirected edges + married
    co-parent pairs."""
    from linkgraph.operators.minors import moral_graph_edges

    g = order_graph(spark, sf_dir)
    return moral_graph_edges(g).select("src", "dst")


_MORAL_SQL = """
WITH nn AS (SELECT count(*) AS n FROM customer),
e AS (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
         CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT) AS dst
  FROM orders
  WHERE o_custkey <> o_orderkey % (SELECT n FROM nn)
),
married AS (
  SELECT x.src AS src, y.src AS dst
  FROM e x JOIN e y ON y.dst = x.dst AND x.src < y.src
),
canon AS (
  SELECT least(src, dst) AS src, greatest(src, dst) AS dst FROM e
  UNION SELECT src, dst FROM married
)
SELECT DISTINCT src, dst FROM canon"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank over the sf0.001-derived order graph."""
    return q_pagerank_orders(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # ---- driver-gate window: the driver hashes the FIRST 50 keys
        # (r5 rotation, VERDICT r4 next-round 2: 23 of these were never
        # driver-verified before; long-stable rows moved below retain
        # SELFCHECK coverage via tools/check_oracle.py over ALL keys) ----
        "pagerank_orders": q_pagerank_orders,
        "pagerank_orders_dist": q_pagerank_orders_dist,
        "cc_nation_chains": q_cc_nation_chains,
        "cc_nation_chains_dist": q_cc_nation_chains_dist,
        "component_sizes": q_component_sizes,
        "triangles_parts": q_triangles_parts,
        "triangles_parts_dist": q_triangles_parts_dist,
        "triangle_total_parts": q_triangle_total_parts,
        "transitivity_parts": q_transitivity_parts,
        "out_degree_orders": q_out_degree_orders,
        "hits_orders_dist": q_hits_orders_dist,
        "core_number_parts": q_core_number_parts,
        "core_number_parts_dist": q_core_number_parts_dist,
        "kcore_parts": q_kcore_parts,
        "clustering_parts": q_clustering_parts,
        "bfs_layers_orders": q_bfs_layers_orders,
        "scc_orders": q_scc_orders,
        "doc_exact_dedup": q_doc_exact_dedup,
        "doc_lsh_bands": q_doc_lsh_bands,
        "doc_near_dup_jaccard": q_doc_near_dup_jaccard,
        "doc_simhash": q_doc_simhash,
        "doc_span_dedup": q_doc_span_dedup,
        "embedding_topk": q_embedding_topk,
        "anchor_profile_orders": q_anchor_profile_orders,
        "spam_mass_orders": q_spam_mass_orders,
        "event_type_stats": q_event_type_stats,
        "tfidf_topk_docs": q_tfidf_topk_docs,
        "incremental_pagerank_epoch2": q_incremental_pagerank_epoch2,
        "incremental_cc_epoch2": q_incremental_cc_epoch2,
        "incremental_triangles_epoch2": q_incremental_triangles_epoch2,
        "incremental_reach_epoch2": q_incremental_reach_epoch2,
        "hyperball_orders": q_hyperball_orders,
        "hyperball_orders_b6": q_hyperball_orders_b6,
        "ktruss_parts": q_ktruss_parts,
        "ktruss_parts_dist": q_ktruss_parts_dist,
        "girth_parts": q_girth_parts,
        "betweenness_weighted_orders": q_betweenness_weighted_orders,
        "edge_betweenness_weighted_orders_dist": q_edge_betweenness_weighted_orders_dist,
        "doc_packing": q_doc_packing,
        "voterank_orders": q_voterank_orders,
        "eigenvector_orders_dist": q_eigenvector_orders_dist,
        "salsa_orders_dist": q_salsa_orders_dist,
        "trustrank_orders": q_trustrank_orders,
        "cocitation_orders": q_cocitation_orders,
        "doc_c4_signals": q_doc_c4_signals,
        "doc_dsir_weights": q_doc_dsir_weights,
        "doc_chunks": q_doc_chunks,
        "doc_decontaminate": q_doc_decontaminate,
        "doc_repetition": q_doc_repetition,
        "greedy_modularity_chains": q_greedy_modularity_chains,
        # ---- below the driver window (full coverage in SELFCHECK) ----
        "harmonic_sampled_orders_dist": q_harmonic_sampled_orders_dist,
        "degree_histogram_orders": q_degree_histogram_orders,
        "isolates_parts": q_isolates_parts,
        "selfloops_orders": q_selfloops_orders,
        "density_orders": q_density_orders,
        "mutual_edges_orders": q_mutual_edges_orders,
        "oneway_edges_orders": q_oneway_edges_orders,
        "compose_orders": q_compose_orders,
        "subgraph_high_balance": q_subgraph_high_balance,
        "hits_orders": q_hits_orders,
        "doc_dup_spans": q_doc_dup_spans,
        "doc_stats": q_doc_stats,
        "doc_lang_counts": q_doc_lang_counts,
        "embedding_quantized_topk": q_embedding_quantized_topk,
        "embedding_lsh_topk": q_embedding_lsh_topk,
        "flow_hierarchy_orders": q_flow_hierarchy_orders,
        "wl_hashes_chains": q_wl_hashes_chains,
        "node_class_chains": q_node_class_chains,
        "simrank_chains": q_simrank_chains,
        "lca_orders": q_lca_orders,
        "trophic_orders": q_trophic_orders,
        "mst_custlattice": q_mst_custlattice,
        "kclique_parts": q_kclique_parts,
        "numeric_assortativity_orders": q_numeric_assortativity_orders,
        "assortativity_parts": q_assortativity_parts,
        "link_embeddedness_parts": q_link_embeddedness_parts,
        "dispersion_orders": q_dispersion_orders,
        "embedding_near_pairs": q_embedding_near_pairs,
        "eigenvector_orders": q_eigenvector_orders,
        "ppr_orders": q_ppr_orders,
        "reciprocity_orders": q_reciprocity_orders,
        "overall_reciprocity_orders": q_overall_reciprocity_orders,
        "sssp_orders": q_sssp_orders,
        "sssp_tree_orders": q_sssp_tree_orders,
        "topo_generations_orders": q_topo_generations_orders,
        "embedding_ivf_topk": q_embedding_ivf_topk,
        "doc_fingerprints": q_doc_fingerprints,
        "closeness_orders": q_closeness_orders,
        "nation_quotient_orders": q_nation_quotient_orders,
        "part_projection": q_part_projection,
        "condensation_orders": q_condensation_orders,
        "topo_sort_orders": q_topo_sort_orders,
        "avg_nbr_degree_orders": q_avg_nbr_degree_orders,
        "betweenness_orders": q_betweenness_orders,
        "betweenness_orders_dist": q_betweenness_orders_dist,
        "betweenness_weighted_orders_dist": q_betweenness_weighted_orders_dist,
        "harmonic_sampled_orders": q_harmonic_sampled_orders,
        "hyperball_harmonic_orders": q_hyperball_harmonic_orders,
        "katz_orders": q_katz_orders,
        "katz_orders_dist": q_katz_orders_dist,
        "doc_dedup_clusters": q_doc_dedup_clusters,
        "walks_orders": q_walks_orders,
        "eccentricity_orders": q_eccentricity_orders,
        "distance_summary_orders": q_distance_summary_orders,
        "mis_orders": q_mis_orders,
        "mis_orders_dist": q_mis_orders_dist,
        "doc_training_mix": q_doc_training_mix,
        "node2vec_orders": q_node2vec_orders,
        "vertex_cover_orders": q_vertex_cover_orders,
        "local_bridges_parts": q_local_bridges_parts,
        "s_metric_parts": q_s_metric_parts,
        "rich_club_parts": q_rich_club_parts,
        "modularity_nations": q_modularity_nations,
        "onion_orders": q_onion_orders,
        "kshell_parts": q_kshell_parts,
        "avg_degree_connectivity_parts": q_avg_degree_connectivity_parts,
        "attr_assortativity_orders": q_attr_assortativity_orders,
        "degree_centrality_orders": q_degree_centrality_orders,
        "effective_size_parts": q_effective_size_parts,
        "edge_boundary_orders": q_edge_boundary_orders,
        "weighted_clustering_parts": q_weighted_clustering_parts,
        "bipartite_color_partsupp": q_bipartite_color_partsupp,
        "dag_longest_path_orders": q_dag_longest_path_orders,
        "dag_longest_path_orders_dist": q_dag_longest_path_orders_dist,
        "transitive_reduction_chains": q_transitive_reduction_chains,
        "attracting_orders": q_attracting_orders,
        "partition_quality_nations": q_partition_quality_nations,
        "doc_c4_clean": q_doc_c4_clean,
        "embedding_semantic_dedup": q_embedding_semantic_dedup,
        "reaching_orders": q_reaching_orders,
        "grc_orders": q_grc_orders,
        "snap_orders": q_snap_orders,
        "aperiodic_orders": q_aperiodic_orders,
        "voronoi_orders": q_voronoi_orders,
        "embedding_decontaminate": q_embedding_decontaminate,
        "salsa_orders": q_salsa_orders,
        "coupling_orders": q_coupling_orders,
        "skipgram_orders": q_skipgram_orders,
        "moral_orders": q_moral_orders,
        "triadic_census_orders": q_triadic_census_orders,
        "conductance_orders": q_conductance_orders,
        "edge_betweenness_orders": q_edge_betweenness_orders,
        "edge_betweenness_weighted_orders": q_edge_betweenness_weighted_orders,
        "constraint_parts": q_constraint_parts,
        "square_clustering_parts": q_square_clustering_parts,
        # rows-only: LPA's converged labels depend on the JP-coloring
        # update schedule (xxhash64 priorities — not SQL-expressible);
        # the pages pipeline's link structure derives from xxhash64 too.
        # Both are exact/1e-6-verified vs live networkx in pytest.
        "lpa_nation_chains": q_lpa_nation_chains,
        "lpa_nation_chains_dist": q_lpa_nation_chains_dist,
        "lpa_weighted_nation_chains": q_lpa_weighted_nation_chains,
        "incremental_communities_epoch2": q_incremental_communities_epoch2,
        "find_cycle_nations": q_find_cycle_nations,
        "find_cycle_nations_dist": q_find_cycle_nations_dist,
        "simple_cycles_orders": q_simple_cycles_orders,
        "louvain_parts": q_louvain_parts,
        "media_image_features": q_media_image_features,
        "doc_pii_scrub": q_doc_pii_scrub,
        "doc_unigram_logprob": q_doc_unigram_logprob,
        "event_sessions": q_event_sessions,
        "url_parts": q_url_parts,
        "link_sh_parts": q_link_sh_parts,
        "graph_recognition": q_graph_recognition,
        "doc_split": q_doc_split,
        "doc_stratified_sample": q_doc_stratified_sample,
        "bridges_suppliers": q_bridges_suppliers,
        "articulation_suppliers": q_articulation_suppliers,
        "biconn_labels_suppliers": q_biconn_labels_suppliers,
        "pages_pipeline_pagerank": q_pages_pipeline_pagerank,
    }


# ------------------------------------------------------------- oracle SQL
_EDGES_CTE = """
nn AS (SELECT count(*) AS n FROM customer),
e AS (SELECT o_custkey AS src, o_orderkey % (SELECT n FROM nn) AS dst FROM orders),
e2k AS (SELECT DISTINCT src, dst FROM e)
"""

_PAIRS_CTE = """
pairs AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
"""

_TRI_CTE = _PAIRS_CTE + """,
tri AS (
  SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
  FROM pairs e1
  JOIN pairs e2 ON e2.src = e1.dst
  JOIN pairs e3 ON e3.src = e1.src AND e3.dst = e2.dst
)
"""


def _hyperball_sql(b: int = 4, t: int = 3) -> str:
    """Unrolled HyperBall supersteps over the order graph: register
    init from the 60-bit md5-prefix hash (identical integer primitives
    in Spark and DuckDB — substr(md5)→BIGINT, %, >>, bit_count), then
    t rounds of UNION ALL self+neighbor registers → per-id column-wise
    max. Compares exact integers only; the float estimate is excluded
    by design (hyperball.py module docstring)."""
    m = 1 << b
    rcols = [f"r{i}" for i in range(m)]
    rlist = ", ".join(rcols)
    init_regs = ",\n    ".join(
        f"CAST(CASE WHEN j = {i} THEN rho ELSE 0 END AS INTEGER) AS r{i}"
        for i in range(m)
    )
    head = f"""
WITH nn AS MATERIALIZED (SELECT count(*) AS n FROM customer),
e AS MATERIALIZED (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
         CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT) AS dst
  FROM orders),
nodes AS MATERIALIZED (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer),
h AS MATERIALIZED (
  SELECT id,
         ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM nodes),
hb AS MATERIALIZED (
  SELECT id, hv % {m} AS j,
         CAST(CASE WHEN (hv >> {b}) = 0 THEN {61 - b}
              ELSE bit_count((((hv >> {b})) & -((hv >> {b}))) - 1) + 1 END
              AS INTEGER) AS rho
  FROM h),
g0 AS MATERIALIZED (
  SELECT id,
    {init_regs}
  FROM hb)"""
    steps = []
    for k in range(t):
        maxes = ", ".join(f"max(r{i}) AS r{i}" for i in range(m))
        steps.append(f"""
g{k + 1} AS MATERIALIZED (
  SELECT id, {maxes} FROM (
    SELECT id, {rlist} FROM g{k}
    UNION ALL
    SELECT e.src AS id, {rlist} FROM e JOIN g{k} g ON g.id = e.dst
  ) u GROUP BY id)""")
    reg_sum = " + ".join(rcols)
    return (
        head
        + ","
        + ",".join(steps)
        + f"\nSELECT id, {rlist}, CAST({reg_sum} AS INT) AS reg_sum FROM g{t}"
    )


def _pagerank_sql(iters: int = PR_ITERS, alpha: float = PR_ALPHA) -> str:
    # every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and the
    # iteration chain references x{{i}} twice (gather + danglesum), so
    # inlining would expand the plan 2^iters times
    head = f"""
WITH nn AS MATERIALIZED (SELECT count(*) AS n FROM customer),
e AS MATERIALIZED (SELECT o_custkey AS src, o_orderkey % (SELECT n FROM nn) AS dst FROM orders),
ec AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM e GROUP BY src, dst),
os AS MATERIALIZED (SELECT src, sum(w) AS s FROM ec GROUP BY src),
ne AS MATERIALIZED (SELECT ec.src, ec.dst, ec.w / os.s AS w FROM ec JOIN os ON os.src = ec.src),
nodes AS MATERIALIZED (SELECT c_custkey AS id FROM customer),
dang AS MATERIALIZED (SELECT id FROM nodes WHERE id NOT IN (SELECT src FROM os)),
x0 AS MATERIALIZED (SELECT id, 1.0 / (SELECT n FROM nn) AS r FROM nodes)"""
    steps = []
    for i in range(iters):
        steps.append(f"""
x{i + 1} AS MATERIALIZED (
  SELECT nodes.id,
    {alpha} * (COALESCE(g.gathered, 0)
      + (SELECT COALESCE(sum(x.r), 0) FROM x{i} x JOIN dang d ON d.id = x.id)
        * (1.0 / (SELECT n FROM nn)))
    + {1.0 - alpha} * (1.0 / (SELECT n FROM nn)) AS r
  FROM nodes
  LEFT JOIN (
    SELECT ne.dst AS id, sum(x.r * ne.w) AS gathered
    FROM x{i} x JOIN ne ON ne.src = x.id GROUP BY ne.dst
  ) g ON g.id = nodes.id
)""")
    return (
        head + "," + ",".join(steps)
        + f"\nSELECT id, round(r, 8) AS rank_r FROM x{iters}"
    )


def _pipeline_pagerank_sql(iters: int = 5, alpha: float = PR_ALPHA) -> str:
    """Oracle for the full ingest pipeline: the Spark side renders html
    from the orders edge list and parses it back (render -> extract
    round-trip); the oracle derives the same graph directly from the
    parquet tables, filters links to uncrawled pages (dst not a
    customer => graph_from_pages drops them BEFORE out-strength
    normalization), and unrolls the same fixed-iteration PageRank."""
    head = f"""
WITH nn AS MATERIALIZED (SELECT count(*) AS n FROM customer),
nodes AS MATERIALIZED (SELECT c_custkey AS id FROM customer),
e AS MATERIALIZED (
  SELECT o_custkey AS src, o_orderkey % (SELECT n FROM nn) AS dst FROM orders
  WHERE (o_orderkey % (SELECT n FROM nn)) IN (SELECT id FROM nodes)),
ec AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM e GROUP BY src, dst),
os AS MATERIALIZED (SELECT src, sum(w) AS s FROM ec GROUP BY src),
ne AS MATERIALIZED (SELECT ec.src, ec.dst, ec.w / os.s AS w FROM ec JOIN os ON os.src = ec.src),
dang AS MATERIALIZED (SELECT id FROM nodes WHERE id NOT IN (SELECT src FROM os)),
x0 AS MATERIALIZED (SELECT id, 1.0 / (SELECT n FROM nn) AS r FROM nodes)"""
    steps = []
    for i in range(iters):
        steps.append(f"""
x{i + 1} AS MATERIALIZED (
  SELECT nodes.id,
    {alpha} * (COALESCE(g.gathered, 0)
      + (SELECT COALESCE(sum(x.r), 0) FROM x{i} x JOIN dang d ON d.id = x.id)
        * (1.0 / (SELECT n FROM nn)))
    + {1.0 - alpha} * (1.0 / (SELECT n FROM nn)) AS r
  FROM nodes
  LEFT JOIN (
    SELECT ne.dst AS id, sum(x.r * ne.w) AS gathered
    FROM x{i} x JOIN ne ON ne.src = x.id GROUP BY ne.dst
  ) g ON g.id = nodes.id
)""")
    return (
        head + "," + ",".join(steps)
        + f"""
SELECT 'https://test.example/ord/' || CAST(id AS VARCHAR) AS url,
       round(r, 8) AS rank_r FROM x{iters}"""
    )


def _incremental_pagerank_sql(iters: int = 5, alpha: float = PR_ALPHA) -> str:
    """Full SQL replay of the two-epoch warm-started serving refresh
    (q_incremental_pagerank_epoch2): unrolled epoch-1 PageRank on the
    custkey%4!=0 subgraph (un-crawled link targets dropped BEFORE
    out-strength normalization, exactly graph_from_pages), then the
    warm-start step — coalesce-to-0 for new pages, renormalized by the
    seed vector's own sum (pagerank_alg.py:139-154) — then unrolled
    epoch-2 iterations on the full graph. Every CTE MATERIALIZED (the
    chain references each x{i} twice; DuckDB would inline plain CTEs
    exponentially)."""
    head = f"""
WITH nn AS MATERIALIZED (SELECT count(*) AS n FROM customer),
e_all AS MATERIALIZED (
  SELECT o_custkey AS src, o_orderkey % (SELECT n FROM nn) AS dst FROM orders),
nodes1 AS MATERIALIZED (SELECT c_custkey AS id FROM customer WHERE c_custkey % 4 <> 0),
n1 AS MATERIALIZED (SELECT count(*) AS n FROM nodes1),
e1 AS MATERIALIZED (
  SELECT src, dst FROM e_all
  WHERE src % 4 <> 0 AND dst IN (SELECT id FROM nodes1)),
ec1 AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM e1 GROUP BY src, dst),
os1 AS MATERIALIZED (SELECT src, sum(w) AS s FROM ec1 GROUP BY src),
ne1 AS MATERIALIZED (SELECT ec1.src, ec1.dst, ec1.w / os1.s AS w FROM ec1 JOIN os1 ON os1.src = ec1.src),
dang1 AS MATERIALIZED (SELECT id FROM nodes1 WHERE id NOT IN (SELECT src FROM os1)),
y0 AS MATERIALIZED (SELECT id, 1.0 / (SELECT n FROM n1) AS r FROM nodes1)"""
    steps = []
    for i in range(iters):
        steps.append(f"""
y{i + 1} AS MATERIALIZED (
  SELECT nodes1.id,
    {alpha} * (COALESCE(g.gathered, 0)
      + (SELECT COALESCE(sum(x.r), 0) FROM y{i} x JOIN dang1 d ON d.id = x.id)
        * (1.0 / (SELECT n FROM n1)))
    + {1.0 - alpha} * (1.0 / (SELECT n FROM n1)) AS r
  FROM nodes1
  LEFT JOIN (
    SELECT ne1.dst AS id, sum(x.r * ne1.w) AS gathered
    FROM y{i} x JOIN ne1 ON ne1.src = x.id GROUP BY ne1.dst
  ) g ON g.id = nodes1.id
)""")
    mid = f"""
nodes AS MATERIALIZED (SELECT c_custkey AS id FROM customer),
e2 AS MATERIALIZED (
  SELECT src, dst FROM e_all WHERE dst IN (SELECT id FROM nodes)),
ec AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM e2 GROUP BY src, dst),
os AS MATERIALIZED (SELECT src, sum(w) AS s FROM ec GROUP BY src),
ne AS MATERIALIZED (SELECT ec.src, ec.dst, ec.w / os.s AS w FROM ec JOIN os ON os.src = ec.src),
dang AS MATERIALIZED (SELECT id FROM nodes WHERE id NOT IN (SELECT src FROM os)),
seedsum AS MATERIALIZED (SELECT sum(r) AS s FROM y{iters}),
x0 AS MATERIALIZED (
  SELECT nodes.id, COALESCE(y.r, 0) / (SELECT s FROM seedsum) AS r
  FROM nodes LEFT JOIN y{iters} y ON y.id = nodes.id)"""
    for i in range(iters):
        steps.append(f"""
x{i + 1} AS MATERIALIZED (
  SELECT nodes.id,
    {alpha} * (COALESCE(g.gathered, 0)
      + (SELECT COALESCE(sum(x.r), 0) FROM x{i} x JOIN dang d ON d.id = x.id)
        * (1.0 / (SELECT n FROM nn)))
    + {1.0 - alpha} * (1.0 / (SELECT n FROM nn)) AS r
  FROM nodes
  LEFT JOIN (
    SELECT ne.dst AS id, sum(x.r * ne.w) AS gathered
    FROM x{i} x JOIN ne ON ne.src = x.id GROUP BY ne.dst
  ) g ON g.id = nodes.id
)""")
    phase1 = ",".join(steps[:iters])
    phase2 = ",".join(steps[iters:])
    return (
        head + "," + phase1 + "," + mid + "," + phase2
        + f"""
SELECT 'https://test.example/incrpr/' || CAST(id AS VARCHAR) AS url,
       round(r, 8) AS rank_r FROM x{iters}"""
    )


def _incremental_reach_sql(b: int = 4, t: int = 4) -> str:
    """Two-phase unrolled HyperBall replay for the warm-started reach
    serving (q_incremental_reach_epoch2): epoch-1 supersteps on the
    custkey%4!=0 subgraph, registers hashed from the URL STRING (the
    serving table's rebuild-stable key — this is what makes warm
    sketches valid lower bounds), then the warm-start step (per-register
    GREATEST of a fresh full-graph init against the epoch-1 registers,
    new pages at 0), then epoch-2 supersteps on the full graph. Exact
    integers throughout — max-merge is idempotent, so an early-stopped
    Spark loop and the fixed unrolled depth agree whenever t covers the
    saturation point (t here ≥ both phases' superstep counts by
    construction of the fixture)."""
    m = 1 << b
    rcols = [f"r{i}" for i in range(m)]
    rlist = ", ".join(rcols)

    def init_block(nodes: str, sfx: str) -> str:
        url = f"'https://test.example/incrreach/' || CAST(id AS VARCHAR)"
        init_regs = ",\n    ".join(
            f"CAST(CASE WHEN j = {i} THEN rho ELSE 0 END AS INTEGER) AS r{i}"
            for i in range(m)
        )
        return f"""
h{sfx} AS MATERIALIZED (
  SELECT id, ('0x' || substr(md5({url}), 1, 15))::BIGINT AS hv
  FROM {nodes}),
hb{sfx} AS MATERIALIZED (
  SELECT id, hv % {m} AS j,
         CAST(CASE WHEN (hv >> {b}) = 0 THEN {61 - b}
              ELSE bit_count((((hv >> {b})) & -((hv >> {b}))) - 1) + 1 END
              AS INTEGER) AS rho
  FROM h{sfx}),
init{sfx} AS MATERIALIZED (
  SELECT id,
    {init_regs}
  FROM hb{sfx})"""

    def rounds(prefix: str, start: str, edges: str, n: int) -> str:
        out = []
        prev = start
        for k in range(n):
            maxes = ", ".join(f"max(r{i}) AS r{i}" for i in range(m))
            name = f"{prefix}{k + 1}"
            out.append(f"""
{name} AS MATERIALIZED (
  SELECT id, {maxes} FROM (
    SELECT id, {rlist} FROM {prev}
    UNION ALL
    SELECT e.src AS id, {rlist} FROM {edges} e JOIN {prev} g ON g.id = e.dst
  ) u GROUP BY id)""")
            prev = name
        return ",".join(out), prev

    head = f"""
WITH nn AS MATERIALIZED (SELECT count(*) AS n FROM customer),
e_all AS MATERIALIZED (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
         CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT) AS dst
  FROM orders),
nodes1 AS MATERIALIZED (
  SELECT CAST(c_custkey AS BIGINT) AS id FROM customer WHERE c_custkey % 4 <> 0),
e1 AS MATERIALIZED (
  SELECT src, dst FROM e_all
  WHERE src % 4 <> 0 AND dst IN (SELECT id FROM nodes1)),
nodes AS MATERIALIZED (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer),
e2 AS MATERIALIZED (
  SELECT src, dst FROM e_all WHERE dst IN (SELECT id FROM nodes)),
{init_block('nodes1', '1')[1:]},
{init_block('nodes', 'f')[1:]}"""
    r1, last1 = rounds("y", "init1", "e1", t)
    warm = f""",
w0 AS MATERIALIZED (
  SELECT initf.id,
    {", ".join(f"GREATEST(initf.r{i}, COALESCE(y.r{i}, 0)) AS r{i}" for i in range(m))}
  FROM initf LEFT JOIN {last1} y ON y.id = initf.id)"""
    r2, last2 = rounds("x", "w0", "e2", t)
    reg_sum = " + ".join(rcols)
    final_regs = ", ".join(f"CAST(r{i} AS INTEGER) AS r{i}" for i in range(m))
    return (
        head + "," + r1 + warm + "," + r2
        + f"""
SELECT 'https://test.example/incrreach/' || CAST(id AS VARCHAR) AS url,
       {final_regs}, CAST({reg_sum} AS INT) AS reg_sum FROM {last2}"""
    )


def _hits_sql(iters: int = 8) -> str:
    """Mirror of _hits_python (networkx hits_alg.py:104-152) at fixed
    iterations: a = A^T h, h = A a, both max-normalized per iteration,
    sum-normalized at the end. Weights = parallel-edge counts."""
    head = """
WITH nn AS MATERIALIZED (SELECT count(*) AS n FROM customer),
e AS MATERIALIZED (SELECT o_custkey AS src, o_orderkey % (SELECT n FROM nn) AS dst FROM orders),
ec AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM e GROUP BY src, dst),
nodes AS MATERIALIZED (SELECT c_custkey AS id FROM customer),
h0 AS MATERIALIZED (SELECT id, 1.0 / (SELECT n FROM nn) AS r FROM nodes)"""
    steps = []
    for i in range(iters):
        steps.append(f"""
ar{i} AS MATERIALIZED (
  SELECT nodes.id, COALESCE(g.v, 0) AS r FROM nodes LEFT JOIN (
    SELECT ec.dst AS id, sum(h.r * ec.w) AS v
    FROM h{i} h JOIN ec ON ec.src = h.id GROUP BY ec.dst
  ) g ON g.id = nodes.id
),
a{i + 1} AS MATERIALIZED (
  SELECT id, CASE WHEN (SELECT max(abs(r)) FROM ar{i}) > 0
    THEN r / (SELECT max(abs(r)) FROM ar{i}) ELSE r END AS r FROM ar{i}
),
hr{i} AS MATERIALIZED (
  SELECT nodes.id, COALESCE(g.v, 0) AS r FROM nodes LEFT JOIN (
    SELECT ec.src AS id, sum(a.r * ec.w) AS v
    FROM a{i + 1} a JOIN ec ON ec.dst = a.id GROUP BY ec.src
  ) g ON g.id = nodes.id
),
h{i + 1} AS MATERIALIZED (
  SELECT id, CASE WHEN (SELECT max(abs(r)) FROM hr{i}) > 0
    THEN r / (SELECT max(abs(r)) FROM hr{i}) ELSE r END AS r FROM hr{i}
)""")
    return (
        head + "," + ",".join(steps)
        + f"""
SELECT h.id,
  round(CASE WHEN (SELECT sum(r) FROM h{iters}) <> 0
    THEN h.r / (SELECT sum(r) FROM h{iters}) ELSE h.r END, 8) AS hub_r,
  round(CASE WHEN (SELECT sum(r) FROM a{iters}) <> 0
    THEN a.r / (SELECT sum(r) FROM a{iters}) ELSE a.r END, 8) AS auth_r
FROM h{iters} h JOIN a{iters} a ON a.id = h.id"""
    )


def _lang_scores_sql(col: str = "text") -> tuple[str, str]:
    """(select-list fragment computing s_<lang> columns, CASE expr)."""
    frags = []
    for lang, words in sorted(tx.STOPWORDS.items()):
        terms = []
        for w in words:
            needle = f" {w} "
            terms.append(
                f"CAST((length(' ' || lower({col}) || ' ') - "
                f"length(replace(' ' || lower({col}) || ' ', '{needle}', ''))) "
                f"/ {len(needle)} AS BIGINT)"
            )
        frags.append("(" + " + ".join(terms) + f") AS s_{lang}")
    langs = sorted(tx.STOPWORDS)  # de, en, es, fr
    case = (
        "CASE WHEN " + " AND ".join(f"s_{l} <= 0" for l in langs) + " THEN 'und' "
        "ELSE (CASE "
    )
    for i, l in enumerate(langs[:-1]):
        conds = " AND ".join(f"s_{l} >= s_{m}" for m in langs[i + 1:])
        case += f"WHEN {conds} THEN '{l}' "
    case += f"ELSE '{langs[-1]}' END) END"
    return ", ".join(frags), case


def _minhash_cte(num_hashes: int = 8) -> str:
    mins = ", ".join(
        f"min(md5('{s}|' || s)) AS h{s}" for s in range(num_hashes)
    )
    return f"""
toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
sh AS (
  SELECT doc_id, array_to_string(t[i:i+2], ' ') AS s
  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 3
),
mh AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id)
"""


def _bands_sql() -> str:
    rows = []
    for b in range(4):
        rows.append(
            f"SELECT d.doc_id AS id, {b} AS band, "
            f"md5(concat_ws('|', mh.h{2 * b}, mh.h{2 * b + 1})) AS key "
            "FROM documents d LEFT JOIN mh ON mh.doc_id = d.doc_id"
        )
    return f"WITH {_minhash_cte(8)} " + " UNION ALL ".join(rows)


def _simhash_sql() -> str:
    hi_terms, lo_terms, vote_cols = [], [], []
    for b in range(64):
        d, shift = divmod(b, 4)
        bit = (
            f"(((instr('0123456789abcdef', substr(hx, {d + 1}, 1)) - 1) "
            f">> {shift}) & 1)"
        )
        vote_cols.append(
            f"sum(CASE WHEN {bit} = 1 THEN 1 ELSE -1 END) AS v{b}"
        )
        term = f"CASE WHEN v{b} > 0 THEN (1::BIGINT << {b % 32}) ELSE 0 END"
        (hi_terms if b >= 32 else lo_terms).append(term)
    return f"""
WITH tk AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok FROM documents),
h AS (SELECT doc_id, md5(tok) AS hx FROM tk),
bits AS (SELECT doc_id, {", ".join(vote_cols)} FROM h GROUP BY doc_id)
SELECT doc_id, {" + ".join(hi_terms)} AS simhash_hi, {" + ".join(lo_terms)} AS simhash_lo
FROM bits"""


def _jaccard_pairs_sql() -> str:
    # bt built from documents LEFT JOIN mh (not mh alone) so <3-token
    # docs get band keys (md5 of empty concat) exactly as the engine's
    # minhash_candidate_pairs does — keeps this oracle consistent with
    # _bands_sql on short-doc corpora
    return f"""
WITH {_minhash_cte(8)},
bt AS (
  SELECT d.doc_id AS id, 0 AS band, md5(concat_ws('|', mh.h0, mh.h1)) AS key
  FROM documents d LEFT JOIN mh ON mh.doc_id = d.doc_id
  UNION ALL SELECT d.doc_id, 1, md5(concat_ws('|', mh.h2, mh.h3))
  FROM documents d LEFT JOIN mh ON mh.doc_id = d.doc_id
  UNION ALL SELECT d.doc_id, 2, md5(concat_ws('|', mh.h4, mh.h5))
  FROM documents d LEFT JOIN mh ON mh.doc_id = d.doc_id
  UNION ALL SELECT d.doc_id, 3, md5(concat_ws('|', mh.h6, mh.h7))
  FROM documents d LEFT JOIN mh ON mh.doc_id = d.doc_id
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bt a JOIN bt b ON a.band = b.band AND a.key = b.key AND a.id < b.id
),
sets AS (
  SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS tk
  FROM documents
)
SELECT c.id_a, c.id_b,
  round(CAST(len(list_intersect(sa.tk, sb.tk)) AS DOUBLE)
    / greatest(len(list_distinct(list_concat(sa.tk, sb.tk))), 1), 8) AS jaccard_r
FROM cand c
JOIN sets sa ON sa.doc_id = c.id_a
JOIN sets sb ON sb.doc_id = c.id_b"""


def _mis_sql(rounds: int = 8, seed: int = 0) -> str:
    """Replay of ``maximal_independent_set``: unrolled Luby rounds.
    (p, id) lexicographic order is encoded as ck = p*2^20 + id —
    exact while id < 2^20, true at the oracle's scale factors (the
    engine itself compares the struct, scale-safe). Extra rounds
    beyond convergence are no-ops on an empty undecided set."""
    from linkgraph.operators.independent_set import _A, _MIX_MOD, _P

    parts = [
        "WITH nn AS MATERIALIZED (SELECT count(*) AS n FROM customer),",
        "eraw AS MATERIALIZED (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,"
        " CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT) AS dst FROM orders),",
        "e2 AS MATERIALIZED (SELECT eraw.src, eraw.dst FROM eraw"
        " JOIN customer b ON b.c_custkey = eraw.dst WHERE eraw.src <> eraw.dst),",
        "ee AS MATERIALIZED (SELECT src, dst FROM e2 UNION SELECT dst, src FROM e2),",
        f"u0 AS MATERIALIZED (SELECT CAST(c_custkey AS BIGINT) AS id,"
        f" (({_A} * (c_custkey % {_MIX_MOD}) + {seed}) % {_P}) * 1048576"
        f" + c_custkey AS ck FROM customer),",
    ]
    for r in range(rounds):
        parts.append(
            f"w{r} AS MATERIALIZED (SELECT u.id FROM u{r} u LEFT JOIN ("
            f"SELECT e.src AS id, MIN(ud.ck) AS mck"
            f" FROM ee e JOIN u{r} ud ON ud.id = e.dst"
            f" WHERE e.src IN (SELECT id FROM u{r}) GROUP BY e.src"
            f") nb ON nb.id = u.id WHERE nb.mck IS NULL OR u.ck < nb.mck),"
        )
        parts.append(
            f"u{r + 1} AS MATERIALIZED (SELECT * FROM u{r} WHERE id NOT IN ("
            f"SELECT id FROM w{r}"
            f" UNION SELECT e.dst FROM ee e JOIN w{r} w ON w.id = e.src)),"
        )
    acc = " UNION ALL ".join(f"SELECT id FROM w{r}" for r in range(rounds))
    parts.append(f"mis AS MATERIALIZED ({acc})")
    parts.append(
        "SELECT CAST(c.c_custkey AS BIGINT) AS id,"
        " c.c_custkey IN (SELECT id FROM mis) AS in_mis FROM customer c"
    )
    return "\n".join(parts)


_MSB_CTE = """nn AS (SELECT count(*) AS n FROM customer),
eraw AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
  CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT) AS dst FROM orders),
ee AS (SELECT eraw.src, eraw.dst FROM eraw
  JOIN customer b ON b.c_custkey = eraw.dst),
r(s, id, layer) AS (
  SELECT CAST(c_custkey AS BIGINT), CAST(c_custkey AS BIGINT), 0
  FROM customer WHERE c_custkey % {src_mod} = 1
  UNION
  SELECT r.s, ee.dst, r.layer + 1 FROM r JOIN ee ON ee.src = r.id
  WHERE r.layer < {max_layer}
),
d AS (SELECT s, id, MIN(layer) AS l FROM r GROUP BY s, id)"""


def _eccentricity_sql(src_mod: int = 25, max_layer: int = 7) -> str:
    """Per-pivot reachable-set eccentricity from the multi-source BFS
    closure (same recursive CTE as ``_harmonic_sampled_sql``)."""
    return (
        "WITH RECURSIVE "
        + _MSB_CTE.format(src_mod=src_mod, max_layer=max_layer)
        + """
SELECT s AS source, MAX(l) AS ecc, count(*) AS n_reached
FROM d GROUP BY s"""
    )


def _distance_summary_sql(src_mod: int = 25, max_layer: int = 7) -> str:
    """Diameter/radius bounds + sampled global efficiency from the
    same closure: eff = Σ 1/l / (k·(n-1))."""
    return (
        "WITH RECURSIVE "
        + _MSB_CTE.format(src_mod=src_mod, max_layer=max_layer)
        + """,
ecc AS (SELECT s, MAX(l) AS e FROM d GROUP BY s),
k AS (SELECT count(*) AS k FROM ecc)
SELECT (SELECT MAX(e) FROM ecc) AS diameter_lb,
  (SELECT MIN(e) FROM ecc) AS radius_ub,
  round((SELECT COALESCE(SUM(1.0 / l), 0) FROM d WHERE l > 0)
    / ((SELECT k FROM k) * ((SELECT n FROM nn) - 1)), 8) AS global_efficiency_r"""
    )


def _walks_sql(steps: int = 6, seed: int = 1, start_mod: int = 10) -> str:
    """Replay of ``random_walks`` (walks.py): CSR neighbor order =
    row_number() over (src ORDER BY dst); choice = the same LCG mix
    mod out-degree (all terms nonnegative, so `%` == pmod)."""
    from linkgraph.operators.walks import _A, _B, _C, _MIX_MOD

    parts = [
        "WITH nn AS MATERIALIZED (SELECT count(*) AS n FROM customer),",
        "eraw AS MATERIALIZED (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,"
        " CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT) AS dst FROM orders),",
        "ee AS MATERIALIZED (SELECT eraw.src, eraw.dst FROM eraw"
        " JOIN customer b ON b.c_custkey = eraw.dst),",
        "adj AS MATERIALIZED (SELECT src, dst,"
        " row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx,"
        " count(*) OVER (PARTITION BY src) AS deg FROM ee),",
        f"w0 AS MATERIALIZED (SELECT CAST(c_custkey AS BIGINT) AS walk,"
        f" CAST(c_custkey AS BIGINT) AS node"
        f" FROM customer WHERE c_custkey % {start_mod} = 1),",
    ]
    for i in range(1, steps + 1):
        parts.append(
            f"w{i} AS MATERIALIZED (SELECT w.walk, a.dst AS node"
            f" FROM w{i-1} w JOIN adj a ON a.src = w.node"
            f" AND a.idx = ({_A} * (w.node % {_MIX_MOD})"
            f" + {_B} * (w.walk % {_MIX_MOD})"
            f" + {_C * i + seed}) % a.deg),"
        )
    acc = " UNION ALL ".join(
        f"SELECT walk, {i} AS step, node FROM w{i}" for i in range(steps + 1)
    )
    sql = "\n".join(parts).rstrip(",") + f"\n{acc}"
    return sql


def _node2vec_sql(
    steps: int = 4, seed: int = 1, start_mod: int = 10,
    wr: int = 1, wc: int = 4, we: int = 2,
) -> str:
    """Replay of ``node2vec_walks``: per step, candidates are the
    current node's out-neighbors; integer bias weights (prev-null → 1,
    return → wr, common-neighbor-of-prev → wc, else we); pick the
    first candidate in ascending id order whose cumulative weight
    exceeds mix % total. All arithmetic integer → exact parity."""
    from linkgraph.operators.walks import _A, _B, _C, _MIX_MOD

    parts = [
        "WITH nn AS MATERIALIZED (SELECT count(*) AS n FROM customer),",
        "eraw AS MATERIALIZED (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,"
        " CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT) AS dst FROM orders),",
        "ee AS MATERIALIZED (SELECT eraw.src, eraw.dst FROM eraw"
        " JOIN customer b ON b.c_custkey = eraw.dst),",
        f"s0 AS MATERIALIZED (SELECT CAST(c_custkey AS BIGINT) AS walk,"
        f" CAST(NULL AS BIGINT) AS prev, CAST(c_custkey AS BIGINT) AS node"
        f" FROM customer WHERE c_custkey % {start_mod} = 1),",
    ]
    for i in range(1, steps + 1):
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT s.walk, s.prev, s.node, e.dst AS cand"
            f" FROM s{i-1} s JOIN ee e ON e.src = s.node),"
        )
        parts.append(
            f"w{i}n2v AS MATERIALIZED (SELECT walk, node, cand,"
            f" CASE WHEN prev IS NULL THEN 1"
            f" WHEN cand = prev THEN {wr}"
            f" WHEN EXISTS (SELECT 1 FROM ee x WHERE x.src = c.prev"
            f" AND x.dst = c.cand) THEN {wc}"
            f" ELSE {we} END AS w FROM c{i} c),"
        )
        parts.append(
            f"g{i} AS MATERIALIZED (SELECT walk, node, cand,"
            f" SUM(w) OVER (PARTITION BY walk ORDER BY cand) AS cum,"
            f" SUM(w) OVER (PARTITION BY walk) AS tot FROM w{i}n2v),"
        )
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT walk, MIN(node) AS prev,"
            f" MIN(cand) AS node FROM g{i}"
            f" WHERE tot > 0 AND cum > ({_A} * (node % {_MIX_MOD})"
            f" + {_B} * (walk % {_MIX_MOD}) + {_C * i + seed}) % tot"
            f" GROUP BY walk),"
        )
    acc = " UNION ALL ".join(
        f"SELECT walk, {i} AS step, node FROM s{i}" for i in range(steps + 1)
    )
    return "\n".join(parts).rstrip(",") + f"\n{acc}"


def _matching_sql(rounds: int = 16, seed: int = 0) -> str:
    """Replay of ``maximal_matching`` / ``vertex_cover_approx``
    (matching.py): unrolled locally-minimal-edge rounds on the
    canonical undirected simple order graph. The engine's struct
    (p, src, dst) min is ORDER BY p, src, dst; an edge wins a round
    when it is rank-1 at BOTH endpoints (HAVING count(*) = 2). Extra
    rounds beyond convergence are no-ops on an empty edge set."""
    from linkgraph.operators.matching import _A, _MIX_MOD, _P

    parts = [
        "WITH nn AS MATERIALIZED (SELECT count(*) AS n FROM customer),",
        "er AS MATERIALIZED (SELECT DISTINCT"
        " least(CAST(o_custkey AS BIGINT),"
        " CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT)) AS src,"
        " greatest(CAST(o_custkey AS BIGINT),"
        " CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT)) AS dst FROM orders),",
        f"e0 AS MATERIALIZED (SELECT er.src, er.dst,"
        f" ({_A} * (((er.src % {_MIX_MOD}) * 1009 + (er.dst % {_MIX_MOD}))"
        f" % {_MIX_MOD}) + {seed}) % {_P} AS p"
        f" FROM er JOIN customer a ON a.c_custkey = er.src"
        f" JOIN customer b ON b.c_custkey = er.dst"
        f" WHERE er.src <> er.dst),",
    ]
    for r in range(rounds):
        parts.append(
            f"i{r} AS MATERIALIZED (SELECT src AS v, src, dst, p FROM e{r}"
            f" UNION ALL SELECT dst, src, dst, p FROM e{r}),"
        )
        parts.append(
            f"m{r} AS MATERIALIZED (SELECT src, dst FROM ("
            f"SELECT v, src, dst,"
            f" row_number() OVER (PARTITION BY v ORDER BY p, src, dst) AS rn"
            f" FROM i{r}) WHERE rn = 1 GROUP BY src, dst HAVING count(*) = 2),"
        )
        parts.append(
            f"mv{r} AS MATERIALIZED (SELECT src AS id FROM m{r}"
            f" UNION SELECT dst FROM m{r}),"
        )
        parts.append(
            f"e{r + 1} AS MATERIALIZED (SELECT * FROM e{r}"
            f" WHERE src NOT IN (SELECT id FROM mv{r})"
            f" AND dst NOT IN (SELECT id FROM mv{r})),"
        )
    acc = " UNION ALL ".join(f"SELECT src, dst FROM m{r}" for r in range(rounds))
    parts.append(f"mm AS MATERIALIZED ({acc}),")
    parts.append("cov AS MATERIALIZED (SELECT src AS id FROM mm UNION SELECT dst FROM mm)")
    parts.append(
        "SELECT CAST(c.c_custkey AS BIGINT) AS id,"
        " c.c_custkey IN (SELECT id FROM cov) AS in_cover FROM customer c"
    )
    return "\n".join(parts)


_LOCAL_BRIDGES_SQL = """
WITH pairs AS (
  SELECT DISTINCT CAST(a.l_partkey AS BIGINT) AS src,
    CAST(b.l_partkey AS BIGINT) AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
adj AS (SELECT src, dst FROM pairs UNION ALL SELECT dst AS src, src AS dst FROM pairs)
SELECT p.src, p.dst FROM pairs p
WHERE NOT EXISTS (
  SELECT 1 FROM adj a JOIN adj b ON b.dst = a.dst AND b.src = p.dst
  WHERE a.src = p.src
)"""


_S_METRIC_SQL = """
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
ids AS (SELECT src AS id FROM pairs UNION ALL SELECT dst FROM pairs),
deg AS (SELECT id, count(*) AS deg FROM ids GROUP BY id)
SELECT CAST(SUM(da.deg * db.deg) AS DOUBLE) AS s_metric
FROM pairs p JOIN deg da ON da.id = p.src JOIN deg db ON db.id = p.dst"""


_RICH_CLUB_SQL = """
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
ids AS (SELECT src AS id FROM pairs UNION ALL SELECT dst FROM pairs),
deg AS (SELECT id, count(*) AS deg FROM ids GROUP BY id),
grid AS (SELECT unnest(range(0, (SELECT CAST(max(deg) AS BIGINT) FROM deg))) AS k),
nk AS (SELECT g.k, count(*) AS nk FROM grid g JOIN deg d ON d.deg > g.k GROUP BY g.k),
emin AS (
  SELECT least(da.deg, db.deg) AS mdeg
  FROM pairs p JOIN deg da ON da.id = p.src JOIN deg db ON db.id = p.dst
),
ek AS (SELECT g.k, count(*) AS ek FROM grid g JOIN emin e ON e.mdeg > g.k GROUP BY g.k)
SELECT CAST(nk.k AS INTEGER) AS k,
  round(2.0 * coalesce(ek.ek, 0) / (nk.nk * (nk.nk - 1.0)), 8) AS phi_r
FROM nk LEFT JOIN ek ON ek.k = nk.k
WHERE nk.nk > 1"""


def _dedup_clusters_sql(threshold: float = 0.8) -> str:
    """Mirror of ``near_dup_clusters``: the `_jaccard_pairs_sql`
    candidate+verify body filtered at ``threshold``, symmetrized, then
    transitive closure by recursive reachability; cluster = min
    reachable id (singletons map to themselves)."""
    return f"""
WITH RECURSIVE {_minhash_cte(8)},
bt AS (
  SELECT d.doc_id AS id, 0 AS band, md5(concat_ws('|', mh.h0, mh.h1)) AS key
  FROM documents d LEFT JOIN mh ON mh.doc_id = d.doc_id
  UNION ALL SELECT d.doc_id, 1, md5(concat_ws('|', mh.h2, mh.h3))
  FROM documents d LEFT JOIN mh ON mh.doc_id = d.doc_id
  UNION ALL SELECT d.doc_id, 2, md5(concat_ws('|', mh.h4, mh.h5))
  FROM documents d LEFT JOIN mh ON mh.doc_id = d.doc_id
  UNION ALL SELECT d.doc_id, 3, md5(concat_ws('|', mh.h6, mh.h7))
  FROM documents d LEFT JOIN mh ON mh.doc_id = d.doc_id
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bt a JOIN bt b ON a.band = b.band AND a.key = b.key AND a.id < b.id
),
sets AS (
  SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS tk
  FROM documents
),
ed AS (
  SELECT c.id_a, c.id_b FROM cand c
  JOIN sets sa ON sa.doc_id = c.id_a
  JOIN sets sb ON sb.doc_id = c.id_b
  WHERE CAST(len(list_intersect(sa.tk, sb.tk)) AS DOUBLE)
    / greatest(len(list_distinct(list_concat(sa.tk, sb.tk))), 1) >= {threshold}
),
sym AS (
  SELECT id_a AS a, id_b AS b FROM ed
  UNION SELECT id_b, id_a FROM ed
),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON s.a = r.b
),
cl AS (
  SELECT a AS doc_id, least(a, min(b)) AS cluster FROM reach GROUP BY a
)
SELECT d.doc_id, COALESCE(cl.cluster, d.doc_id) AS cluster,
  d.doc_id = COALESCE(cl.cluster, d.doc_id) AS is_survivor
FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id"""


def _kcore_sql(k: int = 3, rounds: int = 8) -> str:
    """Unrolled iterative peeling (same generator device as
    ``_pagerank_sql``): each round keeps edges whose endpoints have
    degree >= k among the previous round's edges. Peeling is monotone
    and idempotent at the fixpoint, so unrolling more rounds than the
    data needs (measured: 1 round at sf0.01) is harmless."""
    head = f"WITH {_PAIRS_CTE}, p0 AS MATERIALIZED (SELECT src, dst FROM pairs)"
    steps = []
    for i in range(rounds):
        steps.append(f"""
k{i + 1} AS MATERIALIZED (
  SELECT id FROM (
    SELECT src AS id FROM p{i} UNION ALL SELECT dst FROM p{i}
  ) GROUP BY id HAVING count(*) >= {k}
),
p{i + 1} AS MATERIALIZED (
  SELECT p.src, p.dst FROM p{i} p
  JOIN k{i + 1} a ON a.id = p.src
  JOIN k{i + 1} b ON b.id = p.dst
)""")
    return head + "," + ",".join(steps) + f"\nSELECT src, dst FROM p{rounds}"


def _core_chain(iters: int = 30) -> str:
    """Shared CTE chain for the Montresor h-index core-number unroll:
    ends at ``c{iters}`` (id, c). Callers append their SELECT."""
    head = f"""
WITH {_PAIRS_CTE},
e AS MATERIALIZED (SELECT src, dst FROM pairs UNION ALL SELECT dst AS src, src AS dst FROM pairs),
c0 AS MATERIALIZED (SELECT src AS id, count(*) AS c FROM e GROUP BY src)"""
    steps = []
    for i in range(iters):
        steps.append(f"""
c{i + 1} AS MATERIALIZED (
  SELECT src AS id, max(least(cd, rn)) AS c FROM (
    SELECT e.src, p.c AS cd,
      row_number() OVER (PARTITION BY e.src ORDER BY p.c DESC) AS rn
    FROM e JOIN c{i} p ON p.id = e.dst
  ) GROUP BY src
)""")
    return head + "," + ",".join(steps)


def _core_number_sql(iters: int = 64) -> str:
    """Unrolled Montresor h-index iteration — the exact mirror of the
    engine's ``core_number``: c0 = degree; c_{{t+1}}(v) = h-index of
    neighbors' c_t. Monotone non-increasing with fixpoint = core
    number, so extra unrolled iterations are idempotent. r5: the
    sf0.1 gate caught the 30-iteration unroll UNCONVERGED at sf0.1
    (19 rounds suffice at sf0.01, ~30+ needed at sf0.1 — the engine
    matched the exact BZ kernel bit-for-bit; the ORACLE was the stale
    side this time), so the unroll is now 64."""
    return (
        _core_chain(iters)
        + f"""
SELECT p.p_partkey AS id, CAST(COALESCE(cn.c, 0) AS BIGINT) AS core
FROM part p LEFT JOIN c{iters} cn ON cn.id = p.p_partkey"""
    )


def _kshell_sql(iters: int = 64) -> str:
    """k_shell with default k = max core number: induced edges among
    nodes whose converged h-index estimate equals the global max —
    rides the same unrolled core chain."""
    return (
        _core_chain(iters)
        + f""",
shell AS (SELECT id FROM c{iters} WHERE c = (SELECT max(c) FROM c{iters}))
SELECT p.src, p.dst FROM pairs p
JOIN shell a ON a.id = p.src
JOIN shell b ON b.id = p.dst"""
    )


def _onion_sql(rounds: int = 24) -> str:
    """Unrolled onion decomposition over the undirected simple order
    graph — the exact mirror of the engine's ``onion_layers`` loop:
    per round a degree snapshot, current_core lifted to the min
    degree (a one-row running-max CTE), peel-all <= current_core.
    Idempotent once the graph empties (empty rounds emit no rows)."""
    head = f"""
WITH {_EDGES_CTE},
p0 AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
  FROM e2k WHERE src <> dst
),
iso AS MATERIALIZED (
  SELECT c_custkey AS id FROM customer
  WHERE c_custkey NOT IN (SELECT src FROM p0)
    AND c_custkey NOT IN (SELECT dst FROM p0)
),
loff AS (SELECT CASE WHEN count(*) > 0 THEN 1 ELSE 0 END AS o FROM iso),
v0 AS MATERIALIZED (SELECT src AS id FROM p0 UNION SELECT dst FROM p0),
m0 AS MATERIALIZED (SELECT 1 AS m)"""
    steps, layer_sels = [], []
    for i in range(rounds):
        steps.append(f"""
d{i + 1} AS MATERIALIZED (
  SELECT v.id, COALESCE(dd.cnt, 0) AS deg FROM v{i} v
  LEFT JOIN (
    SELECT id, count(*) AS cnt FROM (
      SELECT src AS id FROM p{i} UNION ALL SELECT dst FROM p{i}
    ) GROUP BY id
  ) dd ON dd.id = v.id
),
m{i + 1} AS MATERIALIZED (
  SELECT greatest((SELECT m FROM m{i}),
                  COALESCE((SELECT min(deg) FROM d{i + 1}), (SELECT m FROM m{i}))) AS m
),
l{i + 1} AS MATERIALIZED (
  SELECT id FROM d{i + 1} WHERE deg <= (SELECT m FROM m{i + 1})
),
v{i + 1} AS MATERIALIZED (
  SELECT id FROM d{i + 1} WHERE deg > (SELECT m FROM m{i + 1})
),
p{i + 1} AS MATERIALIZED (
  SELECT p.src, p.dst FROM p{i} p
  JOIN v{i + 1} a ON a.id = p.src
  JOIN v{i + 1} b ON b.id = p.dst
)""")
        layer_sels.append(
            f"SELECT id, CAST({i + 1} + (SELECT o FROM loff) AS BIGINT) AS layer FROM l{i + 1}"
        )
    tail = (
        "\nSELECT id, CAST(1 AS BIGINT) AS layer FROM iso\nUNION ALL\n"
        + "\nUNION ALL\n".join(layer_sels)
    )
    return head + "," + ",".join(steps) + tail


def _avg_degree_connectivity_sql() -> str:
    return f"""
WITH {_PAIRS_CTE},
e AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
deg AS (SELECT src AS id, count(*) AS d FROM e GROUP BY src)
SELECT ds.d AS degree,
  round(CAST(sum(dd.d) AS DOUBLE) / count(*), 8) AS avg_connectivity_r
FROM e
JOIN deg ds ON ds.id = e.src
JOIN deg dd ON dd.id = e.dst
GROUP BY ds.d"""


def _attr_assortativity_sql() -> str:
    """r = (trace/m − Σ a_i·b_i/m²) / (1 − Σ a_i·b_i/m²) over the
    directed order graph with c_nationkey endpoint attributes (edges
    whose dst is not a customer drop out of the inner joins, exactly
    as the engine's vertex-attr join does)."""
    return f"""
WITH {_EDGES_CTE},
ap AS (
  SELECT cs.c_nationkey AS xa, cd.c_nationkey AS ya
  FROM e2k
  JOIN customer cs ON cs.c_custkey = e2k.src
  JOIN customer cd ON cd.c_custkey = e2k.dst
),
mt AS (SELECT count(*) AS m,
              sum(CASE WHEN xa = ya THEN 1 ELSE 0 END) AS tr FROM ap),
ra AS (SELECT xa AS v, count(*) AS a FROM ap GROUP BY xa),
cb AS (SELECT ya AS v, count(*) AS b FROM ap GROUP BY ya),
sab AS (
  SELECT sum(CAST(COALESCE(ra.a, 0) AS DOUBLE) * COALESCE(cb.b, 0)) AS s
  FROM ra FULL JOIN cb ON cb.v = ra.v
)
SELECT round(
  ((CAST(mt.tr AS DOUBLE) / mt.m) - sab.s / (CAST(mt.m AS DOUBLE) * mt.m))
  / (1.0 - sab.s / (CAST(mt.m AS DOUBLE) * mt.m)), 8) AS attr_assortativity_r
FROM mt, sab"""


def _degree_centrality_sql() -> str:
    return f"""
WITH {_EDGES_CTE},
p0 AS (
  -- engine degree_centrality restricts endpoints to the vertex table
  SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
  FROM e2k
  WHERE src <> dst
    AND src IN (SELECT c_custkey FROM customer)
    AND dst IN (SELECT c_custkey FROM customer)
),
deg AS (
  SELECT id, count(*) AS d FROM (
    SELECT src AS id FROM p0 UNION ALL SELECT dst FROM p0
  ) GROUP BY id
)
SELECT c.c_custkey AS id,
  round(CAST(COALESCE(deg.d, 0) AS DOUBLE) / ((SELECT n FROM nn) - 1), 8)
    AS centrality_r
FROM customer c LEFT JOIN deg ON deg.id = c.c_custkey"""


def _effective_size_sql() -> str:
    return f"""
WITH {_TRI_CTE},
corners AS (
  SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
),
cnt AS (SELECT id, count(*) AS t FROM corners GROUP BY id),
degs AS (
  SELECT id, count(*) AS d FROM (
    SELECT src AS id FROM pairs UNION ALL SELECT dst FROM pairs
  ) GROUP BY id
)
SELECT p.p_partkey AS id,
  CASE WHEN COALESCE(degs.d, 0) > 0
    THEN round(degs.d - 2.0 * COALESCE(cnt.t, 0) / degs.d, 8)
    ELSE NULL END AS effective_size_r
FROM part p
LEFT JOIN degs ON degs.id = p.p_partkey
LEFT JOIN cnt ON cnt.id = p.p_partkey"""


def _edge_boundary_sql() -> str:
    return f"""
WITH nn AS (SELECT count(*) AS n FROM customer),
e AS (SELECT o_custkey AS src, o_orderkey % (SELECT n FROM nn) AS dst FROM orders),
rich AS (SELECT c_custkey AS id FROM customer WHERE c_acctbal > 5000)
SELECT e.src, e.dst FROM e
WHERE e.src IN (SELECT id FROM rich)
  AND e.dst NOT IN (SELECT id FROM rich)"""


def _weighted_clustering_sql() -> str:
    """Mirror of weighted_clustering over the co-occurrence-count
    weighted part graph: ŵ = w/max(w), per-triangle cbrt product
    credited to each corner, c = 2·Σq/(d(d−1))."""
    return """
WITH wp AS MATERIALIZED (
  SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*) AS w
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
),
mw AS (SELECT max(w) AS v FROM wp),
tri AS MATERIALIZED (
  SELECT e1.src AS x, e1.dst AS y, e2.dst AS z,
    cbrt((CAST(e1.w AS DOUBLE) / (SELECT v FROM mw))
       * (CAST(e2.w AS DOUBLE) / (SELECT v FROM mw))
       * (CAST(e3.w AS DOUBLE) / (SELECT v FROM mw))) AS q
  FROM wp e1
  JOIN wp e2 ON e2.src = e1.dst
  JOIN wp e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
credit AS (
  SELECT id, sum(q) AS tw FROM (
    SELECT x AS id, q FROM tri
    UNION ALL SELECT y, q FROM tri
    UNION ALL SELECT z, q FROM tri
  ) GROUP BY id
),
degs AS (
  SELECT id, count(*) AS d FROM (
    SELECT src AS id FROM wp UNION ALL SELECT dst FROM wp
  ) GROUP BY id
)
SELECT p.p_partkey AS id,
  round(CASE WHEN COALESCE(degs.d, 0) > 1 AND credit.tw IS NOT NULL
    THEN 2.0 * credit.tw / (CAST(degs.d AS DOUBLE) * (degs.d - 1))
    ELSE 0.0 END, 8) AS clustering_r
FROM part p
LEFT JOIN degs ON degs.id = p.p_partkey
LEFT JOIN credit ON credit.id = p.p_partkey"""


def _conductance_sql() -> str:
    """cut(S,T)/min(vol(S),vol(T)) on the directed order graph, S =
    rich customers, T = the vertex-table complement (node 0 — an edge
    endpoint outside the vertex table — is in neither set; volumes
    count raw out-edge rows, parallel rows included, exactly as the
    engine's weighted_edges view does)."""
    return """
WITH nn AS (SELECT count(*) AS n FROM customer),
e AS MATERIALIZED (
  SELECT o_custkey AS src, o_orderkey % (SELECT n FROM nn) AS dst FROM orders
),
rich AS MATERIALIZED (
  SELECT c_custkey AS id FROM customer WHERE c_acctbal > 5000
),
comp AS MATERIALIZED (
  SELECT c_custkey AS id FROM customer
  WHERE c_custkey NOT IN (SELECT id FROM rich)
),
cut AS (
  SELECT CAST(
    (SELECT count(*) FROM e WHERE src IN (SELECT id FROM rich)
       AND dst IN (SELECT id FROM comp))
  + (SELECT count(*) FROM e WHERE src IN (SELECT id FROM comp)
       AND dst IN (SELECT id FROM rich)) AS DOUBLE) AS c
),
vols AS (
  SELECT
    CAST((SELECT count(*) FROM e WHERE src IN (SELECT id FROM rich)) AS DOUBLE) AS vs,
    CAST((SELECT count(*) FROM e WHERE src IN (SELECT id FROM comp)) AS DOUBLE) AS vt
)
SELECT round(cut.c / least(vols.vs, vols.vt), 8) AS conductance_r,
  cut.c AS cut_size, vols.vs AS volume
FROM cut, vols"""


def _constraint_sql() -> str:
    """Burt constraint on the part graph — unweighted undirected form
    (local ℓ(u,v) = (1/d_u + Σ_w 1/(d_u·d_w))² over common neighbors
    w, summed per node)."""
    return f"""
WITH {_PAIRS_CTE},
sym AS MATERIALIZED (
  SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs
),
deg AS MATERIALIZED (SELECT src AS id, count(*) AS d FROM sym GROUP BY src),
ind AS MATERIALIZED (
  SELECT w1.src AS u, w2.dst AS v,
    sum(1.0 / (du.d * dw.d)) AS ind
  FROM sym w1
  JOIN sym w2 ON w2.src = w1.dst AND w1.src <> w2.dst
  JOIN deg du ON du.id = w1.src
  JOIN deg dw ON dw.id = w1.dst
  WHERE EXISTS (SELECT 1 FROM sym a WHERE a.src = w1.src AND a.dst = w2.dst)
  GROUP BY w1.src, w2.dst
),
local AS (
  SELECT s.src AS id,
    sum(power(1.0 / du.d + COALESCE(i.ind, 0.0), 2)) AS c
  FROM sym s
  JOIN deg du ON du.id = s.src
  LEFT JOIN ind i ON i.u = s.src AND i.v = s.dst
  GROUP BY s.src
)
SELECT p.p_partkey AS id, round(local.c, 8) AS constraint_r
FROM part p LEFT JOIN local ON local.id = p.p_partkey"""


def _square_clustering_sql() -> str:
    """Mirror of square_clustering's decomposition: squares from the
    common-neighbor pair table, potential from degree sums, neighbor-
    degree sums and twice the triangle count."""
    return f"""
WITH {_TRI_CTE},
sym AS MATERIALIZED (
  SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs
),
deg AS MATERIALIZED (SELECT src AS id, count(*) AS d FROM sym GROUP BY src),
snd AS MATERIALIZED (
  SELECT s.src AS id, sum(nd.d) AS snd
  FROM sym s JOIN deg nd ON nd.id = s.dst GROUP BY s.src
),
cn AS MATERIALIZED (
  SELECT a.dst AS u, b.dst AS v, count(*) AS cn
  FROM sym a JOIN sym b ON b.src = a.src AND a.dst < b.dst
  GROUP BY a.dst, b.dst
),
sq AS MATERIALIZED (
  SELECT id, sum(q) / 2.0 AS squares FROM (
    SELECT u AS id, CAST(cn * (cn - 1) AS DOUBLE) AS q FROM cn
    UNION ALL SELECT v, CAST(cn * (cn - 1) AS DOUBLE) FROM cn
  ) GROUP BY id
),
corners AS (
  SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
),
tcnt AS (SELECT id, count(*) AS t FROM corners GROUP BY id),
terms AS (
  SELECT p.p_partkey AS id,
    COALESCE(deg.d, 0) AS d,
    COALESCE(snd.snd, 0) AS snd,
    COALESCE(sq.squares, 0.0) AS squares,
    COALESCE(tcnt.t, 0) AS tri
  FROM part p
  LEFT JOIN deg ON deg.id = p.p_partkey
  LEFT JOIN snd ON snd.id = p.p_partkey
  LEFT JOIN sq ON sq.id = p.p_partkey
  LEFT JOIN tcnt ON tcnt.id = p.p_partkey
)
SELECT id,
  round(CASE WHEN d < 2 THEN 0.0
    WHEN ((d - 1) * snd - d * (d - 1) - 2.0 * tri - squares) > 0
    THEN squares / ((d - 1) * snd - d * (d - 1) - 2.0 * tri - squares)
    ELSE 0.0 END, 8) AS sq_clustering_r
FROM terms"""


def _triadic_census_sql() -> str:
    """Mirror of triadic_census on the order graph: dyad states →
    wedge-join triple enumeration → 64-code class lookup (the same
    CODE_TO_CLASS table the engine embeds) → combinatorial closure for
    012/102/003."""
    from linkgraph.operators.triads import CODE_TO_CLASS, TRIAD_CLASSES

    case = "CASE code " + " ".join(
        f"WHEN {k} THEN '{v}'" for k, v in sorted(CODE_TO_CLASS.items())
    ) + " END"
    classes_values = ", ".join(f"('{c}')" for c in TRIAD_CLASSES)
    return f"""
WITH nn AS (SELECT count(*) AS n FROM customer),
e AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS src, o_orderkey % (SELECT n FROM nn) AS dst
  FROM orders
  WHERE o_custkey <> o_orderkey % (SELECT n FROM nn)
    AND o_custkey IN (SELECT c_custkey FROM customer)
    AND o_orderkey % (SELECT n FROM nn) IN (SELECT c_custkey FROM customer)
),
dy AS MATERIALIZED (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b,
    sum(CASE WHEN src < dst THEN 1 ELSE 2 END) AS s
  FROM e GROUP BY least(src, dst), greatest(src, dst)
),
nbrs AS MATERIALIZED (
  SELECT a AS center, b AS other, s FROM dy
  UNION ALL SELECT b, a, s FROM dy
),
trip AS MATERIALIZED (
  SELECT j1.other AS u, j2.other AS v, j1.center AS w,
    j1.s AS s1, j2.s AS s2, COALESCE(dy.s, 0) AS s_uv
  FROM nbrs j1
  JOIN nbrs j2 ON j2.center = j1.center AND j1.other < j2.other
  LEFT JOIN dy ON dy.a = j1.other AND dy.b = j2.other
),
tri AS MATERIALIZED (
  SELECT DISTINCT least(u, w) AS x, u + v + w - least(u, w) - greatest(v, w) AS y,
    greatest(v, w) AS z,
    CASE WHEN w < u THEN s1 + 4 * s2 + 16 * s_uv
         WHEN w < v THEN s1 + 4 * s_uv + 16 * s2
         ELSE s_uv + 4 * s1 + 16 * s2 END AS code
  FROM trip
),
enum AS MATERIALIZED (
  SELECT {case} AS triad_type, count(*) AS c FROM tri GROUP BY 1
),
scal AS (
  SELECT
    (SELECT n FROM nn) AS n,
    (SELECT count(*) FROM dy WHERE s = 3) AS md,
    (SELECT count(*) FROM dy WHERE s <> 3) AS ad,
    COALESCE((SELECT sum(
        (CASE WHEN code % 4 = 3 THEN 1 ELSE 0 END)
      + (CASE WHEN (code // 4) % 4 = 3 THEN 1 ELSE 0 END)
      + (CASE WHEN (code // 16) % 4 = 3 THEN 1 ELSE 0 END)) FROM tri), 0) AS sum_m,
    COALESCE((SELECT sum(
        (CASE WHEN code % 4 IN (1, 2) THEN 1 ELSE 0 END)
      + (CASE WHEN (code // 4) % 4 IN (1, 2) THEN 1 ELSE 0 END)
      + (CASE WHEN (code // 16) % 4 IN (1, 2) THEN 1 ELSE 0 END)) FROM tri), 0) AS sum_a,
    COALESCE((SELECT sum(c) FROM enum), 0) AS enum_total
),
classes(triad_type) AS (VALUES {classes_values}),
base AS (
  SELECT cl.triad_type,
    COALESCE(en.c, 0)
    + CASE WHEN cl.triad_type = '102'
        THEN sc.md * greatest(sc.n - 2, 0) - sc.sum_m
      WHEN cl.triad_type = '012'
        THEN sc.ad * greatest(sc.n - 2, 0) - sc.sum_a
      ELSE 0 END AS cnt
  FROM classes cl
  LEFT JOIN enum en ON en.triad_type = cl.triad_type
  CROSS JOIN scal sc
)
SELECT triad_type,
  CAST(CASE WHEN triad_type = '003'
    THEN (SELECT n * (n - 1) * (n - 2) / 6 FROM scal)
         - (SELECT sum(cnt) FROM base WHERE triad_type <> '003')
    ELSE cnt END AS BIGINT) AS n_triads
FROM base"""


def _bipartite_color_sql(flood_rounds: int = 10, bfs_rounds: int = 10) -> str:
    """BFS-parity 2-coloring of the part–supplier bipartite graph:
    component roots via unrolled min-label flooding (converges in
    diameter rounds — measured ecc 3 at sf0.01), then unrolled
    min-distance BFS from the roots; color = shortest-distance parity
    (unique per node in a bipartite graph, so any BFS order agrees
    with the engine's frontier expansion)."""
    head = """
WITH off AS (SELECT max(p_partkey) AS o FROM part),
e AS MATERIALIZED (
  SELECT DISTINCT l_partkey AS src, l_suppkey + (SELECT o FROM off) AS dst
  FROM lineitem
),
sym AS MATERIALIZED (
  SELECT src, dst FROM e UNION SELECT dst, src FROM e
),
nodes AS MATERIALIZED (
  SELECT p_partkey AS id FROM part
  UNION SELECT s_suppkey + (SELECT o FROM off) FROM supplier
),
f0 AS MATERIALIZED (SELECT id, id AS lbl FROM nodes)"""
    steps = []
    for i in range(flood_rounds):
        steps.append(f"""
f{i + 1} AS MATERIALIZED (
  SELECT f.id, least(f.lbl, COALESCE(nb.ml, f.lbl)) AS lbl
  FROM f{i} f
  LEFT JOIN (
    SELECT s.dst AS id, min(p.lbl) AS ml
    FROM sym s JOIN f{i} p ON p.id = s.src
    GROUP BY s.dst
  ) nb ON nb.id = f.id
)""")
    steps.append(f"""
roots AS MATERIALIZED (
  SELECT min(id) AS id FROM f{flood_rounds} GROUP BY lbl
),
b0 AS MATERIALIZED (
  SELECT n.id,
    CASE WHEN n.id IN (SELECT id FROM roots) THEN 0 ELSE NULL END AS dist
  FROM nodes n
)""")
    for i in range(bfs_rounds):
        steps.append(f"""
b{i + 1} AS MATERIALIZED (
  SELECT b.id, least(COALESCE(b.dist, 1 << 30),
                     COALESCE(nb.md + 1, 1 << 30)) AS dist
  FROM b{i} b
  LEFT JOIN (
    SELECT s.dst AS id, min(p.dist) AS md
    FROM sym s JOIN b{i} p ON p.id = s.src
    WHERE p.dist IS NOT NULL
    GROUP BY s.dst
  ) nb ON nb.id = b.id
)""")
    return (
        head + "," + ",".join(steps)
        + f"""
SELECT id, CAST(dist % 2 AS INT) AS color FROM b{bfs_rounds}
WHERE dist < (1 << 30)"""
    )


def _scc_sql() -> str:
    """SCC via mutual transitive reachability: reach(a,b) is the
    reflexive-transitive closure (recursive CTE, UNION-deduped);
    component(v) = max id mutually reachable with v — exactly the
    engine's deterministic representative (max vertex id in the SCC).
    Tractable at oracle scale because the closure is bounded by
    n * |giant SCC|."""
    return """
WITH RECURSIVE nn AS (SELECT count(*) AS n FROM customer),
e AS (SELECT DISTINCT o_custkey AS src, o_orderkey % (SELECT n FROM nn) AS dst FROM orders),
nodes AS (SELECT c_custkey AS id FROM customer),
reach(a, b) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
)
SELECT r1.a AS id, max(r1.b) AS component
FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a
GROUP BY r1.a"""


def _emb_bucket_cte(dim: int, bits: int) -> str:
    """Shared CTE: embeddings bucketed by the deterministic
    hyperplanes (similarity._hyperplane sin values embedded as
    DOUBLE[] literals — bit-identical to the engine's lsh_bucket)."""
    planes = [sim._hyperplane(dim, p) for p in range(bits)]
    plane_lits = [
        "[" + ", ".join(repr(x) for x in pl) + "]::DOUBLE[]" for pl in planes
    ]
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(ed, {plane_lits[p]}) > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(bits)
    )
    return f"""c AS MATERIALIZED (
  SELECT vec_id, ed, {bucket_terms} AS bucket
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ed FROM embeddings)
)"""


def _lsh_topk_sql(dim: int = 64, bits: int = 8, k: int = 10, n_queries: int = 8) -> str:
    """Mirror of ``similarity.lsh_topk``: deterministic-hyperplane
    buckets (see ``_emb_bucket_cte``); scores rounded to 6 decimals
    before ranking on both sides."""
    probes = ", ".join(["b0"] + [f"xor(b0, {1 << i})" for i in range(bits)])
    return f"""
WITH {_emb_bucket_cte(dim, bits)},
q AS (SELECT vec_id AS query_id, ed AS qv, bucket AS b0 FROM c WHERE vec_id < {n_queries}),
probe AS (
  SELECT DISTINCT query_id, qv, unnest([{probes}]) AS bucket FROM q
),
scored AS (
  SELECT p.query_id, c.vec_id AS neighbor_id,
    round(list_dot_product(p.qv, c.ed)
      / greatest(sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(c.ed, c.ed)), 1e-300),
      6) AS score
  FROM probe p JOIN c ON c.bucket = p.bucket
  WHERE c.vec_id <> p.query_id
),
r AS (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, rnk FROM r WHERE rnk <= {k}"""


def _near_pairs_sql(dim: int = 64, bits: int = 8) -> str:
    """Mirror of ``similarity.lsh_self_join``: side A = owner buckets,
    side B = owner + Hamming-1 probe buckets, equi-join on bucket with
    id_a < id_b, DISTINCT collapsing the same-bucket double-count."""
    probes = ", ".join(["bucket"] + [f"xor(bucket, {1 << i})" for i in range(bits)])
    return f"""
WITH {_emb_bucket_cte(dim, bits)},
b AS (SELECT vec_id, ed, unnest([{probes}]) AS bucket FROM c)
SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
  round(list_dot_product(a.ed, b.ed)
    / greatest(sqrt(list_dot_product(a.ed, a.ed)) * sqrt(list_dot_product(b.ed, b.ed)), 1e-300),
    6) AS score_r
FROM c a JOIN b ON b.bucket = a.bucket AND a.vec_id < b.vec_id"""


def _eigenvector_sql(iters: int = 8) -> str:
    """Mirror of ``eigenvector_centrality`` (eigenvector.py:118-137)
    at fixed iterations: x_new = (x + A^T x) / ||.||_2 each round.
    Weights = parallel-edge counts (CSR coalescing)."""
    head = """
WITH nn AS MATERIALIZED (SELECT count(*) AS n FROM customer),
e AS MATERIALIZED (SELECT o_custkey AS src, o_orderkey % (SELECT n FROM nn) AS dst FROM orders),
ec AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM e GROUP BY src, dst),
nodes AS MATERIALIZED (SELECT c_custkey AS id FROM customer),
x0 AS MATERIALIZED (SELECT id, 1.0 / (SELECT n FROM nn) AS r FROM nodes)"""
    steps = []
    for i in range(iters):
        steps.append(f"""
xr{i} AS MATERIALIZED (
  SELECT x.id, x.r + COALESCE(g.v, 0) AS r
  FROM x{i} x LEFT JOIN (
    SELECT ec.dst AS id, sum(x.r * ec.w) AS v
    FROM x{i} x JOIN ec ON ec.src = x.id GROUP BY ec.dst
  ) g ON g.id = x.id
),
x{i + 1} AS MATERIALIZED (
  SELECT id, r / (CASE WHEN (SELECT sqrt(sum(r * r)) FROM xr{i}) > 0
    THEN (SELECT sqrt(sum(r * r)) FROM xr{i}) ELSE 1 END) AS r
  FROM xr{i}
)""")
    return (
        head + "," + ",".join(steps)
        + f"\nSELECT id, round(r, 8) AS centrality_r FROM x{iters}"
    )


def _katz_sql(iters: int = 8, alpha: float = 0.05, beta: float = 1.0) -> str:
    """Mirror of ``katz_centrality`` at fixed iterations:
    x_{i+1} = alpha * A^T x_i + beta from x_0 = 0, L2-normalized at
    the end. Weights = parallel-edge counts (CSR coalescing)."""
    head = """
WITH nn AS MATERIALIZED (SELECT count(*) AS n FROM customer),
e AS MATERIALIZED (SELECT o_custkey AS src, o_orderkey % (SELECT n FROM nn) AS dst FROM orders),
ec AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM e GROUP BY src, dst),
nodes AS MATERIALIZED (SELECT c_custkey AS id FROM customer),
x0 AS MATERIALIZED (SELECT id, 0.0 AS r FROM nodes)"""
    steps = []
    for i in range(iters):
        steps.append(f"""
x{i + 1} AS MATERIALIZED (
  SELECT x.id, {alpha} * COALESCE(g.v, 0) + {beta} AS r
  FROM x{i} x LEFT JOIN (
    SELECT ec.dst AS id, sum(x.r * ec.w) AS v
    FROM x{i} x JOIN ec ON ec.src = x.id GROUP BY ec.dst
  ) g ON g.id = x.id
)""")
    return (
        head + "," + ",".join(steps)
        + f""",
nrm AS MATERIALIZED (SELECT sqrt(sum(r * r)) AS s FROM x{iters})
SELECT id, round(r / (CASE WHEN (SELECT s FROM nrm) > 0
  THEN (SELECT s FROM nrm) ELSE 1 END), 8) AS katz_r FROM x{iters}"""
    )


def _ppr_sql(iters: int = PR_ITERS, alpha: float = PR_ALPHA) -> str:
    """Personalized variant of ``_pagerank_sql``: teleport AND
    dangling-mass weights follow p ∝ greatest(c_acctbal, 1)
    (the reference's dangling default = personalization,
    pagerank_alg.py:156-160); x0 stays uniform 1/N
    (pagerank_alg.py:134-137)."""
    head = f"""
WITH nn AS MATERIALIZED (SELECT count(*) AS n FROM customer),
e AS MATERIALIZED (SELECT o_custkey AS src, o_orderkey % (SELECT n FROM nn) AS dst FROM orders),
ec AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM e GROUP BY src, dst),
os AS MATERIALIZED (SELECT src, sum(w) AS s FROM ec GROUP BY src),
ne AS MATERIALIZED (SELECT ec.src, ec.dst, ec.w / os.s AS w FROM ec JOIN os ON os.src = ec.src),
nodes AS MATERIALIZED (SELECT c_custkey AS id FROM customer),
praw AS MATERIALIZED (SELECT c_custkey AS id, greatest(CAST(c_acctbal AS DOUBLE), 1.0) AS v FROM customer),
p AS MATERIALIZED (SELECT id, v / (SELECT sum(v) FROM praw) AS p FROM praw),
dang AS MATERIALIZED (SELECT id FROM nodes WHERE id NOT IN (SELECT src FROM os)),
x0 AS MATERIALIZED (SELECT id, 1.0 / (SELECT n FROM nn) AS r FROM nodes)"""
    steps = []
    for i in range(iters):
        steps.append(f"""
x{i + 1} AS MATERIALIZED (
  SELECT p.id,
    {alpha} * (COALESCE(g.gathered, 0)
      + (SELECT COALESCE(sum(x.r), 0) FROM x{i} x JOIN dang d ON d.id = x.id)
        * p.p)
    + {1.0 - alpha} * p.p AS r
  FROM p
  LEFT JOIN (
    SELECT ne.dst AS id, sum(x.r * ne.w) AS gathered
    FROM x{i} x JOIN ne ON ne.src = x.id GROUP BY ne.dst
  ) g ON g.id = p.id
)""")
    return (
        head + "," + ",".join(steps)
        + f"\nSELECT id, round(r, 8) AS rank_r FROM x{iters}"
    )


def _reciprocity_sql(per_node: bool) -> str:
    head = """
WITH nn AS (SELECT count(*) AS n FROM customer),
e2k AS (SELECT DISTINCT o_custkey AS src, o_orderkey % (SELECT n FROM nn) AS dst FROM orders)"""
    if not per_node:
        return head + """,
a AS (SELECT count(*) AS n_all FROM e2k),
r AS (
  SELECT count(*) AS n_recip FROM e2k a
  WHERE a.src <> a.dst
    AND EXISTS (SELECT 1 FROM e2k b WHERE b.src = a.dst AND b.dst = a.src)
)
SELECT round(CAST(r.n_recip AS DOUBLE) / a.n_all, 8) AS reciprocity_r FROM a, r"""
    return head + """,
s AS (SELECT src AS id, count(*) AS ns FROM e2k GROUP BY src),
pcnt AS (SELECT dst AS id, count(*) AS np FROM e2k GROUP BY dst),
o AS (
  SELECT a.src AS id, count(*) AS no FROM e2k a
  JOIN e2k b ON b.src = a.dst AND b.dst = a.src
  GROUP BY a.src
)
SELECT COALESCE(s.id, pcnt.id) AS id,
  round(2.0 * COALESCE(o.no, 0)
    / (COALESCE(s.ns, 0) + COALESCE(pcnt.np, 0)), 8) AS reciprocity_r
FROM s FULL OUTER JOIN pcnt ON pcnt.id = s.id
LEFT JOIN o ON o.id = COALESCE(s.id, pcnt.id)"""


def _sssp_sql(rounds: int = 12) -> str:
    """Unrolled min-plus relaxation (Bellman–Ford): d_{t+1} =
    min(d_t, min over edges(d_t[src] + w)). Monotone non-increasing,
    idempotent at the fixpoint (measured: 6 rounds at sf0.01), so
    extra rounds are harmless."""
    head = """
WITH nn AS MATERIALIZED (SELECT count(*) AS n FROM customer),
ew AS MATERIALIZED (
  SELECT o_custkey AS src, o_orderkey % (SELECT n FROM nn) AS dst,
         min(1.0 + (o_orderkey % 5)) AS w
  FROM orders GROUP BY 1, 2
),
d0 AS MATERIALIZED (SELECT CAST(1 AS BIGINT) AS id, 0.0 AS dist)"""
    steps = []
    for i in range(rounds):
        steps.append(f"""
d{i + 1} AS MATERIALIZED (
  SELECT id, min(dist) AS dist FROM (
    SELECT id, dist FROM d{i}
    UNION ALL
    SELECT ew.dst AS id, d.dist + ew.w AS dist
    FROM d{i} d JOIN ew ON ew.src = d.id
  ) GROUP BY id
)""")
    return (
        head + "," + ",".join(steps)
        + f"""
SELECT d.id, round(d.dist, 6) AS dist_r
FROM d{rounds} d JOIN customer c ON c.c_custkey = d.id"""
    )


def _sssp_tree_sql(rounds: int = 12) -> str:
    """_sssp_sql's fixpoint + post-hoc tight-edge predecessor: pred(v)
    = min src with dist(src) + w == dist(v) (exact float equality —
    the winning relaxation computed dist(v) as exactly that sum)."""
    base = _sssp_sql(rounds)
    head, _, _ = base.rpartition("SELECT d.id, round(d.dist, 6) AS dist_r")
    return (
        head
        + f""",
tight AS (
  SELECT ew.dst AS id, min(ew.src) AS pred
  FROM ew JOIN d{rounds} a ON a.id = ew.src JOIN d{rounds} b ON b.id = ew.dst
  WHERE a.dist + ew.w = b.dist
  GROUP BY ew.dst
)
SELECT d.id, round(d.dist, 6) AS dist_r,
       CASE WHEN d.id = 1 THEN -1 ELSE COALESCE(t.pred, -1) END AS pred
FROM d{rounds} d LEFT JOIN tight t ON t.id = d.id
JOIN customer c ON c.c_custkey = d.id"""
    )


def _topo_generations_sql() -> str:
    """Max-plus longest-path layering on the DAG restriction
    (src < dst): generation(v) = max path length ending at v —
    identical to Kahn peeling rounds. Recursive CTE state space is
    (id, gen) pairs, bounded by n * depth on a DAG."""
    return """
WITH RECURSIVE nn AS (SELECT count(*) AS n FROM customer),
e AS (
  SELECT DISTINCT o_custkey AS src, o_orderkey % (SELECT n FROM nn) AS dst
  FROM orders
  WHERE o_custkey < o_orderkey % (SELECT n FROM nn)
),
g(id, gen) AS (
  SELECT c_custkey, 0 FROM customer
  UNION
  SELECT e.dst, g.gen + 1 FROM g JOIN e ON e.src = g.id WHERE g.gen < 5000
)
SELECT id, CAST(max(gen) AS BIGINT) AS generation FROM g GROUP BY id"""


def _sqdist_duck(vec_a: str, vec_b: str, dim: int) -> str:
    """Sequential-fold squared distance between two DOUBLE[] exprs —
    same summation order as the engine's F.aggregate left fold."""
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, {dim + 1}), "
        f"i -> ({vec_a}[i] - {vec_b}[i]) * ({vec_a}[i] - {vec_b}[i]))), "
        "(a, b) -> a + b)"
    )


def _ivf_sql(
    dim: int = 64,
    n_centroids: int = 8,
    iters: int = 2,
    nprobe: int = 2,
    k: int = 10,
    n_queries: int = 8,
) -> str:
    """Mirror of ``similarity.ivf_topk``: deterministic Lloyd k-means
    (init = lowest-id vectors; assignment by squared distance rounded
    to 6, ties to lower cid; per-dim means rounded to 9; empty
    clusters keep their centroid), then nprobe-nearest-cell probing
    and cosine top-k with scores rounded to 6."""
    d_expr = _sqdist_duck("e.ed", "c.c", dim)
    parts = [f"""
WITH emb AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ed FROM embeddings
),
cent0 AS MATERIALIZED (
  SELECT vec_id AS cid, ed AS c FROM emb WHERE vec_id < {n_centroids}
)"""]
    for t in range(1, iters + 1):
        parts.append(f""",
asg{t} AS MATERIALIZED (
  SELECT vec_id, ed, cid FROM (
    SELECT e.vec_id, e.ed, c.cid,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY round({d_expr}, 6) ASC, c.cid ASC) AS rn
    FROM emb e CROSS JOIN cent{t - 1} c
  ) WHERE rn = 1
),
m{t} AS MATERIALIZED (
  SELECT cid, i AS pos, round(avg(ed[i]), 9) AS m
  FROM asg{t}, UNNEST(range(1, {dim + 1})) AS u(i)
  GROUP BY cid, i
),
cent{t} AS MATERIALIZED (
  SELECT c.cid, COALESCE(lst.l, c.c) AS c
  FROM cent{t - 1} c LEFT JOIN (
    SELECT cid, list(m ORDER BY pos) AS l FROM m{t} GROUP BY cid
  ) lst ON lst.cid = c.cid
)""")
    parts.append(f""",
fa AS MATERIALIZED (
  SELECT vec_id, ed, cid AS cluster FROM (
    SELECT e.vec_id, e.ed, c.cid,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY round({d_expr}, 6) ASC, c.cid ASC) AS rn
    FROM emb e CROSS JOIN cent{iters} c
  ) WHERE rn = 1
),
qp AS (
  SELECT vec_id AS query_id, ed AS qv, cid AS cluster FROM (
    SELECT e.vec_id, e.ed, c.cid,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY round({d_expr}, 6) ASC, c.cid ASC) AS rn
    FROM emb e CROSS JOIN cent{iters} c
    WHERE e.vec_id < {n_queries}
  ) WHERE rn <= {nprobe}
),
scored AS (
  SELECT qp.query_id, fa.vec_id AS neighbor_id,
    round(list_dot_product(qp.qv, fa.ed)
      / greatest(sqrt(list_dot_product(qp.qv, qp.qv))
          * sqrt(list_dot_product(fa.ed, fa.ed)), 1e-300), 6) AS score
  FROM qp JOIN fa ON fa.cluster = qp.cluster
  WHERE fa.vec_id <> qp.query_id
),
r AS (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id
      ORDER BY score DESC, neighbor_id ASC) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, rnk FROM r WHERE rnk <= {k}""")
    return "".join(parts)


def _hex8_duck(h: str) -> str:
    """BIGINT value of the first 8 hex chars of md5 expr ``h``."""
    terms = [
        f"(instr('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def _doc_fingerprints_sql() -> str:
    tok_hash = _hex8_duck("md5(tok)")
    return f"""
WITH tk AS (
  SELECT doc_id, text,
    regexp_split_to_array(trim(text), '\\s+') AS t
  FROM documents
),
hv AS (
  SELECT doc_id, text,
    list_transform(t, tok -> {tok_hash}) AS hs
  FROM tk
)
SELECT doc_id,
  list_reduce(list_prepend(CAST(0 AS BIGINT), hs),
    (acc, x) -> (acc * {tx.ROLLING_MULT} + x) % {tx.ROLLING_MOD}) AS rolling_fp,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_tokens
FROM hv"""


def _avg_nbr_degree_sql() -> str:
    return """
WITH nn AS (SELECT count(*) AS n FROM customer),
e AS (SELECT DISTINCT o_custkey AS src, o_orderkey % (SELECT n FROM nn) AS dst FROM orders),
deg AS (SELECT src AS id, count(*) AS d FROM e GROUP BY src),
nd AS (
  SELECT e.src AS id, avg(COALESCE(deg.d, 0)) AS a
  FROM e LEFT JOIN deg ON deg.id = e.dst
  GROUP BY e.src
)
SELECT c.c_custkey AS id, round(COALESCE(nd.a, 0.0), 8) AS avg_nbr_degree_r
FROM customer c LEFT JOIN nd ON nd.id = c.c_custkey"""


def _betweenness_sql(src_mod: int = 100, depth: int = 7) -> str:
    """Unrolled Brandes sigma/delta over the order graph for the
    sampled sources (custkey % src_mod == 1): layer CTEs l0..lD via
    frontier expansion with ANTI-JOIN dedup, then backward delta CTEs
    dD..d1; betweenness = per-id sum of deltas over layers ≥ 1.
    ``depth`` must exceed the graph's max eccentricity (measured 6 at
    sf0.01/sf0.001). Every CTE is MATERIALIZED: the l/seen chain is
    multiply-referenced, and DuckDB's default inlining re-expands it
    per reference — near-exponential plan growth that exhausts file
    descriptors re-opening the parquet behind the views."""
    parts = [
        "WITH nn AS (SELECT count(*) AS n FROM customer),",
        "eraw AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,"
        " CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT) AS dst FROM orders),",
        "ee AS (SELECT eraw.src, eraw.dst FROM eraw"
        " JOIN customer a ON a.c_custkey = eraw.src"
        " JOIN customer b ON b.c_custkey = eraw.dst"
        " WHERE eraw.src <> eraw.dst),",
        f"l0 AS (SELECT CAST(c_custkey AS BIGINT) AS s,"
        f" CAST(c_custkey AS BIGINT) AS id, CAST(1 AS DOUBLE) AS sigma"
        f" FROM customer WHERE c_custkey % {src_mod} = 1),",
        "seen0 AS (SELECT s, id FROM l0),",
    ]
    for d in range(1, depth + 1):
        parts.append(
            f"l{d} AS (SELECT x.s, x.id, SUM(x.sig) AS sigma FROM ("
            f"SELECT l{d-1}.s AS s, ee.dst AS id, l{d-1}.sigma AS sig"
            f" FROM l{d-1} JOIN ee ON ee.src = l{d-1}.id) x"
            f" ANTI JOIN seen{d-1} sn ON sn.s = x.s AND sn.id = x.id"
            f" GROUP BY x.s, x.id),"
        )
        parts.append(
            f"seen{d} AS (SELECT s, id FROM seen{d-1}"
            f" UNION ALL SELECT s, id FROM l{d}),"
        )
    parts.append(
        f"d{depth} AS (SELECT s, id, sigma, CAST(0 AS DOUBLE) AS delta FROM l{depth}),"
    )
    for d in range(depth - 1, -1, -1):
        parts.append(
            f"d{d} AS (SELECT l{d}.s, l{d}.id, l{d}.sigma,"
            f" l{d}.sigma * COALESCE(c.wsum, 0) AS delta"
            f" FROM l{d} LEFT JOIN ("
            f"SELECT dn.s, ee.src, SUM((1 + dn.delta) / dn.sigma) AS wsum"
            f" FROM ee JOIN d{d+1} dn ON dn.id = ee.dst GROUP BY dn.s, ee.src"
            f") c ON c.s = l{d}.s AND c.src = l{d}.id),"
        )
    acc = " UNION ALL ".join(
        f"SELECT id, delta FROM d{d}" for d in range(1, depth + 1)
    )
    parts.append(f"acc AS ({acc}),")
    parts.append("b AS (SELECT id, SUM(delta) AS bt FROM acc GROUP BY id)")
    parts.append(
        "SELECT CAST(c.c_custkey AS BIGINT) AS id,"
        " round(COALESCE(b.bt, 0), 6) AS betweenness_r"
        " FROM customer c LEFT JOIN b ON b.id = c.c_custkey"
    )
    return "\n".join(parts).replace(" AS (", " AS MATERIALIZED (")


def _weighted_betweenness_sql(
    src_mod: int = 100, rounds: int = 12, edge_mode: bool = False
) -> str:
    """Unrolled WEIGHTED Brandes over the weighted order graph
    (w = 1 + o_orderkey % 5, min per parallel edge): ``rounds``
    relaxation CTEs (min-plus, one edge per round) -> tight-edge DAG
    -> hop-indexed sigma (sig_h = # tight paths of exactly h edges;
    total sigma = Σ_h) -> ``rounds`` fixpoint iterations of the delta
    recursion delta(v) = Σ_tight(v,w) sigma(v)/sigma(w)·(1+delta(w)),
    exact once iterations exceed the DAG depth (probed max shortest-
    path hops: 7 at sf0.01 — 12 gives slack). Integer-valued weights
    keep every dist sum exact in float, so the tight-edge equality is
    bit-safe; round(…, 6) absorbs delta summation-order divergence."""
    parts = [
        "WITH nn AS (SELECT count(*) AS n FROM customer),",
        "eraw AS (SELECT CAST(o_custkey AS BIGINT) AS src,"
        " CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT) AS dst,"
        " CAST(1 + (o_orderkey % 5) AS DOUBLE) AS w FROM orders),",
        "ee AS (SELECT eraw.src, eraw.dst, MIN(eraw.w) AS w FROM eraw"
        " JOIN customer a ON a.c_custkey = eraw.src"
        " JOIN customer b ON b.c_custkey = eraw.dst"
        " WHERE eraw.src <> eraw.dst GROUP BY eraw.src, eraw.dst),",
        f"src0 AS (SELECT CAST(c_custkey AS BIGINT) AS s FROM customer"
        f" WHERE c_custkey % {src_mod} = 1),",
        "r0 AS (SELECT s, s AS id, CAST(0 AS DOUBLE) AS dist FROM src0),",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"r{k} AS (SELECT s, id, MIN(dist) AS dist FROM ("
            f"SELECT s, id, dist FROM r{k-1}"
            f" UNION ALL"
            f" SELECT r.s, ee.dst AS id, r.dist + ee.w AS dist"
            f" FROM r{k-1} r JOIN ee ON ee.src = r.id"
            f") GROUP BY s, id),"
        )
    parts.append(
        f"tight AS (SELECT a.s, ee.src, ee.dst, b.dist AS dd"
        f" FROM ee JOIN r{rounds} a ON a.id = ee.src"
        f" JOIN r{rounds} b ON b.s = a.s AND b.id = ee.dst"
        f" WHERE a.dist + ee.w = b.dist),"
    )
    parts.append("sig0 AS (SELECT s, s AS id, CAST(1 AS DOUBLE) AS sigma FROM src0),")
    for h in range(1, rounds + 1):
        parts.append(
            f"sig{h} AS (SELECT t.s, t.dst AS id, SUM(p.sigma) AS sigma"
            f" FROM tight t JOIN sig{h-1} p ON p.s = t.s AND p.id = t.src"
            f" GROUP BY t.s, t.dst),"
        )
    sig_union = " UNION ALL ".join(
        f"SELECT s, id, sigma FROM sig{h}" for h in range(0, rounds + 1)
    )
    parts.append(
        f"sigma AS (SELECT s, id, SUM(sigma) AS sigma FROM ({sig_union})"
        f" GROUP BY s, id),"
    )
    parts.append(
        "del0 AS (SELECT s, id, sigma, CAST(0 AS DOUBLE) AS delta FROM sigma),"
    )
    for i in range(1, rounds + 1):
        parts.append(
            f"del{i} AS (SELECT sg.s, sg.id, sg.sigma,"
            f" sg.sigma * COALESCE(x.wsum, 0) AS delta"
            f" FROM sigma sg LEFT JOIN ("
            f"SELECT t.s, t.src, SUM((1 + dn.delta) / dn.sigma) AS wsum"
            f" FROM tight t JOIN del{i-1} dn ON dn.s = t.s AND dn.id = t.dst"
            f" GROUP BY t.s, t.src"
            f") x ON x.s = sg.s AND x.src = sg.id),"
        )
    if edge_mode:
        # per-tight-edge credit sigma(v)*(1+delta(w))/sigma(w) with the
        # FINAL delta fixpoint of the dst (_accumulate_edges), summed
        # over sources; zero-credit edges kept via LEFT JOIN on ee
        parts.append(
            f"ecred AS (SELECT t.src, t.dst,"
            f" SUM(sg.sigma * (1 + dn.delta) / dn.sigma) AS credit"
            f" FROM tight t"
            f" JOIN del{rounds} dn ON dn.s = t.s AND dn.id = t.dst"
            f" JOIN sigma sg ON sg.s = t.s AND sg.id = t.src"
            f" GROUP BY t.src, t.dst)"
        )
        parts.append(
            "SELECT ee.src, ee.dst,"
            " round(COALESCE(ecred.credit, 0), 6) AS betweenness_r"
            " FROM ee LEFT JOIN ecred"
            " ON ecred.src = ee.src AND ecred.dst = ee.dst"
        )
        return "\n".join(parts).replace(" AS (", " AS MATERIALIZED (")
    parts.append(
        f"b AS (SELECT id, SUM(delta) AS bt FROM del{rounds}"
        f" WHERE id <> s GROUP BY id)"
    )
    parts.append(
        "SELECT CAST(c.c_custkey AS BIGINT) AS id,"
        " round(COALESCE(b.bt, 0), 6) AS betweenness_r"
        " FROM customer c LEFT JOIN b ON b.id = c.c_custkey"
    )
    return "\n".join(parts).replace(" AS (", " AS MATERIALIZED (")


def _edge_betweenness_sql(src_mod: int = 100, depth: int = 7) -> str:
    """Unrolled Brandes EDGE betweenness — the same sigma/delta chain
    as ``_betweenness_sql``; the edge credit is the backward pass's
    per-DAG-edge term sigma(v)·(1+delta(w))/sigma(w) (v one layer
    below w), summed over layers and sources. Zero-credit edges kept
    via LEFT JOIN onto the full distinct edge set."""
    parts = [
        "WITH nn AS (SELECT count(*) AS n FROM customer),",
        "eraw AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,"
        " CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT) AS dst FROM orders),",
        "ee AS (SELECT eraw.src, eraw.dst FROM eraw"
        " JOIN customer a ON a.c_custkey = eraw.src"
        " JOIN customer b ON b.c_custkey = eraw.dst"
        " WHERE eraw.src <> eraw.dst),",
        f"l0 AS (SELECT CAST(c_custkey AS BIGINT) AS s,"
        f" CAST(c_custkey AS BIGINT) AS id, CAST(1 AS DOUBLE) AS sigma"
        f" FROM customer WHERE c_custkey % {src_mod} = 1),",
        "seen0 AS (SELECT s, id FROM l0),",
    ]
    for d in range(1, depth + 1):
        parts.append(
            f"l{d} AS (SELECT x.s, x.id, SUM(x.sig) AS sigma FROM ("
            f"SELECT l{d-1}.s AS s, ee.dst AS id, l{d-1}.sigma AS sig"
            f" FROM l{d-1} JOIN ee ON ee.src = l{d-1}.id) x"
            f" ANTI JOIN seen{d-1} sn ON sn.s = x.s AND sn.id = x.id"
            f" GROUP BY x.s, x.id),"
        )
        parts.append(
            f"seen{d} AS (SELECT s, id FROM seen{d-1}"
            f" UNION ALL SELECT s, id FROM l{d}),"
        )
    parts.append(
        f"d{depth} AS (SELECT s, id, sigma, CAST(0 AS DOUBLE) AS delta FROM l{depth}),"
    )
    for d in range(depth - 1, -1, -1):
        parts.append(
            f"ec{d} AS (SELECT ee.src, ee.dst,"
            f" SUM(l{d}.sigma * (1 + dn.delta) / dn.sigma) AS credit"
            f" FROM ee JOIN d{d+1} dn ON dn.id = ee.dst"
            f" JOIN l{d} ON l{d}.s = dn.s AND l{d}.id = ee.src"
            f" GROUP BY ee.src, ee.dst),"
        )
        parts.append(
            f"d{d} AS (SELECT l{d}.s, l{d}.id, l{d}.sigma,"
            f" l{d}.sigma * COALESCE(c.wsum, 0) AS delta"
            f" FROM l{d} LEFT JOIN ("
            f"SELECT dn.s, ee.src, SUM((1 + dn.delta) / dn.sigma) AS wsum"
            f" FROM ee JOIN d{d+1} dn ON dn.id = ee.dst GROUP BY dn.s, ee.src"
            f") c ON c.s = l{d}.s AND c.src = l{d}.id),"
        )
    acc = " UNION ALL ".join(
        f"SELECT src, dst, credit FROM ec{d}" for d in range(0, depth)
    )
    parts.append(f"acc AS ({acc}),")
    parts.append(
        "b AS (SELECT src, dst, SUM(credit) AS bt FROM acc GROUP BY src, dst)"
    )
    parts.append(
        "SELECT ee.src, ee.dst, round(COALESCE(b.bt, 0), 6) AS betweenness_r"
        " FROM ee LEFT JOIN b ON b.src = ee.src AND b.dst = ee.dst"
    )
    return "\n".join(parts).replace(" AS (", " AS MATERIALIZED (")


def _harmonic_sampled_sql(src_mod: int = 25, max_layer: int = 7) -> str:
    """Multi-source BFS (recursive CTE keyed (s, id, layer), min-layer
    per pair) from the sampled origins, then per-target aggregates —
    mirror of ``sampled_closeness_harmonic``."""
    return f"""
WITH RECURSIVE nn AS (SELECT count(*) AS n FROM customer),
eraw AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
  CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT) AS dst FROM orders),
ee AS (SELECT eraw.src, eraw.dst FROM eraw
  JOIN customer b ON b.c_custkey = eraw.dst),
r(s, id, layer) AS (
  SELECT CAST(c_custkey AS BIGINT), CAST(c_custkey AS BIGINT), 0
  FROM customer WHERE c_custkey % {src_mod} = 1
  UNION
  SELECT r.s, ee.dst, r.layer + 1 FROM r JOIN ee ON ee.src = r.id
  WHERE r.layer < {max_layer}
),
d AS (SELECT s, id, MIN(layer) AS l FROM r GROUP BY s, id),
agg AS (
  SELECT id, count(*) AS n_reached, SUM(l) AS dist_sum,
         SUM(1.0 / l) AS harm
  FROM d WHERE l > 0 GROUP BY id
)
SELECT CAST(c.c_custkey AS BIGINT) AS id,
  COALESCE(agg.n_reached, 0) AS n_reached,
  CAST(COALESCE(agg.dist_sum, 0) AS BIGINT) AS dist_sum,
  round(COALESCE(agg.harm, 0.0), 8) AS harmonic_r
FROM customer c LEFT JOIN agg ON agg.id = c.c_custkey"""


def _condensation_sql() -> str:
    """Condensation edges from the SCC labeling (same mutual-
    reachability closure as ``_scc_sql``), contracted and deduped."""
    return """
WITH RECURSIVE nn AS (SELECT count(*) AS n FROM customer),
e AS (
  SELECT DISTINCT o_custkey AS src, o_orderkey % (SELECT n FROM nn) AS dst
  FROM orders WHERE o_orderkey % 3 <> 0
),
nodes AS (SELECT c_custkey AS id FROM customer),
reach(a, b) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
),
scc AS (
  SELECT r1.a AS id, max(r1.b) AS component
  FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a
  GROUP BY r1.a
)
SELECT DISTINCT cs.component AS src, cd.component AS dst
FROM e
JOIN scc cs ON cs.id = e.src
JOIN scc cd ON cd.id = e.dst
WHERE cs.component <> cd.component"""


def _topo_sort_sql() -> str:
    """Topo generations (same recursive CTE as
    ``_topo_generations_sql``) plus a deterministic dense rank over
    (generation, id)."""
    return """
WITH RECURSIVE nn AS (SELECT count(*) AS n FROM customer),
e AS (
  SELECT DISTINCT o_custkey AS src, o_orderkey % (SELECT n FROM nn) AS dst
  FROM orders
  WHERE o_custkey < o_orderkey % (SELECT n FROM nn)
),
g(id, gen) AS (
  SELECT c_custkey, 0 FROM customer
  UNION
  SELECT e.dst, g.gen + 1 FROM g JOIN e ON e.src = g.id WHERE g.gen < 5000
),
f AS (SELECT id, CAST(max(gen) AS BIGINT) AS generation FROM g GROUP BY id)
SELECT id, generation,
  CAST(row_number() OVER (ORDER BY generation, id) - 1 AS BIGINT) AS topo_rank
FROM f"""


def _ktruss_sql(k: int = 4, rounds: int = 10) -> str:
    """Unrolled k-truss peeling: per round enumerate triangles of the
    surviving edge set (a<b<c), scatter to the three edges, keep
    support >= k-2. Idempotent at the fixpoint, so extra rounds are
    harmless. r5: the sf0.1 gate caught the 4-round unroll UNDER-
    peeled at sf0.1 (2 rounds suffice at sf0.01; the engine needs 7
    removal rounds there and the 106-edge excess was the oracle's),
    so the unroll is now 10."""
    head = f"WITH {_PAIRS_CTE}, t0 AS MATERIALIZED (SELECT src, dst FROM pairs)"
    steps = []
    for i in range(rounds):
        steps.append(f"""
tri{i} AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM t{i} e1
  JOIN t{i} e2 ON e2.src = e1.dst
  JOIN t{i} e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
sup{i} AS MATERIALIZED (
  SELECT src, dst, count(*) AS s FROM (
    SELECT a AS src, b AS dst FROM tri{i}
    UNION ALL SELECT b, c FROM tri{i}
    UNION ALL SELECT a, c FROM tri{i}
  ) GROUP BY src, dst
),
t{i + 1} AS MATERIALIZED (
  SELECT t.src, t.dst FROM t{i} t
  LEFT JOIN sup{i} s ON s.src = t.src AND s.dst = t.dst
  WHERE COALESCE(s.s, 0) >= {k - 2}
)""")
    return head + "," + ",".join(steps) + f"\nSELECT src, dst FROM t{rounds}"


def _nation_quotient_sql() -> str:
    return """
WITH nn AS (SELECT count(*) AS n FROM customer),
e AS (SELECT o_custkey AS src, o_orderkey % (SELECT n FROM nn) AS dst FROM orders)
SELECT CAST(cs.c_nationkey AS BIGINT) AS src,
       CAST(cd.c_nationkey AS BIGINT) AS dst,
       CAST(count(*) AS DOUBLE) AS w
FROM e
JOIN customer cs ON cs.c_custkey = e.src
JOIN customer cd ON cd.c_custkey = e.dst
WHERE cs.c_nationkey <> cd.c_nationkey
GROUP BY 1, 2"""


def _part_projection_sql() -> str:
    return """
WITH m AS (SELECT DISTINCT l_partkey AS u, l_orderkey AS v FROM lineitem)
SELECT a.u AS u1, b.u AS u2, CAST(count(*) AS DOUBLE) AS w
FROM m a JOIN m b ON a.v = b.v AND a.u < b.u
GROUP BY 1, 2"""


def _closeness_sql() -> str:
    """Incoming-distance BFS from node 1 (recursive CTE on reversed
    edges), then the Wasserman–Faust-improved closeness and harmonic
    sums — mirror of ``closeness_centrality`` / ``harmonic_centrality``."""
    return """
WITH RECURSIVE nn AS (SELECT count(*) AS n FROM customer),
e AS (SELECT DISTINCT o_custkey AS src, o_orderkey % (SELECT n FROM nn) AS dst FROM orders),
r(id, layer) AS (
  SELECT CAST(1 AS BIGINT), 0
  UNION
  SELECT e.src, r.layer + 1 FROM r JOIN e ON e.dst = r.id WHERE r.layer < 40
),
d AS (
  SELECT r.id, min(r.layer) AS l
  FROM r JOIN customer c ON c.c_custkey = r.id
  GROUP BY r.id
),
s AS (SELECT count(*) AS rc, sum(l) AS tot, sum(CASE WHEN l > 0 THEN 1.0 / l END) AS harm FROM d)
SELECT
  round(CASE WHEN rc <= 1 OR tot = 0 THEN 0.0
    ELSE (CAST(rc - 1 AS DOUBLE) / tot) * (CAST(rc - 1 AS DOUBLE) / ((SELECT n FROM nn) - 1))
  END, 8) AS closeness_r,
  round(COALESCE(harm, 0.0), 8) AS harmonic_r
FROM s"""


def _assortativity_sql() -> str:
    return f"""
WITH {_PAIRS_CTE},
sym AS (SELECT src, dst FROM pairs UNION ALL SELECT dst AS src, src AS dst FROM pairs),
deg AS (SELECT src AS id, count(*) AS d FROM sym GROUP BY src)
SELECT round(corr(a.d, b.d), 6) AS assortativity_r
FROM sym JOIN deg a ON a.id = sym.src JOIN deg b ON b.id = sym.dst"""


def _dispersion_sql() -> str:
    # Backstrom-Kleinberg dispersion re-derived in SQL: ST pairs and
    # the non-adjacency condition are u<->v symmetric (computed once on
    # the canonical edge and mirrored); the third-tie witness EXISTS is
    # evaluated per ORDERED pair because w must lie inside N(u).
    return """
WITH nn AS (SELECT count(*) AS n FROM customer),
e AS MATERIALIZED (
  SELECT DISTINCT
    least(CAST(o_custkey AS BIGINT),
          CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT)) AS u,
    greatest(CAST(o_custkey AS BIGINT),
             CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT)) AS v
  FROM orders
  WHERE CAST(o_custkey AS BIGINT)
        <> CAST(o_orderkey % (SELECT n FROM nn) AS BIGINT)
),
sym AS MATERIALIZED (
  SELECT u AS x, v AS w FROM e UNION ALL SELECT v AS x, u AS w FROM e
),
cn AS MATERIALIZED (
  SELECT e.u, e.v, a.w AS s
  FROM e JOIN sym a ON a.x = e.u JOIN sym b ON b.x = e.v AND b.w = a.w
),
emb0 AS (SELECT u, v, count(*) AS emb FROM cn GROUP BY u, v),
emb AS (SELECT u, v, emb FROM emb0 UNION ALL SELECT v AS u, u AS v, emb FROM emb0),
p0 AS MATERIALIZED (
  SELECT c1.u, c1.v, c1.s, c2.s AS t
  FROM cn c1 JOIN cn c2 ON c1.u = c2.u AND c1.v = c2.v AND c1.s < c2.s
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = c1.s AND e.v = c2.s)
),
p AS MATERIALIZED (
  SELECT u, v, s, t FROM p0 UNION ALL SELECT v AS u, u AS v, s, t FROM p0
),
surv AS (
  SELECT p.u, p.v, count(*) AS total FROM p
  WHERE NOT EXISTS (
    SELECT 1 FROM sym a
    JOIN sym b ON b.x = p.t AND b.w = a.w
    JOIN sym cu ON cu.x = p.u AND cu.w = a.w
    WHERE a.x = p.s AND a.w <> p.v)
  GROUP BY p.u, p.v
),
oe AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e)
SELECT oe.u, oe.v,
       CAST(COALESCE(emb.emb, 0) AS BIGINT) AS embeddedness,
       ROUND(CASE WHEN COALESCE(emb.emb, 0) = 0 THEN 0.0
                  ELSE CAST(COALESCE(surv.total, 0) AS DOUBLE) / emb.emb
             END, 8) AS dispersion_r
FROM oe
LEFT JOIN emb ON emb.u = oe.u AND emb.v = oe.v
LEFT JOIN surv ON surv.u = oe.u AND surv.v = oe.v"""


def _link_embeddedness_sql() -> str:
    return f"""
WITH {_PAIRS_CTE},
sym AS (SELECT src, dst FROM pairs UNION ALL SELECT dst AS src, src AS dst FROM pairs),
w AS (
  SELECT a.dst AS u, b.dst AS v, count(*) AS cn
  FROM sym a JOIN sym b ON a.src = b.src AND a.dst < b.dst
  GROUP BY a.dst, b.dst
)
SELECT w.u, w.v, w.cn FROM w JOIN pairs p ON p.src = w.u AND p.dst = w.v"""


# supplier ring-chain graph (supplier_ringchain_graph) re-derived in
# SQL, plus its closed-form biconnectivity facts: bridges are the
# inter-nation rep-chain edges and the lone edge of 2-supplier
# nations; each >=3-supplier nation ring is one block whose canonical
# (lexicographically smallest) edge is (min key, 2nd-min key);
# articulation points are the chain-interior reps plus chain-endpoint
# reps whose nation has >= 2 suppliers.
def _ringchain_cte(where: str = "") -> str:
    return _RINGCHAIN_CTE_TMPL.format(where=where)


_RINGCHAIN_CTE_TMPL = """
s AS (SELECT s_suppkey AS k, s_nationkey AS nk FROM supplier{where}),
r AS (
  SELECT k, nk,
         row_number() OVER (PARTITION BY nk ORDER BY k) AS rn,
         count(*) OVER (PARTITION BY nk) AS cnt,
         lead(k) OVER (PARTITION BY nk ORDER BY k) AS nxt,
         min(k) OVER (PARTITION BY nk) AS rep
  FROM s),
path AS (SELECT k AS src, nxt AS dst, nk, cnt FROM r WHERE nxt IS NOT NULL),
closing AS (SELECT rep AS src, k AS dst, nk, cnt FROM r WHERE rn = cnt AND cnt >= 3),
reps AS (
  SELECT nk, rep, cnt,
         row_number() OVER (ORDER BY nk) AS i,
         count(*) OVER () AS kk
  FROM (SELECT DISTINCT nk, rep, cnt FROM r)),
chain AS (
  SELECT least(rep, lead(rep) OVER (ORDER BY nk)) AS src,
         greatest(rep, lead(rep) OVER (ORDER BY nk)) AS dst
  FROM reps QUALIFY lead(rep) OVER (ORDER BY nk) IS NOT NULL)
"""


def _voterank_sql(k: int = 6) -> str:
    """Unrolled VoteRank election over the order graph — one CTE
    block per round (score gather, top-1 with min-id tie-break,
    floored ability update), mirroring voterank_alg.py exactly."""
    head = """
WITH nn AS MATERIALIZED (SELECT count(*) AS n FROM customer),
e AS MATERIALIZED (SELECT o_custkey AS src, o_orderkey % (SELECT n FROM nn) AS dst FROM orders),
avgd AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) / (SELECT n FROM nn) AS v FROM e),
nodes AS MATERIALIZED (SELECT c_custkey AS id FROM customer),
a0 AS MATERIALIZED (SELECT id, 1.0 AS ab FROM nodes)"""
    steps = []
    for i in range(k):
        excl = (
            "WHERE s.id NOT IN ("
            + " UNION ALL ".join(f"SELECT id FROM t{j}" for j in range(i))
            + ")"
            if i
            else ""
        )
        steps.append(f"""
s{i} AS MATERIALIZED (
  SELECT nodes.id, COALESCE(g.sc, 0) AS sc FROM nodes LEFT JOIN (
    SELECT e.src AS id, sum(a.ab) AS sc FROM e JOIN a{i} a ON a.id = e.dst GROUP BY e.src
  ) g ON g.id = nodes.id
),
t{i} AS MATERIALIZED (
  SELECT s.id, s.sc FROM s{i} s {excl} ORDER BY s.sc DESC, s.id LIMIT 1
),
a{i + 1} AS MATERIALIZED (
  SELECT a.id,
         CASE WHEN a.id = (SELECT id FROM t{i}) THEN 0.0
              ELSE greatest(a.ab - COALESCE(d.cnt, 0) / (SELECT v FROM avgd), 0.0)
         END AS ab
  FROM a{i} a LEFT JOIN (
    SELECT dst AS id, count(*) AS cnt FROM e
    WHERE src = (SELECT id FROM t{i}) GROUP BY dst
  ) d ON d.id = a.id
)""")
    finals = " UNION ALL ".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS seed_rank, id FROM t{i} WHERE sc > 0" for i in range(k)
    )
    return head + "," + ",".join(steps) + "\n" + finals


def _hash_split_sql() -> str:
    # identical threshold arithmetic to pipeline.hash_split — lowercase
    # hex prefixes compare like the numbers they encode
    t1 = format(int(0.9 * 16**8), "08x")
    t2 = format(int(0.95 * 16**8), "08x")
    return f"""
SELECT doc_id,
  CASE WHEN substr(md5(doc_id || '|split'), 1, 8) < '{t1}' THEN 'train'
       WHEN substr(md5(doc_id || '|split'), 1, 8) < '{t2}' THEN 'val'
       ELSE 'test' END AS split
FROM documents"""


def oracle_sql() -> dict[str, str]:
    lang_cols, lang_case = _lang_scores_sql()
    return {
        "pagerank_orders": _pagerank_sql(),
        "pagerank_orders_dist": _pagerank_sql(),
        "pages_pipeline_pagerank": _pipeline_pagerank_sql(),
        # analytic truths of the fixture graphs (exact for the fixed
        # 25-nation table; formulas hold for any ring size >= 3):
        # per-nation customer chains are vertex-disjoint paths (forest
        # always, tree iff one nation); a closed ring is Eulerian and
        # never a tree; an open path is a tree with an Euler path but
        # no circuit (two odd-degree endpoints).
        "embedding_quantized_topk": """
WITH qn AS (
  SELECT vec_id, embedding,
         list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max') AS amax
  FROM embeddings
),
qv AS (
  SELECT vec_id,
         CASE WHEN amax > 0
              THEN list_transform(embedding,
                     x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / amax) AS BIGINT))
              ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS q
  FROM qn
),
pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, len(a.q) + 1),
                                      i -> a.q[i] * b.q[i])) AS DOUBLE) AS idot,
         sqrt(CAST(list_sum(list_transform(a.q, x -> CAST(x * x AS DOUBLE))) AS DOUBLE)) AS na,
         sqrt(CAST(list_sum(list_transform(b.q, x -> CAST(x * x AS DOUBLE))) AS DOUBLE)) AS nb
  FROM qv a, qv b
  WHERE a.vec_id < 8 AND a.vec_id <> b.vec_id
),
r AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(idot / greatest(na * nb, 1e-300), 6) DESC,
                                     neighbor_id) AS rnk
  FROM pairs
)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 10""",
        "doc_chunks": r"""
WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
n AS (
  SELECT doc_id, t,
         CASE WHEN len(t) <= 128 THEN 1
              ELSE CAST(ceil((len(t) - 128) / 64.0) AS BIGINT) + 1 END AS nc
  FROM toks
)
SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
       CAST(len(t[k*64+1 : k*64+128]) AS BIGINT) AS n_chunk_tokens,
       array_to_string(t[k*64+1 : k*64+128], ' ') AS chunk_text
FROM n, UNNEST(range(0, nc)) AS u(k)""",
        "doc_repetition": r"""
WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
base AS (
  SELECT doc_id, t,
    CASE WHEN len(t) > 0
         THEN 1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
         ELSE 0.0 END AS dup_token_frac,
    CASE WHEN len(t) > 1
         THEN CAST(len(list_filter(range(1, len(t)), i -> t[i] = t[i+1])) AS DOUBLE)
              / (len(t) - 1)
         ELSE 0.0 END AS adjacent_dup_frac
  FROM toks
),
bg AS (
  SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
  FROM toks, UNNEST(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2
),
cnt AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
share AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS s FROM cnt GROUP BY doc_id)
SELECT b.doc_id,
       round(b.dup_token_frac, 8) AS dup_token_frac,
       round(b.adjacent_dup_frac, 8) AS adjacent_dup_frac,
       round(COALESCE(share.s, 0.0), 8) AS top_bigram_share
FROM base b LEFT JOIN share ON share.doc_id = b.doc_id""",
        # doc_id-derived contact block + the same four Java∩RE2
        # patterns as linkgraph/functions/scrub.py PII_PATTERNS,
        # applied in the same email→ssn→phone→ipv4 order
        "doc_pii_scrub": r"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
              || ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' tel 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
              || '-6789 ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1' AS t
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(t, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS BIGINT) AS n_ssn,
  CAST(len(regexp_extract_all(t, '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b')) AS BIGINT) AS n_phone,
  CAST(len(regexp_extract_all(t, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ipv4,
  md5(
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
        '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b', '<PHONE>', 'g'),
      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g')
  ) AS scrub_md5
FROM aug""",
        "doc_unigram_logprob": r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
  FROM documents WHERE len(trim(text)) > 0
),
vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM vocab),
sc AS (
  SELECT t.doc_id, count(*) AS n_tokens, avg(ln(v.cnt / tot.total)) AS lp
  FROM toks t JOIN vocab v USING (tok), tot
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(sc.n_tokens, 0) AS BIGINT) AS n_tokens,
       round(sc.lp, 6) AS avg_logprob_r
FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id""",
        "event_sessions": """
WITH s AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
m AS (
  SELECT user_id, us, event_type,
         CASE WHEN lag(us) OVER w IS NULL
                OR us - lag(us) OVER w > CAST(28800 AS BIGINT) * 1000000 THEN 1 ELSE 0 END AS st
  FROM s WINDOW w AS (PARTITION BY user_id ORDER BY us)
),
x AS (
  SELECT user_id, us, event_type,
         CAST(sum(st) OVER (PARTITION BY user_id ORDER BY us
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM m
)
SELECT user_id, session_seq, count(*) AS n_events,
       max(us) - min(us) AS duration_us,
       count(DISTINCT event_type) AS n_types
FROM x GROUP BY user_id, session_seq""",
        "url_parts": """
WITH u AS (
  SELECT c_custkey AS id,
         (CASE WHEN c_custkey % 3 = 0 THEN 'http' ELSE 'https' END)
         || '://nation' || c_nationkey || '.shop.example.com'
         || '/c/' || c_custkey
         || (CASE WHEN c_custkey % 2 = 0 THEN '/items' ELSE '' END)
         || (CASE WHEN c_custkey % 5 = 0 THEN '?utm_source=feed&pid=' || c_custkey
                  WHEN c_custkey % 5 = 1 THEN '?pid=' || c_custkey
                  ELSE '' END) AS url
  FROM customer
),
p AS (
  SELECT id, url,
         lower(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)) AS host,
         regexp_replace(regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1),
                        '^/+|/+$', '', 'g') AS path
  FROM u
)
SELECT id, host,
       regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS domain,
       CAST(CASE WHEN length(path) = 0 THEN 0
            ELSE len(list_filter(string_split_regex(path, '/+'), x -> x <> ''))
            END AS BIGINT) AS depth,
       url LIKE 'https://%' AS https,
       regexp_replace(regexp_replace(url, '(utm_[a-z]+|gclid|fbclid)=[^&#]*&?', '', 'g'),
                      '[?&]$', '', 'g') AS clean_url
FROM p""",
        "link_sh_parts": f"""
WITH {_PAIRS_CTE},
sym AS (SELECT src, dst FROM pairs UNION ALL SELECT dst AS src, src AS dst FROM pairs),
tri AS (
  SELECT a.src AS z, a.dst AS u, b.dst AS v
  FROM sym a JOIN sym b ON a.src = b.src AND a.dst < b.dst
),
c AS (SELECT p_partkey AS id, p_brand AS community FROM part)
SELECT t.u, t.v,
  CAST(count(*) + sum(CASE WHEN cu.community = cv.community
                        AND cz.community = cu.community THEN 1 ELSE 0 END) AS BIGINT) AS score
FROM tri t
JOIN c cz ON cz.id = t.z JOIN c cu ON cu.id = t.u JOIN c cv ON cv.id = t.v
GROUP BY t.u, t.v""",
        "voterank_orders": _voterank_sql(6),
        "graph_recognition": """
SELECT
  TRUE AS forest_chains,
  (SELECT count(DISTINCT c_nationkey) FROM customer) = 1 AS tree_chains,
  (SELECT count(*) FROM nation) >= 3 AS euler_ring,
  TRUE AS euler_path_ring,
  (SELECT count(*) FROM nation) < 3 AS tree_ring,
  (SELECT count(*) FROM nation) >= 3 AS euler_ring_directed,
  (SELECT count(*) FROM nation) = 1 AS euler_circuit_path,
  TRUE AS euler_path_path,
  TRUE AS tree_path""",
        "doc_decontaminate": r"""
WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
g AS (
  SELECT doc_id, md5(array_to_string(t[i:i+4], ' ')) AS gh
  FROM toks, UNNEST(range(1, len(t) - 3)) AS u(i)
  WHERE len(t) >= 5
),
dg AS (SELECT DISTINCT doc_id, gh FROM g WHERE doc_id % 20 <> 0),
bg AS (SELECT DISTINCT gh FROM g WHERE doc_id % 20 = 0),
hits AS (SELECT doc_id, count(*) AS n_hits FROM dg JOIN bg USING (gh) GROUP BY doc_id)
SELECT d.doc_id, COALESCE(h.n_hits, 0) AS n_hits,
       COALESCE(h.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
WHERE d.doc_id % 20 <> 0""",
        "doc_split": _hash_split_sql(),
        "doc_stratified_sample": """
WITH r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(doc_id || '|sample')) AS rn,
         count(*) OVER (PARTITION BY lang) AS cnt
  FROM documents)
SELECT doc_id, lang FROM r WHERE rn <= ceil(0.2 * cnt)""",
        "bridges_suppliers": f"""
WITH {_ringchain_cte()}
SELECT src, dst FROM chain
UNION ALL
SELECT src, dst FROM path WHERE cnt = 2""",
        "articulation_suppliers": f"""
WITH {_ringchain_cte(" WHERE s_nationkey < 8")}
SELECT rep AS id FROM reps
WHERE (i > 1 AND i < kk) OR ((i = 1 OR i = kk) AND kk >= 2 AND cnt >= 2)""",
        "biconn_labels_suppliers": f"""
WITH {_ringchain_cte()},
second AS (SELECT nk, k AS k2 FROM r WHERE rn = 2),
ring AS (
  SELECT src, dst, nk FROM path WHERE cnt >= 3
  UNION ALL
  SELECT src, dst, nk FROM closing
),
ringlab AS (
  SELECT ring.src, ring.dst, r2.rep AS bc_src, second.k2 AS bc_dst
  FROM ring
  JOIN (SELECT DISTINCT nk, rep FROM r) r2 ON r2.nk = ring.nk
  JOIN second ON second.nk = ring.nk
)
SELECT src, dst, bc_src, bc_dst FROM ringlab
UNION ALL
SELECT src, dst, src AS bc_src, dst AS bc_dst FROM chain
UNION ALL
SELECT src, dst, src AS bc_src, dst AS bc_dst FROM path WHERE cnt = 2""",
        "cc_nation_chains": """
SELECT c_custkey AS id, MIN(c_custkey) OVER (PARTITION BY c_nationkey) AS component
FROM customer""",
        "cc_nation_chains_dist": """
SELECT c_custkey AS id, MIN(c_custkey) OVER (PARTITION BY c_nationkey) AS component
FROM customer""",
        "find_cycle_nations": """
WITH seq AS (
  SELECT CAST(n_nationkey AS BIGINT) AS id,
         row_number() OVER (ORDER BY n_nationkey) - 1 AS pos
  FROM nation
)
SELECT s.pos AS pos, s.id AS src,
       COALESCE(s2.id, (SELECT min(id) FROM seq)) AS dst
FROM seq s LEFT JOIN seq s2 ON s2.pos = s.pos + 1""",
        "find_cycle_nations_dist": """
WITH seq AS (
  SELECT CAST(n_nationkey AS BIGINT) AS id,
         row_number() OVER (ORDER BY n_nationkey) - 1 AS pos
  FROM nation
)
SELECT s.pos AS pos, s.id AS src,
       COALESCE(s2.id, (SELECT min(id) FROM seq)) AS dst
FROM seq s LEFT JOIN seq s2 ON s2.pos = s.pos + 1""",
        "simple_cycles_orders": f"""
WITH {_EDGES_CTE},
ev AS (
  SELECT src, dst FROM e2k
  WHERE dst IN (SELECT c_custkey FROM customer)
),
s AS (SELECT src, dst FROM ev WHERE src != dst),
c1 AS (
  SELECT CAST(src AS VARCHAR) AS cycle, CAST(1 AS BIGINT) AS k
  FROM ev WHERE src = dst
),
c2 AS (
  SELECT CAST(a.src AS VARCHAR) || ',' || CAST(a.dst AS VARCHAR) AS cycle,
         CAST(2 AS BIGINT) AS k
  FROM s a JOIN s b ON b.src = a.dst AND b.dst = a.src
  WHERE a.src < a.dst
),
c3 AS (
  SELECT CAST(a.src AS VARCHAR) || ',' || CAST(a.dst AS VARCHAR)
           || ',' || CAST(b.dst AS VARCHAR) AS cycle,
         CAST(3 AS BIGINT) AS k
  FROM s a
  JOIN s b ON b.src = a.dst
  JOIN s c ON c.src = b.dst AND c.dst = a.src
  WHERE a.dst > a.src AND b.dst > a.src AND b.dst != a.dst
)
SELECT cycle, k FROM c1
UNION ALL SELECT cycle, k FROM c2
UNION ALL SELECT cycle, k FROM c3""",
        "girth_parts": f"""
WITH {_TRI_CTE},
und AS (
  SELECT src, dst FROM pairs
  UNION ALL
  SELECT dst AS src, src AS dst FROM pairs
),
g4 AS (
  SELECT 1 AS one
  FROM und e1
  JOIN und e2 ON e2.src = e1.dst
  JOIN und e3 ON e3.src = e2.dst
  JOIN und e4 ON e4.src = e3.dst AND e4.dst = e1.src
  WHERE e1.src < e1.dst AND e1.src < e2.dst AND e1.src < e3.dst
    AND e2.dst != e1.dst AND e3.dst != e1.dst AND e3.dst != e2.dst
  LIMIT 1
)
SELECT CASE WHEN EXISTS(SELECT 1 FROM tri) THEN 3.0
            WHEN EXISTS(SELECT 1 FROM g4) THEN 4.0
            ELSE CAST('Infinity' AS DOUBLE) END AS girth""",
        "component_sizes": """
SELECT MIN(c_custkey) AS component, count(*) AS n_nodes
FROM customer GROUP BY c_nationkey""",
        "triangles_parts": f"""
WITH {_TRI_CTE},
corners AS (
  SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
),
cnt AS (SELECT id, count(*) AS t FROM corners GROUP BY id)
SELECT p.p_partkey AS id, COALESCE(cnt.t, 0) AS triangles
FROM part p LEFT JOIN cnt ON cnt.id = p.p_partkey""",
        "triangles_parts_dist": f"""
WITH {_TRI_CTE},
corners AS (
  SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
),
cnt AS (SELECT id, count(*) AS t FROM corners GROUP BY id)
SELECT p.p_partkey AS id, COALESCE(cnt.t, 0) AS triangles
FROM part p LEFT JOIN cnt ON cnt.id = p.p_partkey""",
        "triangle_total_parts": f"WITH {_TRI_CTE} SELECT count(*) AS n_triangles FROM tri",
        "transitivity_parts": f"""
WITH {_TRI_CTE},
corners AS (
  SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
),
t3 AS (SELECT count(*) AS v FROM corners),
degs AS (
  SELECT id, count(*) AS d FROM (
    SELECT src AS id FROM pairs UNION ALL SELECT dst FROM pairs
  ) GROUP BY id
),
tr AS (SELECT sum(d * (d - 1)) AS v FROM degs)
SELECT round(CASE WHEN tr.v = 0 THEN 0.0
  ELSE 2.0 * t3.v / tr.v END, 8) AS transitivity_r
FROM t3, tr""",
        "out_degree_orders": f"""
WITH {_EDGES_CTE},
d AS (SELECT src, count(*) AS cnt FROM e GROUP BY src)
SELECT c.c_custkey AS id, CAST(COALESCE(d.cnt, 0) AS DOUBLE) AS degree
FROM customer c LEFT JOIN d ON d.src = c.c_custkey""",
        "degree_histogram_orders": f"""
WITH {_EDGES_CTE},
ends AS (SELECT src AS id FROM e UNION ALL SELECT dst FROM e),
d AS (SELECT id, count(*) AS cnt FROM ends GROUP BY id),
full_d AS (
  SELECT c.c_custkey AS id, COALESCE(d.cnt, 0) AS degree
  FROM customer c LEFT JOIN d ON d.id = c.c_custkey
)
SELECT degree, count(*) AS num_nodes FROM full_d GROUP BY degree""",
        "isolates_parts": f"""
WITH {_PAIRS_CTE}
SELECT p.p_partkey AS id FROM part p
WHERE p.p_partkey NOT IN (SELECT src FROM pairs)
  AND p.p_partkey NOT IN (SELECT dst FROM pairs)""",
        "selfloops_orders": f"""
WITH {_EDGES_CTE}
SELECT count(*) AS n_selfloops FROM e WHERE src = dst""",
        "density_orders": f"""
WITH {_EDGES_CTE},
m AS (SELECT count(*) AS v FROM e)
SELECT round(CAST(m.v AS DOUBLE) / ((SELECT n FROM nn) * ((SELECT n FROM nn) - 1)), 10) AS density_r
FROM m""",
        "mutual_edges_orders": f"""
WITH {_EDGES_CTE}
SELECT a.src, a.dst FROM e2k a
JOIN e2k b ON a.src = b.dst AND a.dst = b.src""",
        "oneway_edges_orders": f"""
WITH {_EDGES_CTE}
SELECT a.src, a.dst FROM e2k a
WHERE NOT EXISTS (SELECT 1 FROM e2k b WHERE b.src = a.dst AND b.dst = a.src)""",
        "compose_orders": f"""
WITH {_EDGES_CTE}
SELECT src, dst FROM e2k UNION SELECT dst AS src, src AS dst FROM e2k""",
        "subgraph_high_balance": f"""
WITH {_EDGES_CTE},
rich AS (SELECT c_custkey AS id FROM customer WHERE c_acctbal > 5000)
SELECT e.src, e.dst FROM e
JOIN rich r1 ON r1.id = e.src
JOIN rich r2 ON r2.id = e.dst""",
        "hits_orders": _hits_sql(8),
        "hits_orders_dist": _hits_sql(8),
        "clustering_parts": f"""
WITH {_TRI_CTE},
corners AS (
  SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
),
cnt AS (SELECT id, count(*) AS t FROM corners GROUP BY id),
degs AS (
  SELECT id, count(*) AS d FROM (
    SELECT src AS id FROM pairs UNION ALL SELECT dst FROM pairs
  ) GROUP BY id
)
SELECT p.p_partkey AS id,
  round(CASE WHEN COALESCE(degs.d, 0) < 2 THEN 0.0
    ELSE 2.0 * COALESCE(cnt.t, 0) / (degs.d * (degs.d - 1)) END, 8) AS clustering_r
FROM part p
LEFT JOIN degs ON degs.id = p.p_partkey
LEFT JOIN cnt ON cnt.id = p.p_partkey""",
        "bfs_layers_orders": """
WITH RECURSIVE nn AS (SELECT count(*) AS n FROM customer),
e AS (SELECT DISTINCT o_custkey AS src, o_orderkey % (SELECT n FROM nn) AS dst FROM orders),
r(id, layer) AS (
  SELECT CAST(1 AS BIGINT) AS id, 0 AS layer
  UNION
  SELECT e.dst, r.layer + 1 FROM r JOIN e ON e.src = r.id WHERE r.layer < 40
)
SELECT r.id, CAST(min(r.layer) AS BIGINT) AS layer
FROM r JOIN customer c ON c.c_custkey = r.id
GROUP BY r.id""",
        "doc_exact_dedup": """
SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) - 1 AS n_dups
FROM documents GROUP BY md5(text)""",
        "doc_dup_spans": """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents
),
e AS (
  SELECT doc_id, toks,
         unnest(range(0, greatest(1, CAST(ceil(len(toks)/4.0) AS INT)))) AS k
  FROM t
),
s AS (
  SELECT doc_id, k, md5(array_to_string(toks[k*4+1 : k*4+4], ' ')) AS h FROM e
),
c AS (SELECT h, count(*) AS c FROM s GROUP BY h)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(CASE WHEN c.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
       CAST(sum(CASE WHEN c.c > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_frac
FROM s JOIN c ON c.h = s.h
GROUP BY s.doc_id""",
        "doc_span_dedup": """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents
),
e AS (
  SELECT doc_id, toks,
         unnest(range(0, greatest(1, CAST(ceil(len(toks)/4.0) AS INT)))) AS k
  FROM t
),
s AS (
  SELECT doc_id, k, array_to_string(toks[k*4+1 : k*4+4], ' ') AS span_text,
         md5(array_to_string(toks[k*4+1 : k*4+4], ' ')) AS h
  FROM e
),
w AS (
  SELECT *, count(*) OVER (PARTITION BY h) AS c,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, k) AS rn
  FROM s
)
SELECT doc_id, string_agg(span_text, ' ' ORDER BY k) AS text
FROM w WHERE c = 1 OR rn = 1
GROUP BY doc_id""",
        "doc_stats": f"""
WITH base AS (
  SELECT doc_id, text,
    length(text) AS n,
    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS ntok,
    length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS alpha,
    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS dig,
    length(text) - length(regexp_replace(text, '\\s', '', 'g')) AS sp,
    {lang_cols}
  FROM documents
)
SELECT doc_id,
  CAST(n AS BIGINT) AS n_chars,
  ntok AS n_tokens,
  round(CAST(alpha AS DOUBLE) / greatest(n, 1), 8) AS alpha_ratio_r,
  round(CAST(dig AS DOUBLE) / greatest(n, 1), 8) AS digit_ratio_r,
  round(CAST(sp AS DOUBLE) / greatest(n, 1), 8) AS space_ratio_r,
  round(CAST(n - sp AS DOUBLE) / greatest(ntok, 1), 8) AS mean_token_len_r,
  {lang_case} AS pred_lang,
  md5(array_to_string(list_sort(list_distinct(regexp_split_to_array(trim(text), '\\s+'))), ' ')) AS fingerprint
FROM base""",
        "doc_lang_counts": f"""
WITH base AS (SELECT doc_id, {lang_cols} FROM documents)
SELECT {lang_case} AS pred_lang, count(*) AS n_docs
FROM base GROUP BY 1""",
        "doc_training_mix": f"""
WITH surv AS MATERIALIZED (
  SELECT doc_id FROM ({_dedup_clusters_sql()}) WHERE is_survivor
),
base AS MATERIALIZED (
  SELECT doc_id, text,
    length(text) AS n,
    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS ntok,
    length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS alpha,
    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS dig,
    {lang_cols}
  FROM documents
)
SELECT b.doc_id, {lang_case} AS pred_lang, b.ntok AS n_tokens,
  CAST(b.n AS BIGINT) AS n_chars
FROM base b JOIN surv s ON s.doc_id = b.doc_id
WHERE b.ntok >= 10
  AND CAST(b.alpha AS DOUBLE) / greatest(b.n, 1) >= 0.5
  AND CAST(b.dig AS DOUBLE) / greatest(b.n, 1) <= 0.3
  AND {lang_case} IN ('de', 'en', 'es', 'fr')""",
        "doc_lsh_bands": _bands_sql(),
        "doc_near_dup_jaccard": _jaccard_pairs_sql(),
        "doc_simhash": _simhash_sql(),
        "embedding_topk": """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
z AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         unnest(q.qv)::DOUBLE AS qx, unnest(c.embedding)::DOUBLE AS cx
  FROM q, embeddings c WHERE c.vec_id <> q.query_id
),
s AS (
  SELECT query_id, neighbor_id,
    round(sum(qx * cx) / greatest(sqrt(sum(qx * qx)) * sqrt(sum(cx * cx)), 1e-300), 6) AS score
  FROM z GROUP BY query_id, neighbor_id
),
r AS (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rnk
  FROM s
)
SELECT query_id, neighbor_id, rnk FROM r WHERE rnk <= 10""",
        "event_type_stats": """
SELECT event_type, count(*) AS n_events, round(sum(value), 6) AS total_value_r,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type""",
        "kcore_parts": _kcore_sql(k=3, rounds=8),
        "core_number_parts": _core_number_sql(iters=64),
        "core_number_parts_dist": _core_number_sql(iters=64),
        "onion_orders": _onion_sql(rounds=24),
        "kshell_parts": _kshell_sql(iters=64),
        "avg_degree_connectivity_parts": _avg_degree_connectivity_sql(),
        "attr_assortativity_orders": _attr_assortativity_sql(),
        "degree_centrality_orders": _degree_centrality_sql(),
        "effective_size_parts": _effective_size_sql(),
        "edge_boundary_orders": _edge_boundary_sql(),
        "weighted_clustering_parts": _weighted_clustering_sql(),
        "bipartite_color_partsupp": _bipartite_color_sql(),
        "triadic_census_orders": _triadic_census_sql(),
        "conductance_orders": _conductance_sql(),
        "edge_betweenness_orders": _edge_betweenness_sql(),
        "edge_betweenness_weighted_orders": _weighted_betweenness_sql(edge_mode=True),
        "edge_betweenness_weighted_orders_dist": _weighted_betweenness_sql(edge_mode=True),
        "constraint_parts": _constraint_sql(),
        "square_clustering_parts": _square_clustering_sql(),
        "doc_packing": """
WITH tc AS (
  SELECT doc_id,
    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT)
      AS n_tokens
  FROM documents
),
offs AS (
  SELECT doc_id, n_tokens,
    CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS start_offset
  FROM tc
)
SELECT doc_id, n_tokens, start_offset,
  CAST(start_offset // 512 AS BIGINT) AS pack_id,
  start_offset % 512 AS pack_offset
FROM offs""",
        "scc_orders": _scc_sql(),
        "anchor_profile_orders": """
WITH nn AS MATERIALIZED (SELECT count(*) AS n FROM customer),
a AS MATERIALIZED (
  SELECT 'https://test.example/ord/'
           || CAST(o_orderkey % (SELECT n FROM nn) AS VARCHAR) AS dst_url,
         o_orderpriority AS anchor
  FROM orders),
pa AS MATERIALIZED (
  SELECT dst_url, anchor, count(*) AS n FROM a GROUP BY dst_url, anchor),
top AS MATERIALIZED (
  SELECT dst_url, anchor, n,
         row_number() OVER (PARTITION BY dst_url
                            ORDER BY n DESC, anchor) AS rk
  FROM pa)
SELECT g.dst_url,
       CAST(g.n_inlinks AS BIGINT) AS n_inlinks,
       CAST(g.n_unique_anchors AS BIGINT) AS n_unique_anchors,
       t.anchor AS top_anchor,
       CAST(t.n AS BIGINT) AS top_anchor_n
FROM (SELECT dst_url, sum(n) AS n_inlinks, count(*) AS n_unique_anchors
      FROM pa GROUP BY dst_url) g
JOIN top t ON t.dst_url = g.dst_url AND t.rk = 1
""",
        "flow_hierarchy_orders": """
WITH RECURSIVE nn AS (SELECT count(*) AS n FROM customer),
e AS (SELECT DISTINCT o_custkey AS src, o_orderkey % (SELECT n FROM nn) AS dst FROM orders),
nodes AS (SELECT c_custkey AS id FROM customer),
reach(a, b) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
),
comp AS (
  SELECT r1.a AS id, max(r1.b) AS component
  FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a
  GROUP BY r1.a
)
SELECT CAST(sum(CASE WHEN cs.component <> cd.component THEN 1 ELSE 0 END) AS DOUBLE)
       / count(*) AS flow_hierarchy
FROM e JOIN comp cs ON cs.id = e.src JOIN comp cd ON cd.id = e.dst""",
        "node_class_chains": _harmonic_sql(),
        "simrank_chains": _simrank_sql(),
        "lca_orders": _LCA_SQL,
        "trophic_orders": _trophic_sql(),
        "mst_custlattice": _MST_SQL,
        "kclique_parts": _KCLIQUE_SQL,
        "numeric_assortativity_orders": _NUMERIC_ASSORT_SQL,
        "tfidf_topk_docs": _TFIDF_TOPK_SQL,
        "wl_hashes_chains": """
WITH ch AS (
  SELECT c_custkey AS src,
         lead(c_custkey) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS dst
  FROM customer
),
e0 AS (SELECT src, dst FROM ch WHERE dst IS NOT NULL),
e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
v AS (SELECT c_custkey AS id FROM customer),
d AS (SELECT src AS id, count(*) AS d FROM e GROUP BY src),
l0 AS (
  SELECT v.id, CAST(coalesce(d.d, 0) AS VARCHAR) AS lab
  FROM v LEFT JOIN d ON d.id = v.id
),
n1 AS (
  SELECT e.src AS id, string_agg(l0.lab, '' ORDER BY l0.lab) AS agg
  FROM e JOIN l0 ON l0.id = e.dst GROUP BY e.src
),
l1 AS (
  SELECT l0.id, md5(l0.lab || coalesce(n1.agg, '')) AS lab
  FROM l0 LEFT JOIN n1 ON n1.id = l0.id
),
n2 AS (
  SELECT e.src AS id, string_agg(l1.lab, '' ORDER BY l1.lab) AS agg
  FROM e JOIN l1 ON l1.id = e.dst GROUP BY e.src
),
l2 AS (
  SELECT l1.id, md5(l1.lab || coalesce(n2.agg, '')) AS lab
  FROM l1 LEFT JOIN n2 ON n2.id = l1.id
)
SELECT id, CAST(0 AS BIGINT) AS iteration, lab AS label FROM l0
UNION ALL SELECT id, CAST(1 AS BIGINT), lab FROM l1
UNION ALL SELECT id, CAST(2 AS BIGINT), lab FROM l2""",
        "embedding_lsh_topk": _lsh_topk_sql(dim=64, bits=8, k=10, n_queries=8),
        "assortativity_parts": _assortativity_sql(),
        "link_embeddedness_parts": _link_embeddedness_sql(),
        "dispersion_orders": _dispersion_sql(),
        "embedding_near_pairs": _near_pairs_sql(dim=64, bits=8),
        "eigenvector_orders": _eigenvector_sql(8),
        "eigenvector_orders_dist": _eigenvector_sql(8),
        "ppr_orders": _ppr_sql(),
        "reciprocity_orders": _reciprocity_sql(per_node=True),
        "overall_reciprocity_orders": _reciprocity_sql(per_node=False),
        "sssp_orders": _sssp_sql(rounds=12),
        "sssp_tree_orders": _sssp_tree_sql(rounds=12),
        "topo_generations_orders": _topo_generations_sql(),
        "embedding_ivf_topk": _ivf_sql(
            dim=64, n_centroids=8, iters=2, nprobe=2, k=10, n_queries=8
        ),
        "doc_fingerprints": _doc_fingerprints_sql(),
        "closeness_orders": _closeness_sql(),
        "ktruss_parts": _ktruss_sql(k=4, rounds=10),
        "ktruss_parts_dist": _ktruss_sql(k=4, rounds=10),
        "nation_quotient_orders": _nation_quotient_sql(),
        "part_projection": _part_projection_sql(),
        "condensation_orders": _condensation_sql(),
        "topo_sort_orders": _topo_sort_sql(),
        "avg_nbr_degree_orders": _avg_nbr_degree_sql(),
        "betweenness_orders": _betweenness_sql(),
        "betweenness_orders_dist": _betweenness_sql(),
        "betweenness_weighted_orders": _weighted_betweenness_sql(),
        "betweenness_weighted_orders_dist": _weighted_betweenness_sql(),
        "harmonic_sampled_orders": _harmonic_sampled_sql(),
        "hyperball_orders": _hyperball_sql(),
        "incremental_pagerank_epoch2": _incremental_pagerank_sql(),
        "incremental_reach_epoch2": _incremental_reach_sql(),
        "incremental_triangles_epoch2": """
WITH nn AS MATERIALIZED (SELECT count(*) AS n FROM customer),
nodes AS MATERIALIZED (SELECT c_custkey AS id FROM customer),
e0 AS MATERIALIZED (
  SELECT o_custkey AS src, o_orderkey % (SELECT n FROM nn) AS dst FROM orders),
e AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS s, GREATEST(src, dst) AS d
  FROM e0 WHERE src <> dst AND dst IN (SELECT id FROM nodes)),
tri AS MATERIALIZED (
  SELECT e1.s AS a, e1.d AS b, e2.d AS c
  FROM e e1 JOIN e e2 ON e2.s = e1.d JOIN e e3 ON e3.s = e1.s AND e3.d = e2.d),
corners AS (
  SELECT a AS id FROM tri
  UNION ALL SELECT b AS id FROM tri
  UNION ALL SELECT c AS id FROM tri),
cnt AS (SELECT id, count(*) AS t FROM corners GROUP BY id)
SELECT 'https://test.example/incrtri/' || CAST(nodes.id AS VARCHAR) AS url,
       CAST(COALESCE(cnt.t, 0) AS BIGINT) AS n_tri
FROM nodes LEFT JOIN cnt ON cnt.id = nodes.id""",
        "incremental_cc_epoch2": """
SELECT 'https://test.example/incrcc/' || CAST(c_custkey AS VARCHAR) AS url,
       MIN('https://test.example/incrcc/' || CAST(c_custkey AS VARCHAR))
         OVER (PARTITION BY c_nationkey) AS component_url
FROM customer""",
        "hyperball_orders_b6": _hyperball_sql(6, 3),
        "harmonic_sampled_orders_dist": _harmonic_sampled_sql(),
        "katz_orders": _katz_sql(),
        "katz_orders_dist": _katz_sql(),
        "doc_dedup_clusters": _dedup_clusters_sql(),
        "walks_orders": _walks_sql(),
        "node2vec_orders": _node2vec_sql(),
        "vertex_cover_orders": _matching_sql(),
        "modularity_nations": """
WITH ce AS (
  SELECT CAST(c_custkey AS BIGINT) AS src,
    CAST(lead(c_custkey) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS BIGINT) AS dst
  FROM customer
),
e AS (SELECT least(src, dst) AS src, greatest(src, dst) AS dst
      FROM ce WHERE dst IS NOT NULL),
lab AS (SELECT CAST(c_custkey AS BIGINT) AS id,
        CAST(c_nationkey AS BIGINT) AS label FROM customer),
ee AS (SELECT a.label AS ls, b.label AS ld
       FROM e JOIN lab a ON a.id = e.src JOIN lab b ON b.id = e.dst),
m AS (SELECT count(*) AS m FROM ee),
intra AS (SELECT ls AS label, count(*) AS lc FROM ee WHERE ls = ld GROUP BY ls),
deg AS (SELECT label, count(*) AS degc FROM
        (SELECT ls AS label FROM ee UNION ALL SELECT ld FROM ee) GROUP BY label)
SELECT round(SUM(CAST(coalesce(i.lc, 0) AS DOUBLE) / (SELECT m FROM m)
  - POWER(d.degc / (2.0 * (SELECT m FROM m)), 2)), 8) AS modularity_r
FROM deg d LEFT JOIN intra i ON i.label = d.label""",
        "local_bridges_parts": _LOCAL_BRIDGES_SQL,
        "s_metric_parts": _S_METRIC_SQL,
        "rich_club_parts": _RICH_CLUB_SQL,
        "eccentricity_orders": _eccentricity_sql(),
        "distance_summary_orders": _distance_summary_sql(),
        "mis_orders": _mis_sql(),
        "mis_orders_dist": _mis_sql(),
        "dag_longest_path_orders": _DAG_LONGEST_PATH_SQL,
        "dag_longest_path_orders_dist": _DAG_LONGEST_PATH_SQL,
        "transitive_reduction_chains": _TRANSITIVE_REDUCTION_SQL,
        "attracting_orders": _ATTRACTING_SQL,
        "doc_c4_signals": _C4_SIGNALS_SQL,
        "doc_c4_clean": _C4_CLEAN_SQL,
        "doc_dsir_weights": _dsir_sql(64),
        "embedding_semantic_dedup": _semantic_dedup_sql(
            dim=64, n_centroids=8, iters=2, threshold=0.3
        ),
        "reaching_orders": _REACHING_SQL,
        "grc_orders": _GRC_SQL,
        "snap_orders": _snap_sql(3),
        "aperiodic_orders": _aperiodic_sql(8),
        "voronoi_orders": _voronoi_sql(10, 5),
        "embedding_decontaminate": _EMB_DECONTAM_SQL,
        "salsa_orders": _salsa_sql(6),
        "salsa_orders_dist": _salsa_sql(6),
        "cocitation_orders": _COCITATION_SQL,
        "coupling_orders": _COUPLING_SQL,
        "trustrank_orders": _trustrank_sql(),
        "spam_mass_orders": _spam_mass_sql(),
        "skipgram_orders": _skipgram_sql(2),
        "moral_orders": _MORAL_SQL,
        "partition_quality_nations": """
WITH ce AS (
  SELECT CAST(c_custkey AS BIGINT) AS src,
    CAST(lead(c_custkey) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS BIGINT) AS dst
  FROM customer
),
e AS (SELECT least(src, dst) AS src, greatest(src, dst) AS dst
      FROM ce WHERE dst IS NOT NULL),
lab AS (SELECT CAST(c_custkey AS BIGINT) AS id,
        CAST(c_nationkey AS BIGINT) AS label FROM customer),
ee AS (SELECT a.label AS ls, b.label AS ld
       FROM e JOIN lab a ON a.id = e.src JOIN lab b ON b.id = e.dst),
cnt AS (SELECT count(*) AS m,
        sum(CASE WHEN ls = ld THEN 1 ELSE 0 END) AS intra FROM ee),
sz AS (SELECT label, count(*) AS nc FROM lab GROUP BY label),
ps AS (SELECT sum(nc) AS n, sum(nc * (nc - 1) / 2.0) AS intra_possible FROM sz)
SELECT
  round(CAST(intra AS DOUBLE) / m, 8) AS coverage_r,
  round((intra + (n * (n - 1) / 2.0 - intra_possible - (m - intra)))
        / (n * (n - 1) / 2.0), 8) AS performance_r
FROM cnt, ps""",
    }
