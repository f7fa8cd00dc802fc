"""Incremental serving over a page stream — foreachBatch + warm start,
for all four north-rule algorithms: PageRank (warm ``nstart``),
connected components (warm ``labels_start``), label propagation (warm
``labels_start``), and triangle counts (Δ-edge probe).

Not a reference feature (networkx has no streaming surface) — the
composition the north rule's deployment implies: pages arrive
continuously, the link graph grows, and per-url ranks must stay fresh
without recomputing from a cold uniform vector each time.

Design (all existing engine pieces, no new algorithm):

* each micro-batch of pages is ingested ONCE into an append-only
  **edge store** (``ingest_pages`` — extraction runs once per page
  EVER; the store holds the raw (src_url, dst_url) out-links plus the
  crawled url set), exactly-once via the stream checkpoint when driven
  by ``ingest.write_edge_stream``-style sinks, or by the foreachBatch
  epoch id here;
* a refresh rebuilds the graph from the STORE
  (``graph_from_store`` — an O(E) parquet scan + the dense-id
  dictionary, NO HTML re-extraction; by default ids are recomputed
  per refresh — NOT stable across batches — while the opt-in id
  ledger (``append_id_ledger`` / ``stable_ids=True``) pins them
  forever at first crawl, see its divergence note). The legacy pages-path mode
  (re-read all pages, re-extract) remains for whole-crawl rebuilds
  and is hash-identical — extraction is deterministic per page, so
  accumulating its output is the same edge multiset (asserted in
  tests/test_incremental.py). At 100 TB the store path is the only
  viable shape: round-4 measurement (BENCH §7h) put the O(corpus)
  re-extraction at ≈55 s of a 62 s warm refresh at just 1M pages;
* PageRank runs warm-started from the previous serving table via
  ``nstart`` — keyed by URL, not id, exactly because ids remap as the
  vertex set grows; new urls enter with mass 0 and the vector is
  re-normalized by ``_vector_df`` (pagerank_alg.py:139 semantics);
* converged ranks overwrite the serving table as (url, rank).

Warm-starting matters at scale: after an incremental crawl the prior
fixpoint is close to the new one, so supersteps-to-tol drop (asserted
in tests/test_incremental.py) while the result is the SAME fixpoint a
cold run reaches (power iteration converges from any start vector).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import LinkGraph, assign_dense_ids, graph_from_pages
from ..operators.pagerank import pagerank


def ingest_pages(
    spark: SparkSession,
    batch_pages: DataFrame,
    store_path: str,
    batch_id: int | None = None,
    stable_ids: bool = False,
) -> None:
    """Append ONE page batch to the edge store — the O(Δ) ingest step:
    the vectorized extraction UDF runs over exactly this batch, once
    per page EVER, and its raw output lands append-only:

    * ``<store>/urls``  — (url) of every crawled page;
    * ``<store>/edges`` — (src_url, dst_url), the UNfiltered extracted
      out-links (a dst crawled only in a LATER batch must still become
      an edge then, so the crawled-set filter belongs at graph build,
      exactly where ``graph_from_pages`` applies it).

    Exactly-once: foreachBatch replays a failed epoch AT-LEAST-once,
    and a replayed plain append would double the batch's parallel
    links (doubling their PageRank weight). Pass the sink's
    ``batch_id`` and each epoch lands in its own partition directory
    (``epoch=<id>``) written with OVERWRITE — a replay rewrites the
    same partition instead of appending beside it, making ingest
    idempotent. (urls are immune either way: ``graph_from_store``
    dedups the crawled set.) Without ``batch_id`` (one-shot batch
    callers) the write is a plain append. The store is the durable
    product of extraction, so a serving refresh never touches HTML
    again."""
    from ..sources.extract import edges_from_pages

    urls = batch_pages.select("url")
    edges = edges_from_pages(batch_pages)
    if stable_ids:
        # must run BEFORE this batch's urls land, so the anti-join
        # sees only prior epochs (``append_id_ledger`` docstring)
        append_id_ledger(spark, urls, store_path)
    if batch_id is None:
        urls.write.mode("append").parquet(store_path + "/urls")
        edges.write.mode("append").parquet(store_path + "/edges")
    else:
        urls.write.mode("overwrite").parquet(
            f"{store_path}/urls/epoch={int(batch_id)}"
        )
        edges.write.mode("overwrite").parquet(
            f"{store_path}/edges/epoch={int(batch_id)}"
        )


def append_id_ledger(
    spark: SparkSession, batch_urls: DataFrame, store_path: str
) -> None:
    """Stable-id ledger (r5 stretch, VERDICT r4 next-round 10): assign
    each url a BIGINT id ONCE, at first crawl, and never remap it.

    ``<store>/ids`` holds (url, id); a batch's NEW urls (anti-join
    against the ledger) get ids ``max_id+1 …`` in url sort order
    within the batch (``assign_dense_ids``, the deterministic
    two-phase zip-with-index — no data-scale single partition).
    Ids are therefore dense, monotone by crawl epoch, and STABLE
    across refreshes — warm state keyed by these ids survives graph
    rebuilds without url-string joins.

    DIVERGENCE NOTE: after epoch 1 the ids are arrival-ordered, NOT
    globally lexicographic like ``assign_dense_ids`` over the full
    crawl — any output that exposes a min-id representative
    (connected-components/LPA serving labels) would pick the
    earliest-crawled member instead of the lexicographically-smallest
    url. The refreshers whose outputs are id-invariant (ranks,
    triangle counts, url-hashed reach registers) may build on stable
    ids freely; the representative-exposing ones keep the
    lexicographic build."""
    ledger_path = store_path + "/ids"
    if os.path.isdir(ledger_path):
        prior = spark.read.parquet(ledger_path).select("url", "id")
        base = prior.agg(F.max("id")).first()[0] + 1
        new = batch_urls.select("url").distinct().join(
            prior.select("url"), "url", "left_anti"
        )
    else:
        base = 0
        new = batch_urls.select("url").distinct()
    inc = assign_dense_ids(new, "url").select(
        (F.col("id") + F.lit(base)).cast("long").alias("id"), "url"
    )
    inc.select("url", "id").write.mode("append").parquet(ledger_path)


def graph_from_store(
    spark: SparkSession,
    store_path: str,
    directed: bool = True,
    stable_ids: bool = False,
) -> LinkGraph:
    """Edge store -> LinkGraph: the O(E-scan) rebuild (no extraction).

    Bit-identical to ``graph_from_pages`` over the same accumulated
    crawl: the store's edge table is the union of each batch's
    deterministic extraction output (= extracting all pages at once),
    and the same crawled-url join drops out-links to uncrawled urls;
    ``assign_dense_ids`` sorts by url either way. ``distinct()`` on
    urls makes at-least-once batch replays idempotent for the vertex
    set (valid crawls have unique urls, so it is a no-op otherwise).

    ``stable_ids=True`` takes the id dictionary from the store's
    ledger (:func:`append_id_ledger`) instead of re-sorting the url
    set — the refresh skips the O(V log V) dictionary rebuild and any
    id-keyed warm state stays valid across epochs. Same graph up to
    id relabeling (see the ledger's divergence note)."""
    urls = spark.read.parquet(store_path + "/urls").select("url").distinct()
    raw = spark.read.parquet(store_path + "/edges").select(
        "src_url", "dst_url"
    )
    if stable_ids:
        ids = (
            spark.read.parquet(store_path + "/ids")
            .select("id", "url")
            .join(urls, "url", "left_semi")
        )
    else:
        ids = assign_dense_ids(urls, "url")
    e = (
        raw.join(ids.withColumnRenamed("id", "src"), raw.src_url == F.col("url"))
        .drop("url")
        .join(ids.withColumnRenamed("id", "dst"), F.col("dst_url") == F.col("url"))
        .select("src", "dst", F.lit(1.0).alias("weight"))
    )
    return LinkGraph(vertices=ids.select("id", "url"), edges=e, directed=directed)


def _load_graph(
    spark: SparkSession,
    pages_path: str | None,
    store_path: str | None,
    directed: bool = True,
    stable_ids: bool = False,
) -> LinkGraph:
    """Refresh-time graph source: the edge store when given (O(E) scan,
    extraction already paid at ingest), else the legacy whole-crawl
    re-extraction from ``pages_path``."""
    if store_path is not None:
        return graph_from_store(
            spark, store_path, directed=directed, stable_ids=stable_ids
        )
    return graph_from_pages(spark.read.parquet(pages_path), directed=directed)


def refresh_ranks(
    spark: SparkSession,
    pages_path: str | None,
    ranks_path: str,
    alpha: float = 0.85,
    tol: float = 1.0e-6,
    stats_out: dict | None = None,
    store_path: str | None = None,
    stable_ids: bool = False,
    **pagerank_kwargs,
) -> DataFrame:
    """One serving refresh: build the graph — from the append-only
    edge store at ``store_path`` when given (the O(Δ)-ingest shape:
    no re-extraction, see :func:`ingest_pages`), else by re-reading
    ALL pages under ``pages_path`` — warm-start from ``ranks_path``
    if it exists, write the new (url, rank) serving table atomically
    (write-new + rename is the caller's concern on object stores;
    local parquet overwrite here). Returns the serving DataFrame."""
    g = _load_graph(spark, pages_path, store_path, stable_ids=stable_ids)
    nstart = None
    if os.path.isdir(ranks_path):
        prev = spark.read.parquet(ranks_path)
        seeded = g.vertices.join(prev, "url", "inner").select("id", "rank")
        # only warm-start when the previous table overlaps the new
        # vertex set (a zero-sum vector would raise, pagerank_alg:148)
        if seeded.limit(1).count() > 0:
            nstart = seeded
    ranks = pagerank(
        g, alpha=alpha, tol=tol, nstart=nstart, stats_out=stats_out,
        **pagerank_kwargs,
    )
    serving = g.vertices.join(ranks, "id").select("url", "rank")
    serving.write.mode("overwrite").parquet(ranks_path + "._tmp")
    out = spark.read.parquet(ranks_path + "._tmp")
    out.write.mode("overwrite").parquet(ranks_path)
    return spark.read.parquet(ranks_path)


def incremental_pagerank_sink(
    spark: SparkSession,
    pages_path: str,
    ranks_path: str,
    alpha: float = 0.85,
    tol: float = 1.0e-6,
    store_path: str | None = None,
    **pagerank_kwargs,
):
    """foreachBatch callback for a page stream: ingest the batch, then
    refresh the serving ranks warm-started from the previous epoch.
    With ``store_path`` (the deployment shape) the batch is extracted
    ONCE into the append-only edge store and the refresh reads only the
    store; otherwise the batch is appended to the page store and the
    refresh re-extracts the whole crawl. Usage::

        q = (read_page_stream(spark, drop_dir)
             .writeStream
             .foreachBatch(incremental_pagerank_sink(
                 spark, None, ranks, store_path=store))
             .option("checkpointLocation", ckpt)
             .start())
    """

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if store_path is not None:
            ingest_pages(spark, batch_df, store_path, batch_id=epoch_id)
        else:
            batch_df.write.mode("append").parquet(pages_path)
        refresh_ranks(
            spark, pages_path, ranks_path, alpha=alpha, tol=tol,
            store_path=store_path, **pagerank_kwargs,
        )

    return _sink


def refresh_components(
    spark: SparkSession,
    pages_path: str | None,
    labels_path: str,
    stats_out: dict | None = None,
    store_path: str | None = None,
    **cc_kwargs,
) -> DataFrame:
    """Incremental CONNECTED-COMPONENTS serving (the CC analog of
    :func:`refresh_ranks`): build the graph (edge store when
    ``store_path`` is given, else re-extract all pages), warm-start
    the label superstep loop from the previous serving table, write the
    new serving table as (url, component_url).

    URL keying is load-bearing twice: member urls AND the component
    representative are stored as urls because dense ids remap as the
    vertex set grows — on refresh both sides re-resolve through the new
    id dictionary. Under page APPENDS previously-connected vertices
    stay connected, so each warm label still names a vertex of the same
    component — exactly the ``labels_start`` contract of
    ``connected_components``; the warm fixpoint is bit-identical to a
    cold run (own-id stays a candidate), only the superstep count
    drops (asserted in tests/test_incremental.py)."""
    g = _load_graph(spark, pages_path, store_path)
    labels_start = None
    if os.path.isdir(labels_path):
        prev = spark.read.parquet(labels_path)
        ids = g.vertices.select("url", "id")
        seeded = (
            prev.join(ids, "url", "inner")
            .join(
                ids.select(
                    F.col("url").alias("component_url"),
                    F.col("id").alias("component"),
                ),
                "component_url",
                "inner",
            )
            .select("id", "component")
        )
        if seeded.limit(1).count() > 0:
            labels_start = seeded

    from ..operators.components import connected_components

    labels = connected_components(
        g, labels_start=labels_start, stats_out=stats_out, **cc_kwargs
    )
    serving = (
        labels.join(g.vertices.select("url", "id"), "id")
        .join(
            g.vertices.select(
                F.col("id").alias("component"),
                F.col("url").alias("component_url"),
            ),
            "component",
        )
        .select("url", "component_url")
    )
    serving.write.mode("overwrite").parquet(labels_path + "._tmp")
    out = spark.read.parquet(labels_path + "._tmp")
    out.write.mode("overwrite").parquet(labels_path)
    return spark.read.parquet(labels_path)


def refresh_communities(
    spark: SparkSession,
    pages_path: str | None,
    labels_path: str,
    stats_out: dict | None = None,
    store_path: str | None = None,
    **lpa_kwargs,
) -> DataFrame:
    """Incremental LABEL-PROPAGATION serving (the LPA analog of
    :func:`refresh_ranks`): build the graph (edge store when
    ``store_path`` is given, else re-extract all pages), warm-start
    the Luby sweep loop from the previous serving table, write the new
    serving table as (url, label_url).

    Same url-keyed double resolution as :func:`refresh_components`.
    Unlike CC, LPA's converged labeling is schedule-dependent, so warm
    and cold runs may land on DIFFERENT valid fixpoints — the serving
    contract is fixpoint validity plus label stability: starting from
    the previous epoch's labels, only neighborhoods the appended pages
    disturbed get re-labeled (``warmup_rounds=0`` — synchronous warmup
    would gratuitously churn labels that are already stable), and the
    drain sweep count drops accordingly (``stats_out["sweeps"]``,
    asserted in tests/test_incremental.py)."""
    from ..operators.label_propagation import label_propagation_communities

    g = _load_graph(spark, pages_path, store_path, directed=False)
    labels_start = None
    if os.path.isdir(labels_path):
        prev = spark.read.parquet(labels_path)
        ids = g.vertices.select("url", "id")
        seeded = (
            prev.join(ids, "url", "inner")
            .join(
                ids.select(
                    F.col("url").alias("label_url"),
                    F.col("id").alias("label"),
                ),
                "label_url",
                "inner",
            )
            .select("id", "label")
        )
        if seeded.limit(1).count() > 0:
            labels_start = seeded
    kwargs = dict(lpa_kwargs)
    if labels_start is not None:
        kwargs.setdefault("warmup_rounds", 0)
    labels = label_propagation_communities(
        g, labels_start=labels_start, stats_out=stats_out, **kwargs
    )
    serving = (
        labels.join(g.vertices.select("url", "id"), "id")
        .join(
            g.vertices.select(
                F.col("id").alias("label"), F.col("url").alias("label_url")
            ),
            "label",
        )
        .select("url", "label_url")
    )
    serving.write.mode("overwrite").parquet(labels_path + "._tmp")
    out = spark.read.parquet(labels_path + "._tmp")
    out.write.mode("overwrite").parquet(labels_path)
    return spark.read.parquet(labels_path)


def refresh_triangles(
    spark: SparkSession,
    pages_path: str | None,
    tri_path: str,
    stats_out: dict | None = None,
    store_path: str | None = None,
    stable_ids: bool = False,
) -> DataFrame:
    """Incremental TRIANGLE-COUNT serving: per-url triangle counts
    refreshed under page APPENDS without re-enumerating old triangles.

    State = two url-keyed tables: the serving counts at ``tri_path``
    and the canonical undirected edge set at ``tri_path + ".edges"``
    (urls, not ids — ids remap every epoch). On refresh, the new
    canonical edge set is anti-joined against the stored one; every
    triangle GAINED must contain at least one Δ edge (appends never
    remove triangles), so the delta enumeration probes only
    Δ ⋈ adjacency ⋈ adjacency — one common-neighbor join per new edge,
    O(|Δ|·d̄) work instead of the full O(m^1.5) recount — and a
    triangle with 2-3 new edges, found once per Δ edge it contains,
    is deduplicated by its sorted corner key. Per-corner deltas then
    ADD onto the previous serving counts (new urls enter at 0).

    ``stats_out`` gets ``mode`` ("full" on first build, "delta" after)
    and ``new_edges`` — the cheap-refresh evidence asserted in
    tests/test_incremental.py."""
    from ..operators.triangles import _simple_undirected, triangles

    g = _load_graph(
        spark, pages_path, store_path, directed=False, stable_ids=stable_ids
    )
    ids = g.vertices.select("url", "id")
    edges_path = tri_path + ".edges"

    simple = _simple_undirected(g).persist()  # (src<dst, deduped) ids
    url_edges = (
        simple.join(ids.select(F.col("id").alias("src"), F.col("url").alias("src_url")), "src")
        .join(ids.select(F.col("id").alias("dst"), F.col("url").alias("dst_url")), "dst")
        .select("src_url", "dst_url")
    )

    if not os.path.isdir(tri_path):
        serving = (
            triangles(g, _simple=simple)
            .join(ids, "id")
            .select("url", "triangles")
        )
        if stats_out is not None:
            stats_out["mode"] = "full"
    else:
        prev_edges = spark.read.parquet(edges_path)
        delta_urls = url_edges.join(
            prev_edges, ["src_url", "dst_url"], "left_anti"
        )
        delta = (
            delta_urls.join(
                ids.select(F.col("url").alias("src_url"), F.col("id").alias("lo")),
                "src_url",
            )
            .join(
                ids.select(F.col("url").alias("dst_url"), F.col("id").alias("hi")),
                "dst_url",
            )
            .select("lo", "hi")
            .persist()
        )
        n_new = delta.count()
        if stats_out is not None:
            stats_out["mode"] = "delta"
            stats_out["new_edges"] = n_new
        sym = simple.unionByName(
            simple.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        # common-neighbor probe: w adjacent to BOTH endpoints of a Δ edge
        cand = (
            delta.join(
                sym.select(F.col("src").alias("lo"), F.col("dst").alias("w")), "lo"
            )
            .join(
                sym.select(F.col("src").alias("hi"), F.col("dst").alias("w")),
                ["hi", "w"],
                "left_semi",
            )
        )
        tri_new = cand.select(
            F.least("lo", "hi", "w").alias("a"),
            F.expr("array_sort(array(lo, hi, w))[1]").alias("b"),
            F.greatest("lo", "hi", "w").alias("c"),
        ).distinct()
        corner_delta = (
            tri_new.select(F.explode(F.array("a", "b", "c")).alias("id"))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("dt"))
            .join(ids, "id")
            .select("url", "dt")
        )
        prev = spark.read.parquet(tri_path)
        serving = (
            ids.select("url")
            .join(prev.select("url", F.col("triangles").alias("t0")), "url", "left")
            .join(corner_delta, "url", "left")
            .select(
                "url",
                (
                    F.coalesce("t0", F.lit(0)) + F.coalesce("dt", F.lit(0))
                ).alias("triangles"),
            )
        )
        delta.unpersist()

    serving.write.mode("overwrite").parquet(tri_path + "._tmp")
    spark.read.parquet(tri_path + "._tmp").write.mode("overwrite").parquet(tri_path)
    url_edges.write.mode("overwrite").parquet(edges_path + "._tmp")
    spark.read.parquet(edges_path + "._tmp").write.mode("overwrite").parquet(edges_path)
    simple.unpersist()
    return spark.read.parquet(tri_path)


def incremental_components_sink(
    spark: SparkSession,
    pages_path: str,
    labels_path: str,
    store_path: str | None = None,
    **cc_kwargs,
):
    """foreachBatch callback: ingest the page batch (edge store when
    ``store_path`` is given — extraction once per page — else page
    append), refresh the CC serving table warm-started from the
    previous epoch (mirror of :func:`incremental_pagerank_sink`)."""

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if store_path is not None:
            ingest_pages(spark, batch_df, store_path, batch_id=epoch_id)
        else:
            batch_df.write.mode("append").parquet(pages_path)
        refresh_components(
            spark, pages_path, labels_path, store_path=store_path, **cc_kwargs
        )

    return _sink


def refresh_reach(
    spark: SparkSession,
    pages_path: str | None,
    reach_path: str,
    b: int = 6,
    max_t: int = 64,
    stats_out: dict | None = None,
    store_path: str | None = None,
    stable_ids: bool = False,
    **hb_kwargs,
) -> DataFrame:
    """Incremental HYPERBALL-REACH serving (the sketch analog of
    :func:`refresh_ranks`): build the graph (edge store when
    ``store_path`` is given, else re-extract all pages), run the
    HyperBall register loop to its full-reachability fixpoint
    warm-started from the previous serving table, write the new
    serving table as (url, r0…r_{m-1}, reach_est).

    Registers are url-keyed for the same id-remap reason as the other
    refreshers. Warm starting is EXACT here: under page appends the
    old registers are lower bounds in the max-merge lattice, so the
    warm fixpoint is bit-identical to a cold run's (see
    ``hyperball_registers``'s ``registers_start``), only the superstep
    count drops (``stats_out["supersteps"]``) — most of the crawl has
    already saturated, and delta messaging ships only the disturbed
    frontier."""
    from ..operators.hyperball import (
        _register_cols,
        ball_size_estimate,
        hyperball_registers,
    )

    g = _load_graph(spark, pages_path, store_path, stable_ids=stable_ids)
    rcols = _register_cols(b)
    registers_start = None
    if os.path.isdir(reach_path):
        prev = spark.read.parquet(reach_path)
        seeded = g.vertices.select("url", "id").join(prev, "url", "inner").select(
            "id", *rcols
        )
        if seeded.limit(1).count() > 0:
            registers_start = seeded
    # hash by URL, not dense id: ids remap as the vertex set grows,
    # and the sketch CONTENT is the hash — url keying makes warm
    # registers valid lower bounds of the new fixpoint
    regs = hyperball_registers(
        g, b=b, t=max_t, registers_start=registers_start, stats_out=stats_out,
        hash_col="url", **hb_kwargs,
    )
    serving = (
        ball_size_estimate(regs, b)
        .join(g.vertices.select("url", "id"), "id")
        .select("url", *rcols, F.col("est").alias("reach_est"))
    )
    serving.write.mode("overwrite").parquet(reach_path + "._tmp")
    out = spark.read.parquet(reach_path + "._tmp")
    out.write.mode("overwrite").parquet(reach_path)
    return spark.read.parquet(reach_path)
