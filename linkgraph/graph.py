"""Graph core: edge/vertex tables, dense ids, CSR-block adjacency.

Replaces the reference's dict-of-dict-of-dict storage
(networkx/classes/graph.py:233-237, slots ``_adj``/``_node`` at
graph.py:313-314; DiGraph ``_succ``/``_pred`` at digraph.py:330-332)
with two DataFrames:

    vertices(id BIGINT, url STRING)
    edges(src BIGINT, dst BIGINT, weight DOUBLE)

Node identity is any string (urls); dense collision-free BIGINT ids
come from a distributed dictionary (:func:`assign_dense_ids`) — the
Spark analog of ``convert_node_labels_to_integers``
(networkx/relabel.py:227). The ``_pred`` mirror is a projection
(swap src/dst), not a second maintained structure.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def assign_dense_ids(df: DataFrame, key: str = "url", num_partitions: int | None = None) -> DataFrame:
    """distinct keys -> (id BIGINT dense 0..N-1, key) dictionary.

    Scale-safe dense ranking WITHOUT a single-partition window:
    range-partition by key, rank within each partition, then add
    broadcast per-partition offsets (classic two-phase zip-with-index,
    expressed purely in DataFrame ops). Deterministic: id order ==
    lexicographic key order, which stands in for the reference's
    insertion order (``nodelist = list(G)``,
    networkx/convert_matrix.py:459) — documented divergence, tests
    compare by node name, never by raw id.
    """
    keys = df.select(key).distinct()
    if num_partitions:
        keys = keys.repartitionByRange(num_partitions, key)
    else:
        keys = keys.repartitionByRange(key)
    part = keys.withColumn("_pid", F.spark_partition_id())
    local = part.withColumn(
        "_rn", F.row_number().over(Window.partitionBy("_pid").orderBy(key))
    )
    # NB: this unpartitioned window triggers Spark's single-partition
    # WindowExec warning, but its frame holds exactly #partitions rows
    # (one per _pid) — driver-scale by construction, never data-scale.
    offsets = (
        part.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .select((F.col("_rn") - 1 + F.col("_off")).cast("long").alias("id"), key)
    )


@dataclass(frozen=True)
class LinkGraph:
    """Immutable pair of DataFrames + directedness flag.

    ``edges`` may contain parallel rows (multigraph); ``weight`` is
    nullable with nx's ``d.get(weight, 1)`` default applied at read
    time (networkx/classes/reportviews.py:527) via
    :meth:`weighted_edges`.
    """

    vertices: DataFrame
    edges: DataFrame
    directed: bool = True

    @property
    def spark(self) -> SparkSession:
        return self.vertices.sparkSession

    # -- projections ---------------------------------------------------
    def weighted_edges(self) -> DataFrame:
        return self.edges.select(
            "src", "dst", F.coalesce(F.col("weight"), F.lit(1.0)).alias("weight")
        )

    def with_weight(self, weight_fn) -> "LinkGraph":
        """Weight-as-callable seam (the reference's ``weight``
        callables, networkx/algorithms/shortest_paths/weighted.py:41
        ``_weight_function``): ``weight_fn`` maps the edge DataFrame to
        a weight Column — a plain Column expression (preferred: stays
        in whole-stage codegen) or a ``pandas_udf`` over edge columns
        for logic Columns can't express. Every weighted operator then
        sees the derived weight through the normal ``weight`` column.

        >>> g.with_weight(lambda e: F.log1p(e["weight"]))
        """
        e = self.edges
        return replace(
            self,
            edges=e.select(
                *[c for c in e.columns if c != "weight"],
                weight_fn(e).cast("double").alias("weight"),
            ),
        )

    def reverse(self) -> "LinkGraph":
        """Zero-cost reversed view (networkx/classes/graphviews.py:238)."""
        rev = self.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
        return replace(self, edges=rev)

    def symmetrized_edges(self) -> DataFrame:
        """Both directions of every edge. Self-loops appear ONCE (only
        in the forward half): the reference's undirected→directed
        conversion (pagerank_alg.py:128 ``D = G.to_directed()``) keeps
        a self-loop as a single directed edge, so emitting it from both
        union sides would double its transition weight."""
        we = self.weighted_edges()
        return we.unionByName(
            we.where(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
        )

    def undirected_edges(self) -> DataFrame:
        """Canonical undirected simple-edge set: src<=dst, deduped,
        parallel edges collapsed (weight summed)."""
        we = self.weighted_edges()
        canon = we.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        )
        return canon.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))

    def coalesced_edges(self, directed: bool | None = None) -> DataFrame:
        """Parallel edges summed — CSR coalescing semantics
        (networkx/convert_matrix.py:490; pagerank multigraph note at
        pagerank_alg.py:227-229)."""
        if directed is None:
            directed = self.directed
        base = self.weighted_edges() if directed else self.symmetrized_edges()
        if not directed:
            # symmetrize first, then coalesce both directions independently
            pass
        return base.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))

    # -- aggregations ----------------------------------------------------
    def out_degrees(self, weighted: bool = False) -> DataFrame:
        agg = F.sum("weight") if weighted else F.count(F.lit(1)).cast("double")
        deg = self.weighted_edges().groupBy("src").agg(agg.alias("degree"))
        return (
            self.vertices.join(deg, self.vertices.id == deg.src, "left")
            .select("id", F.coalesce("degree", F.lit(0.0)).alias("degree"))
        )

    def num_vertices(self) -> int:
        return self.vertices.count()

    # -- point predicates / lookups (driver-boundary scalars; parity
    # with graph.py:891 has_node, :1303 has_edge, :509 neighbors,
    # :1468 nbunch_iter) --------------------------------------------
    def save(self, path: str) -> None:
        """Persist the graph as partitioned Parquet (vertices/, edges/)
        plus a one-row _meta table carrying directedness — the
        cluster-native round-trip (every read is a parallel scan; no
        driver materialization at any size)."""
        self.vertices.write.mode("overwrite").parquet(f"{path}/vertices")
        self.edges.write.mode("overwrite").parquet(f"{path}/edges")
        self.spark.createDataFrame(
            [(bool(self.directed),)], "directed boolean"
        ).write.mode("overwrite").parquet(f"{path}/_meta")

    @staticmethod
    def load(spark: SparkSession, path: str) -> "LinkGraph":
        directed = (
            spark.read.parquet(f"{path}/_meta").first()["directed"]
        )
        return LinkGraph(
            vertices=spark.read.parquet(f"{path}/vertices"),
            edges=spark.read.parquet(f"{path}/edges"),
            directed=bool(directed),
        )

    def has_node(self, node_id: int) -> bool:
        return (
            self.vertices.where(F.col("id") == node_id).limit(1).count() == 1
        )

    def has_edge(self, src: int, dst: int) -> bool:
        e = self.edges
        cond = (F.col("src") == src) & (F.col("dst") == dst)
        if not self.directed:
            cond = cond | ((F.col("src") == dst) & (F.col("dst") == src))
        return e.where(cond).limit(1).count() == 1

    def neighbors(self, node_id: int) -> DataFrame:
        """(id) successors of ``node_id`` (nx ``G.neighbors`` ==
        successors for DiGraph, graph.py:509); undirected graphs use
        both endpoints. Distinct — parallel edges collapse."""
        e = self.edges if self.directed else self.symmetrized_edges()
        return (
            e.where(F.col("src") == node_id)
            .select(F.col("dst").alias("id"))
            .distinct()
        )

    def nbunch_iter(self, nbunch=None) -> DataFrame:
        """(id) membership-filtered node set (graph.py:1468): None →
        all vertices; an iterable of ids → those present in the graph,
        silently dropping unknowns (reference semantics)."""
        ids = self.vertices.select("id")
        if nbunch is None:
            return ids
        if not isinstance(nbunch, (list, tuple, set, frozenset)):
            nbunch = [nbunch]
        want = self.spark.createDataFrame(
            [(int(n),) for n in nbunch] or [(None,)], "id long"
        )
        if not nbunch:
            want = want.where(F.lit(False))
        return ids.join(want.distinct(), "id", "left_semi")


def graph_from_pages(pages: DataFrame, directed: bool = True) -> LinkGraph:
    """Full ingest: pages -> extraction UDF -> edges + id dictionary.

    Only urls that exist as pages become vertices; out-links to
    uncrawled urls are dropped (dangling handling then matches the
    reference where the node set == crawled set). Parallel links kept.
    """
    from .sources.extract import edges_from_pages

    raw = edges_from_pages(pages)
    ids = assign_dense_ids(pages.select("url"), "url")
    v = ids.select("id", "url")
    e = (
        raw.join(ids.withColumnRenamed("id", "src"), raw.src_url == F.col("url"))
        .drop("url")
        .join(ids.withColumnRenamed("id", "dst"), F.col("dst_url") == F.col("url"))
        .select("src", "dst", F.lit(1.0).alias("weight"))
    )
    return LinkGraph(vertices=v, edges=e, directed=directed)


def graph_from_edge_names(
    spark: SparkSession, edges: list, nodes: list = (), directed: bool = True
) -> LinkGraph:
    """Fixture constructor from (u, v[, weight]) tuples of node names —
    the Spark analog of ``from_edgelist`` (networkx/convert.py:479)."""
    rows = []
    for e in edges:
        u, v = e[0], e[1]
        w = float(e[2]) if len(e) > 2 else None
        rows.append((str(u), str(v), w))
    names = sorted({str(u) for e in edges for u in e[:2]} | {str(n) for n in nodes})
    edf = spark.createDataFrame(
        rows or [(None, None, None)],
        schema=T.StructType(
            [
                T.StructField("su", T.StringType()),
                T.StructField("sv", T.StringType()),
                T.StructField("weight", T.DoubleType()),
            ]
        ),
    )
    if not rows:
        edf = edf.where(F.lit(False))
    ndf = spark.createDataFrame([(n,) for n in names] or [("_",)], "url string")
    if not names:
        ndf = ndf.where(F.lit(False))
    ids = assign_dense_ids(ndf, "url")
    e = (
        edf.join(ids.withColumnRenamed("id", "src"), edf.su == ids.url)
        .drop("url")
        .join(ids.withColumnRenamed("id", "dst"), F.col("sv") == F.col("url"))
        .select("src", "dst", "weight")
    )
    return LinkGraph(vertices=ids.select("id", "url"), edges=e, directed=directed)


def build_adjacency(
    edges: DataFrame,
    num_partitions: int = 32,
    hub_chunk: int = 4096,
    coalesce_parallel: bool = True,
    normalize: bool = False,
) -> DataFrame:
    """Degree-annotated, salted, per-partition CSR-block adjacency.

    The distributed analog of the reference's CSR substrate
    (``to_scipy_sparse_array``, networkx/convert_matrix.py:490):

        adj(src BIGINT, salt INT, pairs ARRAY<STRUCT<dsts BIGINT,
            wts DOUBLE>>, deg BIGINT, strength DOUBLE)

    Exactly TWO shuffles: (1) parallel-edge coalescing groupBy(src,dst)
    — CSR duplicate summing — and (2) groupBy(src) collecting the CSR
    arrays; out-strength normalization (``stochastic_graph``,
    networkx/generators/stochastic.py:17-54) happens *inside* the
    arrays via ``transform`` (no join), and HUB SALTING slices the
    arrays into ceil(deg/hub_chunk) rows (salt = chunk index) so the
    per-superstep rank join replicates a hub's rank once per chunk
    instead of funnelling one giant array through a single task.

    (dst, weight) are PRE-ZIPPED into one struct array at build time:
    the gather explodes ``pairs`` directly each superstep instead of
    re-running ``arrays_zip`` over every edge every iteration
    (measured ~20% of gather time at 10M edges).

    Out-degree is bounded by page size in the web domain (a page holds
    ~10-10^3 links), so collecting a per-src array is safe; the real
    skew — hub *in*-degree — never materializes as an array here, it
    is absorbed by map-side partial aggregation in the gather's
    groupBy(dst). Final layout is hash-partitioned by src and meant to
    be persisted across all supersteps.
    """
    e = edges
    if coalesce_parallel:
        e = e.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
    grouped = e.groupBy("src").agg(
        F.collect_list("dst").alias("dsts"),
        F.collect_list("weight").alias("wts"),
        F.count(F.lit(1)).alias("deg"),
        F.sum("weight").alias("strength"),
    )
    if normalize:
        grouped = grouped.withColumn(
            "wts", F.transform("wts", lambda w: w / F.col("strength"))
        )
    nchunks = F.greatest(
        F.lit(1), F.ceil(F.col("deg") / F.lit(hub_chunk))
    ).cast("int")
    adj = (
        grouped.select(
            "src",
            "deg",
            "strength",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), nchunks - 1),
                    lambda i: F.struct(
                        i.cast("int").alias("salt"),
                        F.slice(
                            F.arrays_zip(F.col("dsts"), F.col("wts")),
                            i * hub_chunk + 1,
                            hub_chunk,
                        ).alias("pairs"),
                    ),
                )
            ).alias("ch"),
        )
        .select("src", "ch.salt", "ch.pairs", "deg", "strength")
        .repartition(num_partitions, "src")
    )
    return adj


def build_adjacency_grid(
    edges: DataFrame,
    num_partitions: int,
    dst_blocks: int,
    row_blocks: int,
    hub_chunk: int = 4096,
    coalesce_parallel: bool = True,
    normalize: bool = False,
) -> DataFrame:
    """2D (grid) partitioned CSR adjacency — the documented scale-out
    path past 1D src-hash partitioning (BENCH.md §3): edge (u, v) lands
    in grid cell (hash(u) mod R, hash(v) mod C), materialized as CSR
    rows keyed (src, dblock) and laid out by

        pid = dblock * R + hash(src) mod R.

    Why: in the 1D layout every gather task sees dst keys drawn from
    ALL n vertices, so the map-side partial-aggregation hash table
    stops combining once n outgrows cache; in the grid layout a task's
    dst keys come from ONE column block (≤ n/C distinct), which keeps
    the combine ratio flat as n grows. The price is replicating the
    rank vector C times per superstep (the "broadcast along the grid
    row" of 2D SpMV): total shuffle ≈ C·n + R·n rows — minimized at
    R = C = √P. Wins when m ≫ n·√P; at sandbox scale the 1D path is
    faster and remains the default.

    Layout: adj(pid INT, src BIGINT, dblock INT, salt INT,
    pairs ARRAY<STRUCT<dsts BIGINT, wts DOUBLE>>, deg, strength).
    Out-strength normalization uses the TOTAL src strength across all
    of its blocks (one extra window over ≤C rows per src at build
    time). Hub salting is per (src, dblock) row, same device as
    :func:`build_adjacency`.
    """
    from pyspark.sql.window import Window

    e = edges
    if coalesce_parallel:
        e = e.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
    e = e.withColumn(
        "dblock", F.pmod(F.xxhash64("dst"), F.lit(dst_blocks)).cast("int")
    )
    grouped = e.groupBy("src", "dblock").agg(
        F.collect_list("dst").alias("dsts"),
        F.collect_list("weight").alias("wts"),
        F.count(F.lit(1)).alias("bdeg"),
        F.sum("weight").alias("bstrength"),
    )
    w = Window.partitionBy("src")
    grouped = grouped.withColumn("deg", F.sum("bdeg").over(w)).withColumn(
        "strength", F.sum("bstrength").over(w)
    )
    if normalize:
        grouped = grouped.withColumn(
            "wts", F.transform("wts", lambda x: x / F.col("strength"))
        )
    nchunks = F.greatest(
        F.lit(1), F.ceil(F.col("bdeg") / F.lit(hub_chunk))
    ).cast("int")
    return (
        grouped.select(
            "src",
            "dblock",
            "deg",
            "strength",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), nchunks - 1),
                    lambda i: F.struct(
                        i.cast("int").alias("salt"),
                        F.slice(
                            F.arrays_zip(F.col("dsts"), F.col("wts")),
                            i * hub_chunk + 1,
                            hub_chunk,
                        ).alias("pairs"),
                    ),
                )
            ).alias("ch"),
        )
        .select(
            (
                F.col("dblock") * row_blocks
                + F.pmod(F.xxhash64("src"), F.lit(row_blocks))
            ).cast("int").alias("pid"),
            "src",
            "dblock",
            F.col("ch.salt").alias("salt"),
            F.col("ch.pairs").alias("pairs"),
            "deg",
            "strength",
        )
        .repartition(num_partitions, "pid")
    )
