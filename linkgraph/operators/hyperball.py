"""HyperBall: approximate neighborhood function, average distance and
effective diameter over the whole graph in O(t) supersteps.

The reference has no approximate-neighborhood operator; its exact
counterpart is one BFS per node (``nx.single_source_shortest_path_
length`` for every source, e.g. networkx/algorithms/shortest_paths/
unweighted.py:21) — O(n·m) work and n sequential sweeps, unusable at
web scale. This module implements the published HyperBall algorithm
(Boldi & Vigna, "In-Core Computation of Geometric Centralities with
HyperBall", 2013 — itself the HyperLogLog refinement of ANF, Palmer/
Gibbons/Faloutsos KDD 2002): every vertex carries a HyperLogLog
sketch of its distance-≤t ball, and one superstep merges each
vertex's sketch with its out-neighbors' sketches,

    B(v, t) = {v} ∪ ⋃_{(v,w)∈E} B(w, t-1)
    M_v(t)  = elementwise-max(M_v(t-1), M_w(t-1) for v→w)

so after t supersteps ``|B(v,t)|`` — the number of vertices within
distance t of v — is estimated from M_v in O(m) memory total (m = 2^b
registers per vertex), versus ANF's exact-bitset O(n²/64).

Spark-first physical shape
--------------------------
Registers live as **m small integer columns** (not an array): the
merge is then ``groupBy(id).agg(max(r0), …, max(r_{m-1}))`` — a plain
hash aggregate with map-side partial max, fully inside whole-stage
codegen, no UDF, no higher-order array functions. One superstep = one
shuffle join (registers ⋈ edges on dst) + one hash agg, the identical
shape as the pagerank gather. At 100 TB the register table is
n × (m+1) ints — for b=6 that is 65 ints/vertex, far below the
bitset ANF equivalent, and the join partitioning is reused across
supersteps.

Determinism / oracle parity: the hash is the first 15 hex chars of
``md5(cast(id as string))`` (60-bit, positive), the register index is
``hash mod m``, and rho is **pure-integer** trailing-zeros+1 of
``hash >> b`` via ``bit_count((w & -w) - 1) + 1`` — every primitive
exists identically in Spark SQL and DuckDB, so the driver's oracle
hash-matches the registers bit-for-bit. The ball-size estimate keeps
the raw-HLL formula with a **fixed left-to-right register order** in
the denominator sum so Spark and the oracle round identically (the
terms are exact powers of two; only the accumulation order could
differ).

``ball_size_estimate`` applies the standard small-range linear-
counting correction (E ≤ 2.5m with empty registers → m·ln(m/V),
Flajolet et al. 2007) — it needs ``ln``, whose last-bit rounding is
libm-specific, so the DRIVER-ORACLE entry query compares the exact
integer REGISTERS (plus their sum), never the float estimate; the
estimate's accuracy (standard 1.04/sqrt(m), b=6 → ~13%) is verified
in pytest against exact per-node BFS ball sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph

__all__ = [
    "hll_alpha",
    "init_registers",
    "hyperball_registers",
    "ball_size_estimate",
    "neighborhood_function",
    "distance_summary_hyperball",
    "harmonic_centrality_hyperball",
]

# max rho for a 60-bit hash with b index bits: all (60-b) suffix bits
# zero → rho = 61-b (the standard "w == 0" sentinel)


def hll_alpha(m: int) -> float:
    """Standard HyperLogLog bias constant (Flajolet et al. 2007)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _register_cols(b: int) -> list[str]:
    return [f"r{i}" for i in range(1 << b)]


def init_registers(
    vertices: DataFrame, b: int = 6, hash_col: str = "id"
) -> DataFrame:
    """(id, r0 … r_{m-1}) — each vertex's HLL sketch of {itself}.

    hash = 60-bit md5 prefix of ``hash_col``; register j = hash mod m
    gets rho(hash >> b) = trailing zeros + 1; every other register 0.
    ``hash_col`` must be STABLE across graph rebuilds when sketches
    are reused (incremental serving hashes the url — dense ids remap
    as the vertex set grows, which would scramble warm registers).
    """
    m = 1 << b
    hv = F.conv(
        F.substring(F.md5(F.col(hash_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    df = vertices.select(F.col("id").cast("long").alias("id"), hv.alias("_hv"))
    w = f"shiftright(_hv, {b})"
    rho = F.expr(
        f"CASE WHEN {w} = 0 THEN {61 - b} "
        f"ELSE bit_count(({w} & -{w}) - 1) + 1 END"
    )
    j = F.pmod(F.col("_hv"), F.lit(m))
    return df.select(
        "id",
        *[
            F.when(j == i, rho).otherwise(F.lit(0)).cast("int").alias(f"r{i}")
            for i in range(m)
        ],
    )


def _prep_edges(graph: LinkGraph, directed: bool, reverse: bool):
    """Deduped (src, dst) persisted HASH-PARTITIONED BY dst: the
    cached scan keeps its outputPartitioning, so every superstep's
    join shuffles only the (changing) register table — the same
    persisted-adjacency shape as the pagerank gather. Max-merge is
    idempotent, so dropping parallel edge rows is lossless."""
    edges = (
        graph.weighted_edges() if directed else graph.symmetrized_edges()
    ).select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    )
    if reverse and directed:
        edges = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    nparts = int(graph.spark.conf.get("spark.sql.shuffle.partitions"))
    edges = edges.distinct().repartition(nparts, "dst").persist()
    edges.count()
    return edges


def _delta_superstep(
    edges: DataFrame, reg: DataFrame, rcols: list[str], extras: list[str]
) -> DataFrame:
    """One systolic merge round with the HyperBall paper's
    modified-counter optimization (Boldi & Vigna 2013 §3): only
    vertices whose sketch CHANGED last round send messages — register
    sums are strictly monotone, so ``chg = (Σr > prev Σr)`` detects
    change exactly, and an unchanged neighbor's message is a repeat
    the receiver already merged. Late supersteps (when most balls have
    saturated) then ship almost nothing instead of one 2^b-column row
    per edge.

    ``reg`` carries (id, *rcols, rs, chg, *extras). Messages are
    aggregated ALONE — one repartition of the (delta-filtered) raw
    message stream by receiver, then an exchange-free final max — and
    merged into the state via a co-partitioned ``greatest`` LEFT join
    (both sides hash-partitioned by id), so per-vertex accumulators
    never enter the aggregate at all. This ships the raw message rows
    exactly once and avoids the union-with-state plan whose partial
    aggregate re-processes every self row and whose map-side output
    grows with parallelism (≈ partitions × n once each partition sees
    most vertex ids — no compression left at high core counts).
    """
    nparts = int(reg.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    senders = reg.where(F.col("chg") == 1).select("id", *rcols)
    msgs = edges.join(senders, edges["dst"] == senders["id"]).select(
        edges["src"].alias("id"), *rcols
    )
    magg = (
        msgs.repartition(nparts, "id")
        .groupBy("id")
        .agg(*[F.max(c).alias(f"_m{i}") for i, c in enumerate(rcols)])
    )
    # reg is already hash-partitioned by id (previous round's join /
    # checkpoint preserves it) — EnsureRequirements adds an exchange
    # only when it is not, so no explicit repartition here
    merged = reg.drop("chg").join(magg, "id", "left")
    new_regs = [
        F.greatest(F.col(c), F.coalesce(F.col(f"_m{i}"), F.lit(0)))
        .cast("int")
        .alias(c)
        for i, c in enumerate(rcols)
    ]
    out = merged.select(
        "id", *new_regs, F.col("rs").alias("_prev_rs"), *extras
    )
    rs = sum((F.col(c) for c in rcols), F.lit(0)).cast("int")
    return out.withColumn("rs", rs).withColumn(
        "chg", (F.col("rs") > F.col("_prev_rs")).cast("int")
    ).drop("_prev_rs")


def _init_state(
    graph: LinkGraph,
    b: int,
    registers_start: DataFrame | None = None,
    hash_col: str = "id",
) -> DataFrame:
    reg = init_registers(graph.vertices, b, hash_col=hash_col)
    rcols = _register_cols(b)
    if registers_start is not None:
        # warm start: element-wise max with a previous fixpoint's
        # registers. Valid under edge APPENDS: old sketches are lower
        # bounds of the new reach sets in the max-merge lattice, so
        # iteration from the warm point reaches the IDENTICAL fixpoint
        # a cold run does (same argument as connected_components'
        # labels_start), just in fewer supersteps. Vertices absent
        # from the start table (new pages) keep their fresh init.
        start = registers_start.select(
            F.col("id").cast("long").alias("id"),
            *[F.col(c).cast("int").alias(f"_p{i}") for i, c in enumerate(rcols)],
        )
        reg = reg.join(start, "id", "left").select(
            "id",
            *[
                F.greatest(F.col(c), F.coalesce(F.col(f"_p{i}"), F.lit(0)))
                .cast("int")
                .alias(c)
                for i, c in enumerate(rcols)
            ],
        )
    rs = sum((F.col(c) for c in rcols), F.lit(0)).cast("int")
    return reg.withColumn("rs", rs).withColumn("chg", F.lit(1))


def hyperball_registers(
    graph: LinkGraph,
    b: int = 6,
    t: int = 3,
    reverse: bool = False,
    directed: bool | None = None,
    checkpoint_every: int = 1,
    registers_start: DataFrame | None = None,
    stats_out: dict | None = None,
    hash_col: str = "id",
) -> DataFrame:
    """Registers of every vertex's distance-≤t ball: (id, r0 … r_{m-1}).

    Out-balls by default (vertices REACHABLE FROM v in ≤t hops);
    ``reverse=True`` gives in-balls (who reaches v — the side HyperBall
    uses for harmonic/closeness centrality). On an undirected graph
    (``graph.directed=False`` or ``directed=False``) edges are
    symmetrized first, so both orientations coincide. Supersteps past
    global saturation are exact no-ops and the loop stops early (the
    modified-counter rule, see :func:`_delta_superstep`) — with a
    large ``t`` this runs to the full REACHABILITY sketch fixpoint.

    ``registers_start`` (id, r0 … r_{m-1}) warm-starts from a previous
    fixpoint (incremental serving under edge appends — see
    :func:`_init_state`); ``stats_out`` receives ``supersteps``;
    ``hash_col`` picks the init-hash key (MUST be rebuild-stable, e.g.
    ``url``, whenever sketches outlive one graph build).
    """
    if directed is None:
        directed = graph.directed
    edges = _prep_edges(graph, directed, reverse)
    rcols = _register_cols(b)
    reg = _init_state(graph, b, registers_start, hash_col=hash_col).persist()
    reg.count()
    prev = [reg]
    steps_run = 0
    for step in range(t):
        nxt = _delta_superstep(edges, reg, rcols, [])
        if (step + 1) % checkpoint_every == 0:
            nxt = nxt.localCheckpoint(eager=True)
        else:
            nxt = nxt.persist()
        n_changed = nxt.agg(F.sum("chg").alias("c")).first()["c"] or 0
        steps_run = step + 1
        for p in prev:
            p.unpersist()
        prev = [nxt]
        reg = nxt
        if n_changed == 0:
            break
    edges.unpersist()
    if stats_out is not None:
        stats_out["supersteps"] = steps_run
    return reg.drop("rs", "chg")


def ball_size_estimate(registers: DataFrame, b: int) -> DataFrame:
    """Adds ``est`` (HLL ball-size estimate, DOUBLE) and ``reg_sum``
    (INT, exact) to a register table.

    Standard HyperLogLog estimator: raw harmonic-mean estimate
    α_m·m²/Σ 2^{-r_j}, replaced by linear counting m·ln(m/V) when the
    raw estimate is ≤ 2.5m and V>0 registers are still empty (the
    small-range regime where the raw formula is badly biased). The
    harmonic denominator is a fixed left-to-right sum so repeated
    evaluations are bit-stable.
    """
    m = 1 << b
    alpha = hll_alpha(m)
    denom = " + ".join(f"1.0 / CAST(shiftleft(1, r{i}) AS DOUBLE)" for i in range(m))
    zeros = " + ".join(f"(CASE WHEN r{i} = 0 THEN 1 ELSE 0 END)" for i in range(m))
    raw = f"{alpha!r} * {m} * {m} / ({denom})"
    est = F.expr(
        f"CASE WHEN ({raw}) <= {2.5 * m!r} AND ({zeros}) > 0 "
        f"THEN {m} * ln({m} / CAST(({zeros}) AS DOUBLE)) "
        f"ELSE ({raw}) END"
    )
    reg_sum = sum((F.col(c) for c in _register_cols(b)), F.lit(0))
    return registers.withColumn("reg_sum", reg_sum.cast("int")).withColumn("est", est)


def neighborhood_function(
    graph: LinkGraph,
    b: int = 6,
    max_t: int = 16,
    directed: bool | None = None,
    rel_tol: float = 1e-4,
) -> DataFrame:
    """N(t) for t = 0..T: estimated number of (source, target) pairs
    with d(source→target) ≤ t (ANF's neighbourhood function). Stops
    early once N(t) grows by less than ``rel_tol`` relative (all balls
    saturated) — the HyperBall termination rule. Returns a small
    driver-built DataFrame (t INT, nf DOUBLE); one scalar crosses the
    driver per superstep, like pagerank's convergence metric.
    """
    if directed is None:
        directed = graph.directed
    spark = graph.spark
    edges = _prep_edges(graph, directed, reverse=False)
    rcols = _register_cols(b)
    reg = _init_state(graph, b).persist()
    reg.count()

    def stats(r: DataFrame):
        row = (
            ball_size_estimate(r, b)
            .agg(F.sum("est").alias("s"), F.sum("chg").alias("c"))
            .first()
        )
        return float(row["s"] or 0.0), int(row["c"] or 0)

    val, _ = stats(reg)
    nf = [val]
    for _step in range(max_t):
        # lineage MUST be truncated every round: each superstep
        # references the previous state twice (senders + self-union),
        # so an un-checkpointed plan doubles per round — exponential
        # analysis cost that OOMs small drivers. localCheckpoint is
        # the persist-equivalent that also cuts the logical plan.
        nxt = _delta_superstep(edges, reg, rcols, []).localCheckpoint(eager=True)
        val, n_changed = stats(nxt)
        reg.unpersist()
        reg = nxt
        nf.append(val)
        if n_changed == 0 or val <= nf[-2] * (1.0 + rel_tol):
            break
    edges.unpersist()
    reg.unpersist()
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(nf)], "t int, nf double"
    )


def distance_summary_hyperball(
    graph: LinkGraph,
    b: int = 6,
    max_t: int = 16,
    q: float = 0.9,
    directed: bool | None = None,
) -> DataFrame:
    """One row (avg_distance DOUBLE, effective_diameter DOUBLE,
    n_pairs_est DOUBLE) from the neighbourhood function:

    * avg_distance  = Σ_t t·(N(t)−N(t−1)) / (N(T)−N(0))  — mean over
      reachable ordered pairs (excluding d=0 self pairs),
    * effective_diameter = the interpolated t where N first reaches
      q·N(T) (Palmer et al.'s 90%-effective-diameter for q=0.9).
    """
    pdf = neighborhood_function(graph, b=b, max_t=max_t, directed=directed).toPandas()
    nfs = list(pdf.sort_values("t")["nf"])
    n_final, n0 = nfs[-1], nfs[0]
    reach = max(n_final - n0, 1e-12)
    avg = sum(t * (nfs[t] - nfs[t - 1]) for t in range(1, len(nfs))) / reach
    target = q * n_final
    eff = float(len(nfs) - 1)
    for t in range(len(nfs)):
        if nfs[t] >= target:
            if t == 0:
                eff = 0.0
            else:
                step = nfs[t] - nfs[t - 1]
                eff = t - 1 + ((target - nfs[t - 1]) / step if step > 0 else 1.0)
            break
    spark = graph.spark
    return spark.createDataFrame(
        [(float(avg), float(eff), float(n_final))],
        "avg_distance double, effective_diameter double, n_pairs_est double",
    )


def harmonic_centrality_hyperball(
    graph: LinkGraph,
    b: int = 6,
    max_t: int = 16,
    directed: bool | None = None,
    rel_tol: float = 1e-4,
    checkpoint_every: int = 1,
) -> DataFrame:
    """(id, harmonic_est, n_in_est, dist_sum_est, closeness_est) — the
    HyperBall paper's geometric centralities for EVERY vertex in
    O(diameter) supersteps, from in-ball shell increments
    Δ_t = |B_in(v,t)| − |B_in(v,t−1)|:

        harmonic_est  ≈ Σ_t Δ_t / t            (Σ_{u≠v} 1/d(u→v))
        dist_sum_est  ≈ Σ_t Δ_t · t            (Σ_u d(u→v))
        n_in_est      ≈ |B_in(v,T)|            (v's reachers, incl v)
        closeness_est = (r−1)²/((n−1)·dsum)    (nx's Wasserman–Faust
                        ``closeness_centrality`` with r = n_in_est)

    (Boldi & Vigna 2013 §4). Exact counterparts in the engine:
    ``centrality.sampled_closeness_harmonic`` gives EXACT sums from a
    PIVOT SAMPLE; this gives ≈(1±1.04/√m) sums for ALL vertices — the
    right trade at web scale where you want every page's score, not
    60 pivots'.

    Physical shape: identical to :func:`hyperball_registers` (edge
    side persisted hash-partitioned, delta messaging, one register
    shuffle per superstep). The running accumulators ride the SAME
    aggregate as null-for-messages columns reduced with ``max`` —
    exactly one non-null (the vertex's own row) exists per group, so
    no second join is added. Shell increments are clamped at ≥0 (the
    raw→linear-counting estimator switch can step down).
    """
    if directed is None:
        directed = graph.directed
    # in-balls: who reaches v  ==  out-balls on the reversed graph
    edges = _prep_edges(graph, directed, reverse=True)
    rcols = _register_cols(b)
    n_vertices = graph.vertices.count()
    reg = (
        ball_size_estimate(_init_state(graph, b), b)
        .withColumnRenamed("est", "prev_est")
        .withColumn("harm", F.lit(0.0))
        .withColumn("dsum", F.lit(0.0))
        .drop("reg_sum")
        .persist()
    )
    reg.count()
    prev = [reg]
    total = None
    for step in range(1, max_t + 1):
        merged = _delta_superstep(edges, reg, rcols, ["prev_est", "harm", "dsum"])
        shell = F.greatest(F.col("est") - F.col("prev_est"), F.lit(0.0))
        nxt = (
            ball_size_estimate(merged, b)
            .withColumn("harm", F.col("harm") + shell / F.lit(float(step)))
            .withColumn("dsum", F.col("dsum") + shell * F.lit(float(step)))
            .drop("prev_est", "reg_sum")
            .withColumnRenamed("est", "prev_est")
        )
        if step % checkpoint_every == 0:
            nxt = nxt.localCheckpoint(eager=True)
        else:
            nxt = nxt.persist()
        grown = nxt.agg(
            F.sum("prev_est").alias("s"), F.sum("chg").alias("c")
        ).first()
        for p in prev:
            p.unpersist()
        prev = [nxt]
        old_total = total
        total = float(grown["s"])
        n_changed = int(grown["c"] or 0)
        reg = nxt
        if n_changed == 0 or (
            old_total is not None and total <= old_total * (1.0 + rel_tol)
        ):
            break
    edges.unpersist()
    r1 = F.greatest(F.col("prev_est") - F.lit(1.0), F.lit(0.0))
    closeness = F.when(
        F.col("dsum") > 0, r1 * r1 / (F.lit(float(max(n_vertices - 1, 1))) * F.col("dsum"))
    ).otherwise(F.lit(0.0))
    return reg.select(
        "id",
        F.col("harm").alias("harmonic_est"),
        F.col("prev_est").alias("n_in_est"),
        F.col("dsum").alias("dist_sum_est"),
        closeness.alias("closeness_est"),
    )
