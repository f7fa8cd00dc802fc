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
Registers are **broadword-packed, 8 per BIGINT lane-group** (Boldi &
Vigna 2013 §3.2's register-packing idea): internal state and every
shuffled message row carry ``m/8`` BIGINT columns (``p0 … p_{m/8-1}``,
register j in byte lane ``j mod 8`` of word ``j div 8``) instead of
``m`` INT columns. In Tungsten's UnsafeRow every fixed-width field
occupies 8 bytes regardless of declared type, so b=6 messages shrink
from 64×8 = 512 B to 8×8 = 64 B — an 8× cut in the raw-message
shuffle that BENCH §7g measured as this operator's bottleneck
(shuffle-bandwidth-bound at 8→32 cores, wall ∝ 2^b). Register values
are ρ ≤ 61−b < 128, so each byte lane's high bit is always clear and
lane extraction is plain ``(p >> 8l) & 255``.

One superstep = one shuffle join (packed registers ⋈ edges on dst) +
one per-lane max hash aggregate — the aggregate computes
``max((p_q >> 8l) & 255)`` per register (still a plain codegen'd hash
agg; only the SHIPPED rows are packed), then repacks the maxima into
BIGINT lanes and merges them into the state via a co-partitioned
``greatest``-per-lane LEFT join. Per-vertex accumulators (the
harmonic/closeness running sums) ride through that join, never
through the aggregate. The edge side is persisted hash-partitioned by
dst and reused across supersteps, the same shape as the pagerank
gather.

Determinism / oracle parity: the hash is the first 15 hex chars of
``md5(cast(id as string))`` (60-bit, positive), the register index is
``hash mod m``, and rho is **pure-integer** trailing-zeros+1 of
``hash >> b`` via ``bit_count((w & -w) - 1) + 1`` — every primitive
exists identically in Spark SQL and DuckDB, so the driver's oracle
hash-matches the (unpacked) registers bit-for-bit; packing is an
internal wire format, the public schema stays ``(id, r0 … r_{m-1})``.

``ball_size_estimate`` applies the standard small-range linear-
counting correction (E ≤ 2.5m with empty registers → m·ln(m/V),
Flajolet et al. 2007) — it needs ``ln``, whose last-bit rounding is
libm-specific, so the DRIVER-ORACLE entry query compares the exact
integer REGISTERS (plus their sum), never the float estimate; the
estimate's accuracy (standard 1.04/sqrt(m), b=6 → ~13%) is verified
in pytest against exact per-node BFS ball sizes. The 2^r denominator
terms are built with ``shiftleft(CAST(1 AS BIGINT), r)`` — a 32-bit
literal would mask the shift amount mod 32 and corrupt the estimate
for any register ≥ 31 (legal up to 61−b).
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
# zero → rho = 61-b (the standard "w == 0" sentinel). 61-b < 128, so
# every register fits an unsigned byte lane.


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


def _npk(b: int) -> int:
    """Number of packed BIGINT columns (8 byte lanes each)."""
    return ((1 << b) + 7) // 8


def _packed_cols(b: int) -> list[str]:
    return [f"p{q}" for q in range(_npk(b))]


def _lane_sql(j: int, prefix: str = "p") -> str:
    """SQL snippet extracting register j from the packed columns."""
    return f"(({prefix}{j // 8} >> {8 * (j % 8)}) & 255)"


def _lane_count(b: int, q: int) -> int:
    """Lanes actually used in packed word q (8, except a short tail
    when m < 8)."""
    return min(8, (1 << b) - 8 * q)


def _lane_merge_sql(a: str, bexpr: str, nlanes: int) -> str:
    """SQL for the per-lane (byte-wise unsigned) max of two packed
    BIGINTs — the broadword register merge. Lanes are independent, so
    the merged word is the OR of per-lane ``greatest`` results shifted
    back into place; all inputs are < 2^62 (lane values ≤ 61), so no
    sign-bit hazards under ANSI arithmetic."""
    parts = [
        f"shiftleft(greatest((({a}) >> {8 * l}) & 255, "
        f"(({bexpr}) >> {8 * l}) & 255), {8 * l})"
        for l in range(nlanes)
    ]
    return "CAST(" + " | ".join(parts) + " AS BIGINT)"


def _pack_exprs(b: int, rcol) -> list:
    """Pack m register columns (name via ``rcol(j)``) into BIGINT lane
    words: register j → byte lane j%8 of word j//8."""
    out = []
    for q in range(_npk(b)):
        parts = [
            f"shiftleft(CAST({rcol(8 * q + l)} AS BIGINT) & 255, {8 * l})"
            for l in range(_lane_count(b, q))
        ]
        out.append(F.expr("CAST(" + " | ".join(parts) + " AS BIGINT)"))
    return out


def _unpack_select(df: DataFrame, b: int, extras: list[str] = ()) -> DataFrame:
    """Public-schema projection: packed words → (id, r0 … r_{m-1})."""
    m = 1 << b
    return df.select(
        "id",
        *[F.expr(f"CAST({_lane_sql(j)} AS INT)").alias(f"r{j}") for j in range(m)],
        *extras,
    )


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
    return _unpack_select(_init_packed(vertices, b, hash_col), b)


def _init_packed(
    vertices: DataFrame, b: int = 6, hash_col: str = "id"
) -> DataFrame:
    """(id, p0 … p_{npk-1}) — the packed form of :func:`init_registers`:
    the single nonzero register rho lands in byte lane j%8 of word
    j//8."""
    m = 1 << b
    hv = F.conv(
        F.substring(F.md5(F.col(hash_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    df = vertices.select(F.col("id").cast("long").alias("id"), hv.alias("_hv"))
    w = f"shiftright(_hv, {b})"
    df = df.withColumn(
        "_rho",
        F.expr(
            f"CASE WHEN {w} = 0 THEN {61 - b} "
            f"ELSE bit_count(({w} & -{w}) - 1) + 1 END"
        ),
    ).withColumn("_j", F.pmod(F.col("_hv"), F.lit(m)))
    return df.select(
        "id",
        *[
            F.expr(
                f"CAST(CASE WHEN (_j >> 3) = {q} THEN "
                f"shiftleft(CAST(_rho AS BIGINT), CAST((_j & 7) * 8 AS INT)) "
                f"ELSE CAST(0 AS BIGINT) END AS BIGINT)"
            ).alias(f"p{q}")
            for q in range(_npk(b))
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
    edges: DataFrame, reg: DataFrame, b: int, extras: list[str]
) -> DataFrame:
    """One systolic merge round with the HyperBall paper's
    modified-counter optimization (Boldi & Vigna 2013 §3): only
    vertices whose sketch CHANGED last round send messages — the
    max-merge is monotone, so ``chg`` (any packed word differing from
    its previous value) detects change exactly, and an unchanged
    neighbor's message is a repeat the receiver already merged. Late
    supersteps (when most balls have saturated) then ship almost
    nothing instead of one packed row per edge.

    ``reg`` carries (id, p0 … p_{npk-1}, *extras, chg). Messages are
    aggregated ALONE — one repartition of the (delta-filtered) PACKED
    raw message stream by receiver, then an exchange-free per-lane
    final max, repacked — and merged into the state via a
    co-partitioned per-lane-``greatest`` LEFT join (both sides
    hash-partitioned by id). The per-vertex accumulators in ``extras``
    ride through that join untouched; they never enter the aggregate.
    This ships each raw message row exactly once at packed width
    (npk BIGINTs ≈ m bytes, vs m 8-byte UnsafeRow slots unpacked —
    8× narrower, the §7g fix) and avoids the union-with-state plan
    whose partial aggregate re-processes every self row and whose
    map-side output grows with parallelism.
    """
    m = 1 << b
    pcols = _packed_cols(b)
    nparts = int(reg.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    senders = reg.where(F.col("chg") == 1).select("id", *pcols)
    msgs = edges.join(senders, edges["dst"] == senders["id"]).select(
        edges["src"].alias("id"), *pcols
    )
    lane_max = [
        F.max(F.expr(_lane_sql(j))).alias(f"_l{j}") for j in range(m)
    ]
    magg = (
        msgs.repartition(nparts, "id")
        .groupBy("id")
        .agg(*lane_max)
        .select("id", *_pack_from(b, "_l", "_m"))
    )
    # reg is already hash-partitioned by id (previous round's join /
    # checkpoint preserves it) — EnsureRequirements adds an exchange
    # only when it is not, so no explicit repartition here
    merged = reg.drop("chg").join(magg, "id", "left")
    new_words = [
        F.expr(
            _lane_merge_sql(
                f"p{q}", f"coalesce(_m{q}, CAST(0 AS BIGINT))", _lane_count(b, q)
            )
        ).alias(f"_n{q}")
        for q in range(_npk(b))
    ]
    out = merged.select(
        "id",
        *new_words,
        *[F.col(f"p{q}").alias(f"_o{q}") for q in range(_npk(b))],
        *extras,
    )
    chg = F.lit(False)
    for q in range(_npk(b)):
        chg = chg | (F.col(f"_n{q}") != F.col(f"_o{q}"))
    return out.select(
        "id",
        *[F.col(f"_n{q}").alias(f"p{q}") for q in range(_npk(b))],
        *extras,
        chg.cast("int").alias("chg"),
    )


def _pack_from(b: int, src_prefix: str, dst_prefix: str) -> list:
    """Repack per-lane scalar columns ``{src_prefix}{j}`` into BIGINT
    words ``{dst_prefix}{q}`` (post-aggregate projection)."""
    out = []
    for q in range(_npk(b)):
        parts = [
            f"shiftleft(CAST({src_prefix}{8 * q + l} AS BIGINT) & 255, {8 * l})"
            for l in range(_lane_count(b, q))
        ]
        out.append(
            F.expr("CAST(" + " | ".join(parts) + " AS BIGINT)").alias(
                f"{dst_prefix}{q}"
            )
        )
    return out


def _init_state(
    graph: LinkGraph,
    b: int,
    registers_start: DataFrame | None = None,
    hash_col: str = "id",
) -> DataFrame:
    """Packed initial state (id, p*, chg=1), warm-started if given."""
    reg = _init_packed(graph.vertices, b, hash_col=hash_col)
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
            *[
                e.alias(f"_s{q}")
                for q, e in enumerate(
                    _pack_exprs(b, lambda j: f"CAST(r{j} AS BIGINT)")
                )
            ],
        )
        reg = reg.join(start, "id", "left").select(
            "id",
            *[
                F.expr(
                    _lane_merge_sql(
                        f"p{q}",
                        f"coalesce(_s{q}, CAST(0 AS BIGINT))",
                        _lane_count(b, q),
                    )
                ).alias(f"p{q}")
                for q in range(_npk(b))
            ],
        )
    return reg.withColumn("chg", F.lit(1))


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
    ``url``, whenever sketches outlive one graph build). State and
    messages are broadword-packed internally (module docstring); only
    this public projection unpacks.
    """
    if directed is None:
        directed = graph.directed
    edges = _prep_edges(graph, directed, reverse)
    reg = _init_state(graph, b, registers_start, hash_col=hash_col).persist()
    reg.count()
    prev = [reg]
    steps_run = 0
    for step in range(t):
        nxt = _delta_superstep(edges, reg, b, [])
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
    return _unpack_select(reg, b)


def _est_sql(b: int, lane) -> str:
    """SQL for the HLL ball-size estimate given a per-register SQL
    snippet factory ``lane(j)``. Raw harmonic-mean estimate
    α_m·m²/Σ 2^{-r_j}, replaced by linear counting m·ln(m/V) when the
    raw estimate is ≤ 2.5m and V>0 registers are still empty. The
    denominator is a fixed left-to-right sum of exact powers of two
    (``shiftleft(CAST(1 AS BIGINT), r)`` — BIGINT, because a 32-bit
    base masks the shift mod 32 and r can legally reach 61−b), so
    repeated evaluations are bit-stable."""
    m = 1 << b
    alpha = hll_alpha(m)
    denom = " + ".join(
        f"1.0 / CAST(shiftleft(CAST(1 AS BIGINT), CAST({lane(j)} AS INT)) AS DOUBLE)"
        for j in range(m)
    )
    zeros = " + ".join(f"(CASE WHEN {lane(j)} = 0 THEN 1 ELSE 0 END)" for j in range(m))
    raw = f"{alpha!r} * {m} * {m} / ({denom})"
    return (
        f"CASE WHEN ({raw}) <= {2.5 * m!r} AND ({zeros}) > 0 "
        f"THEN {m} * ln({m} / CAST(({zeros}) AS DOUBLE)) "
        f"ELSE ({raw}) END"
    )


def ball_size_estimate(registers: DataFrame, b: int) -> DataFrame:
    """Adds ``est`` (HLL ball-size estimate, DOUBLE) and ``reg_sum``
    (INT, exact) to an UNPACKED register table (id, r0 … r_{m-1})."""
    est = F.expr(_est_sql(b, lambda j: f"r{j}"))
    reg_sum = sum((F.col(c) for c in _register_cols(b)), F.lit(0))
    return registers.withColumn("reg_sum", reg_sum.cast("int")).withColumn("est", est)


def _est_packed(b: int) -> F.Column:
    """The same estimate as :func:`ball_size_estimate`, computed
    directly from the packed words (identical term order → identical
    doubles)."""
    return F.expr(_est_sql(b, _lane_sql))


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
    reg = _init_state(graph, b).persist()
    reg.count()

    def stats(r: DataFrame):
        row = r.agg(
            F.sum(_est_packed(b)).alias("s"), F.sum("chg").alias("c")
        ).first()
        return float(row["s"] or 0.0), int(row["c"] or 0)

    val, _ = stats(reg)
    nf = [val]
    for _step in range(max_t):
        # lineage MUST be truncated every round: each superstep
        # references the previous state twice (senders + merge join),
        # so an un-checkpointed plan doubles per round — exponential
        # analysis cost that OOMs small drivers. localCheckpoint is
        # the persist-equivalent that also cuts the logical plan.
        nxt = _delta_superstep(edges, reg, b, []).localCheckpoint(eager=True)
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

    * avg_distance  = Σ_t t·ΔN(t) / Σ_t ΔN(t) — mean over reachable
      ordered pairs (excluding d=0 self pairs),
    * effective_diameter = the interpolated t where N first reaches
      q·N(T) (Palmer et al.'s 90%-effective-diameter for q=0.9).

    The raw→linear-counting estimator switch can make the estimated
    N(t) step DOWN even though the true function is monotone, so the
    sequence is first clamped to its monotone envelope
    (N'(t) = max(N'(t−1), N(t))) — per-step increments are then ≥ 0
    and the clamped total is the normalizer, the same guard
    :func:`harmonic_centrality_hyperball` applies to its shells.
    """
    pdf = neighborhood_function(graph, b=b, max_t=max_t, directed=directed).toPandas()
    nfs = list(pdf.sort_values("t")["nf"])
    mono = []
    for v in nfs:
        mono.append(v if not mono else max(mono[-1], v))
    n_final, n0 = mono[-1], mono[0]
    reach = max(n_final - n0, 1e-12)
    avg = sum(t * (mono[t] - mono[t - 1]) for t in range(1, len(mono))) / reach
    target = q * n_final
    eff = float(len(mono) - 1)
    for t in range(len(mono)):
        if mono[t] >= target:
            if t == 0:
                eff = 0.0
            else:
                step = mono[t] - mono[t - 1]
                eff = t - 1 + ((target - mono[t - 1]) / step if step > 0 else 1.0)
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
    side persisted hash-partitioned, delta messaging, one PACKED
    register shuffle per superstep). The running accumulators
    (prev_est, harm, dsum) ride through the co-partitioned merge join
    as untouched extras — they never enter the message aggregate.
    Shell increments are clamped at ≥0 (the raw→linear-counting
    estimator switch can step down).
    """
    if directed is None:
        directed = graph.directed
    # in-balls: who reaches v  ==  out-balls on the reversed graph
    edges = _prep_edges(graph, directed, reverse=True)
    n_vertices = graph.vertices.count()
    reg = (
        _init_state(graph, b)
        .withColumn("prev_est", _est_packed(b))
        .withColumn("harm", F.lit(0.0))
        .withColumn("dsum", F.lit(0.0))
        .select("id", *_packed_cols(b), "prev_est", "harm", "dsum", "chg")
        .persist()
    )
    reg.count()
    prev = [reg]
    total = None
    for step in range(1, max_t + 1):
        merged = _delta_superstep(edges, reg, b, ["prev_est", "harm", "dsum"])
        shell = F.greatest(_est_packed(b) - F.col("prev_est"), F.lit(0.0))
        nxt = merged.select(
            "id",
            *_packed_cols(b),
            _est_packed(b).alias("_est"),
            (F.col("harm") + shell / F.lit(float(step))).alias("harm"),
            (F.col("dsum") + shell * F.lit(float(step))).alias("dsum"),
            "chg",
        ).withColumnRenamed("_est", "prev_est")
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
