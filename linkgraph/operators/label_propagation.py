"""Semi-synchronous label propagation communities.

Reference semantics (networkx/algorithms/community/label_propagation.py
:238-279, the only variant named by the north rule):

1. color the graph so adjacent nodes get distinct colors
   (``_color_network`` :282-294 via greedy coloring),
2. initial labels = a unique int per node in node order (:269) —
   here: the dense vertex id (lexicographic url order; any unique
   initial labeling is equivalent up to label renaming, and the
   ported tests compare community *sets*),
3. repeatedly, for each color class, synchronously set every node of
   that class to its most frequent neighbor label; ties broken
   **Prec-Max**: keep the current label if it is in the argmax set,
   else take ``max(argmax set)`` (:326-338); isolated nodes keep
   their own label (:318),
4. stop when every node's label is in its neighborhood argmax set
   (``_labeling_complete`` :297-307),
5. undirected only — directed input raises (:236).

Physical strategy: the reference's sequential ``largest_first``
greedy coloring cannot be reproduced distributively, but the coloring
only gates *which nodes update together*, never the converged
community sets the tests assert — the semi-synchronous convergence
argument (Cordasco & Gargano 2011, the paper the reference cites)
needs only that every simultaneous update set is an INDEPENDENT set
plus a fair schedule. The distributed path therefore runs
**Luby-style independent-set sweeps**: one Prec-Max gather computes
every dirty node's target label, and a dirty node *accepts* its move
unless an adjacent dirty node with a DIFFERENT target carries a
higher sweep-salted hash priority (the loser stays dirty and
re-rolls next sweep). Adjacent accepted movers therefore always
share one target label, so each accepted move still raises the
edge-agreement potential Φ = Σ_edges [l(u)=l(v)] by ≥1 with no
negative cross-terms (mover-mover edges only deviate upward, toward
the shared label), and the loop terminates within Φ ≤ m total
accepted moves; the global-max-priority mover always accepts, so
every sweep progresses. The same-target exemption lets a hub-label
cascade — the dominant web-graph pattern — land in one sweep instead
of serializing by priority.

Why not schedule by graph coloring, like the reference's
``_color_network``: measured on a 40M-edge Zipf web graph, the
speculative distributed coloring commits only ~3-5% of nodes per
~53 s round (hub neighborhoods make local priority maxima rare), so
coloring cost ~8× the sweeps it scheduled; and serializing a sweep
over 32 hash-dealt classes spent its time in 32 sequentially planned
driver steps whose per-class latency grew superlinearly with sweep
index (localCheckpoint planning + cache churn). One gather + one
conflict join + ONE eager checkpoint per sweep keeps every sweep two
driver actions flat. ``greedy_coloring`` remains exported as a
standalone operator.

The gather is one join (labels against the dirty slice of the edge
table) + ``max_by`` argmax with the (freq DESC, label DESC) ordering
encoding Prec-Max exactly; completion is checked INCREMENTALLY (only
prior dirty nodes and neighbors of just-accepted movers can change
status), and every loop state frame goes through
``stable_checkpoint`` (the sizeInBytes self-multiplication fix,
plans/loop.py).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph
from ..plans.loop import stable_checkpoint


def greedy_coloring(
    edges_sym: DataFrame,
    vertices: DataFrame,
    max_rounds: int = 64,
    priority=None,
) -> DataFrame:
    """Proper coloring via SPECULATIVE rounds with conflict
    resolution (Gebremedhin–Manne style); (id, color INT).

    Round-3 rewrite: the previous Jones–Plassmann local-max rule
    colored only nodes that beat their ENTIRE live neighborhood —
    measured ~1-7%% of remaining nodes per round on a Zipf web graph
    (hubs almost never win), i.e. O(n/avg-winners) rounds. Here every
    uncolored node speculatively takes its smallest free color; a
    node loses its pick only to a HIGHER-PRIORITY neighbor that chose
    the SAME color this round. Conflicts are per-color-collision, so
    a constant fraction commits each round regardless of degree skew
    — O(log n) expected rounds, 3 edge-table joins per round.

    ``edges_sym`` must hold both directions of every edge, no self
    loops. Deterministic: priority = (xxhash64(id), id) total order.

    ``priority`` makes the strategy pluggable (the reference's
    ``greedy_color(strategy=...)`` seam, networkx/algorithms/coloring/
    greedy_coloring.py): a callable mapping a column name to an
    orderable Column; higher sorts first. Default is the hashed total
    order above; e.g. ``lambda c: F.struct(F.col(f"deg_{c}"), F.col(c))``
    reproduces a largest-first-style order if degree columns are
    present on the edge table."""
    pri = priority or (
        lambda c: F.struct(F.xxhash64(c).alias("h"), F.col(c).alias("i"))
    )
    colored = vertices.select("id", F.lit(None).cast("int").alias("color"))
    colored = stable_checkpoint(colored)
    # Driver latency, not data volume, bounds this loop at scale (each
    # round's frames shrink geometrically), so the round costs exactly
    # TWO jobs: the eager checkpoint of the next state and one count
    # over the checkpointed RDD. tent rides lazily inside the state
    # checkpoint (non-eager stable_checkpoint still truncates the
    # plan, so the double reference below cannot compound stats).
    n_uncolored = -1
    # live = edges whose SRC is still uncolored: a constant fraction of
    # nodes commits per round, so re-semi-joining live against the
    # shrinking uncolored set keeps total edge work O(m) over the whole
    # loop instead of O(m · rounds) — the dominant cost at 40M+ edges,
    # where ~25 rounds of full-table gathers otherwise dwarf the
    # geometric per-round work. dst stays unrestricted (the smallest-
    # free-color pick needs uncolored -> colored edges).
    live = edges_sym
    for rnd in range(max_rounds):
        if n_uncolored == 0:
            return colored
        uncolored = colored.where(F.col("color").isNull()).select("id")
        if rnd > 0:
            # stable_checkpoint, NOT bare persist: each round's live
            # derives from the previous round's, so an uncheckpointed
            # chain nests one semi-join deeper per round and driver-side
            # planning time doubles by round ~11 (measured: 3 s/round
            # flat with the checkpoint, 46 s at round 13 without).
            live = stable_checkpoint(
                live.join(
                    uncolored.withColumnRenamed("id", "src"), "src", "left_semi"
                )
            )
        # speculative pick: smallest color unused by COLORED neighbors
        used = (
            live.join(
                colored.where(F.col("color").isNotNull()).withColumnRenamed(
                    "id", "dst"
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("id"))
            .agg(F.collect_set("color").alias("used"))
        )
        tent = (
            uncolored.join(used, "id", "left")
            .select(
                "id",
                F.coalesce(
                    F.expr(
                        "filter(sequence(0, size(used)), "
                        "x -> NOT array_contains(used, x))[0]"
                    ),
                    F.lit(0),
                ).cast("int").alias("t"),
            )
        )
        tent = stable_checkpoint(tent, eager=False)
        # conflicts: same tentative color on an edge -> the lower
        # priority endpoint retries next round
        losers = (
            live.join(
                tent.select(F.col("id").alias("src"), F.col("t").alias("ts")),
                "src",
            )
            .join(
                tent.select(F.col("id").alias("dst"), F.col("t").alias("td")),
                "dst",
            )
            .where((F.col("ts") == F.col("td")) & (pri("dst") > pri("src")))
            .select(F.col("src").alias("id"))
            .distinct()
        )
        committed = tent.join(losers, "id", "left_anti")
        colored = stable_checkpoint(
            colored.join(committed, "id", "left")
            .select("id", F.coalesce("color", "t").alias("color"))
        )
        n_uncolored = colored.where(F.col("color").isNull()).limit(1).count()
        if os.environ.get("LPA_DEBUG"):
            nu = colored.where(F.col("color").isNull()).count()
            print(
                f"LPA color round={rnd} uncolored={nu} t={time.monotonic():.1f}",
                flush=True,
            )
    if n_uncolored:
        raise RuntimeError(
            f"greedy_coloring did not finish within max_rounds={max_rounds}"
        )
    return colored


# Below this many edge rows the sweep runs in ONE Arrow task as the
# reference's literal sequential algorithm (greedy largest-first
# coloring + semi-synchronous Prec-Max sweeps) — the distributed loop
# pays O(colors) chained joins per sweep for data that is sub-task-
# sized. Same adaptive-physical-strategy rationale as
# connected_components._local_components; results differ from the
# distributed path only in which VALID labeling they converge to
# (update schedule is implementation-defined in the reference too).
LOCAL_LPA_MAX_EDGES = 500_000


def _local_lpa(graph: LinkGraph) -> DataFrame:
    """Single-task reference-exact LPA (label_propagation.py:238-338):
    greedy coloring in degree order, unique initial labels, per-color
    synchronous updates with Prec-Max tie-breaking, until every node's
    label is in its neighborhood argmax set."""
    ep = graph.edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    ).coalesce(1)

    def fn(batches):
        import pandas as pd
        from collections import Counter, defaultdict

        adj = defaultdict(set)
        for b in batches:
            for u, v in zip(b["src"], b["dst"]):
                u, v = int(u), int(v)
                if u != v:
                    adj[u].add(v)
                    adj[v].add(u)
        nodes = sorted(adj)
        # greedy coloring, largest-first (reference _color_network uses
        # nx.coloring.greedy_color 'largest_first'); ties by id
        color = {}
        for n in sorted(nodes, key=lambda x: (-len(adj[x]), x)):
            used = {color[u] for u in adj[n] if u in color}
            c = 0
            while c in used:
                c += 1
            color[n] = c
        classes = defaultdict(list)
        for n, c in color.items():
            classes[c].append(n)
        labels = {n: n for n in nodes}

        def complete():
            for n in nodes:
                freq = Counter(labels[u] for u in adj[n])
                if not freq:
                    continue
                best = max(freq.values())
                if freq.get(labels[n], 0) != best:
                    return False
            return True

        for _ in range(1000):
            if complete():
                break
            for c in sorted(classes):
                updates = {}
                for n in classes[c]:
                    freq = Counter(labels[u] for u in adj[n])
                    if not freq:
                        continue
                    best = max(freq.values())
                    if freq.get(labels[n], 0) == best:
                        continue  # Prec-Max: keep current if in argmax
                    updates[n] = max(l for l, f in freq.items() if f == best)
                labels.update(updates)
        yield pd.DataFrame(
            {"id": nodes, "label": [labels[n] for n in nodes]},
            dtype="int64",
        )

    out = ep.mapInPandas(fn, "id long, label long")
    return graph.vertices.select("id").join(out, "id", "left").select(
        "id", F.coalesce("label", F.col("id")).alias("label")
    )


def label_propagation_communities(
    graph: LinkGraph,
    max_rounds: int = 1000,
    local_max_edges: int = LOCAL_LPA_MAX_EDGES,
    warmup_rounds: int = 4,
    labels_start: DataFrame | None = None,
    stats_out: dict | None = None,
    weight: str | None = None,
) -> DataFrame:
    """Returns (id BIGINT, label BIGINT); communities = groups of equal
    label. Raises ValueError on directed graphs (parity with
    label_propagation.py:236 ``@not_implemented_for("directed")``).

    Distributed schedule = ``warmup_rounds`` SYNCHRONOUS rounds, then
    Luby-style independent-set sweeps (module docstring) until the
    Prec-Max fixpoint. The warmup rounds move EVERY unstable node at
    once with no independence guarantee — correctness does not need
    one there, because the final state is whatever passes the
    completion check and only the drain phase's termination needs the
    potential argument. What the warmup buys: from the all-unique
    initial labeling, one-shot independent acceptance is ~1/(deg+1)
    (measured 1.5% on a 40M-edge Zipf graph, avg degree ~100), while
    a synchronous round mixes every label at the same per-round cost;
    2-4 rounds collapse the label space to near-converged hub labels,
    after which the drain's same-target exemption accepts in bulk.
    Which VALID labeling the loop converges to is schedule-dependent,
    exactly as the reference's own update order is
    implementation-defined.

    ``labels_start`` (id, label) warm-starts the sweep loop from a
    previous serving table (incremental refresh under page appends —
    streaming/incremental.py): ANY integer labeling is a legal start
    (the potential argument is init-independent; unmatched vertices
    default to their own id), and a near-fixpoint start only has to
    drain the neighborhoods the appended edges disturbed. Forces the
    distributed path (the local task replays the reference schedule
    from unique labels, which would discard the warm start).
    ``stats_out`` (optional dict) gets ``sweeps`` — warm vs cold sweep
    counts are the incremental-serving win, asserted in
    tests/test_incremental.py.

    ``weight`` names an edge column: neighbor votes become SUMS OF
    EDGE WEIGHT instead of counts (reference semantics: an edge of
    weight w is equivalent to w parallel unweighted edges —
    networkx/algorithms/community/label_propagation.py:41-45 and the
    weighted vote loop at :216, ``asyn_lpa_communities(weight=)``
    :166-170). Duplicate (src,dst) rows sum, matching the multigraph
    vote loop. Weights must be non-negative; the drain's potential
    argument carries over with the weighted edge-agreement potential
    Φ_w = Σ_e w_e·[l(u)=l(v)] (each accepted move raises it by its
    strictly-positive local gain, so termination holds — the bound is
    the finite labeling lattice rather than m moves). Integer-valued
    weights keep the float vote sums exact (≤ 2^53), hence
    order-independent; irrational weights could in principle flip
    argmax TIES across partial-agg orders. Forces the distributed
    path (the local kernel replays the reference's unweighted
    schedule)."""
    if graph.directed:
        raise ValueError(
            "label_propagation_communities is not defined for directed "
            "graphs (reference parity: label_propagation.py:236)"
        )
    spark = graph.spark
    if (
        labels_start is None
        and weight is None
        and local_max_edges
        and graph.edges.count() <= local_max_edges
    ):
        return _local_lpa(graph)
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    if weight is None:
        edges = (
            graph.symmetrized_edges()
            .select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
    else:
        edges = (
            graph.symmetrized_edges()
            .select("src", "dst", F.col(weight).cast("double").alias("w"))
            .where(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
        )
    edges = edges.repartition(nparts, "src").persist()
    edges.count()
    if weight is not None:
        # the docstring's termination argument (potential Φ_w) requires
        # non-negative weights; fail HERE instead of surfacing later as
        # an opaque max_rounds RuntimeError or a wrong fixpoint. Cheap:
        # one agg over the already-persisted aggregated edge table.
        min_w = edges.agg(F.min("w")).first()[0]
        if min_w is not None and min_w < 0:
            edges.unpersist()
            raise ValueError(
                f"label_propagation_communities(weight=) requires "
                f"non-negative edge weights (min aggregated weight "
                f"{min_w}); the sweep's termination potential is only "
                f"monotone for w >= 0"
            )
    vertices = graph.vertices.select("id")

    if labels_start is None:
        labels = stable_checkpoint(
            vertices.select("id", F.col("id").alias("label"))
        )
    else:
        labels = stable_checkpoint(
            vertices.join(
                labels_start.select("id", F.col("label").alias("warm")),
                "id",
                "left",
            ).select("id", F.coalesce("warm", F.col("id")).alias("label"))
        )

    def neighbor_mode(
        labels_df: DataFrame,
        targets: DataFrame | None = None,
    ) -> DataFrame:
        """(id, best_label, cur_in_argmax) per non-isolated node.

        Prec-Max ordering: max_by over (freq, label) picks the
        largest-frequency label, ties → largest label — exactly
        ``max(high_labels)`` of label_propagation.py:326-338.
        ``targets`` restricts the gather to the sweep's candidate set
        *before* the shuffle (semi-join pushdown), so tail sweeps cost
        O(|N(candidates)|), never a full edge rescan.
        """
        e = edges
        if targets is not None:
            e = e.join(targets.withColumnRenamed("id", "src"), "src", "left_semi")
        vote = F.count(F.lit(1)) if weight is None else F.sum("w")
        freq = (
            e.join(
                labels_df.select(F.col("id").alias("dst"), F.col("label").alias("nl")),
                "dst",
            )
            .groupBy(F.col("src").alias("id"), F.col("nl"))
            .agg(vote.alias("freq"))
        )
        cur = labels_df.select("id", F.col("label").alias("cur"))
        return (
            freq.join(cur, "id")
            .groupBy("id")
            .agg(
                F.max("freq").alias("best_freq"),
                F.max_by("nl", F.struct(F.col("freq"), F.col("nl"))).alias("best_label"),
                F.max(
                    F.when(F.col("nl") == F.col("cur"), F.col("freq")).otherwise(F.lit(0))
                ).alias("cur_freq"),
            )
            .select(
                "id",
                "best_label",
                (F.col("cur_freq") == F.col("best_freq")).alias("cur_in_argmax"),
            )
        )

    # ---- synchronous warmup (heuristic accelerator, see docstring) ----
    for w in range(warmup_rounds):
        wm = neighbor_mode(labels)
        updates = wm.where(~F.col("cur_in_argmax")).select(
            "id", F.col("best_label").alias("new_label")
        )
        labels = stable_checkpoint(
            labels.join(updates, "id", "left").select(
                "id", F.coalesce("new_label", "label").alias("label")
            ),
            eager=True,
        )
        if os.environ.get("LPA_DEBUG"):
            print(f"LPA warmup={w} t={time.monotonic():.1f}", flush=True)

    # ---- provable drain: Luby independent-set sweeps ----
    dirty = None
    accepted = None
    drained = False
    for sweep in range(max_rounds):
        # completion check: every node's label in its argmax set
        # (isolated nodes vacuously complete — label_propagation.py:303-305).
        # Sweep 0 checks every node; later sweeps check INCREMENTALLY:
        # only a node that was dirty before the sweep, or whose
        # neighbor just accepted a move, can have flipped status —
        # everything else kept its label and its whole neighborhood,
        # so its argmax membership is literally the same expression.
        # (Accepted movers themselves are clean by independence: no
        # accepted neighbor, so the gather they moved on is still
        # exact — rechecking them via prev_dirty is merely harmless.)
        # EVERY cross-sweep frame (dirty, accepted, labels) is plan-
        # truncated via stable_checkpoint, never bare-persisted: dirty
        # and accepted both reference mode, and mode references the
        # previous sweep's dirty AND accepted — with plain persist the
        # logical tree doubles per sweep (2^k nodes) and the ANALYZER
        # walk OOMs the driver by sweep ~15 even on the karate graph,
        # caching notwithstanding (caching dedups execution, not the
        # logical plan).
        prev_dirty = dirty
        prev_accepted = accepted
        if sweep == 0:
            mode = neighbor_mode(labels).persist()
        else:
            nbrs = edges.join(
                prev_accepted.withColumnRenamed("id", "dst"), "dst", "left_semi"
            ).select(F.col("src").alias("id"))
            candidates = prev_dirty.union(nbrs).distinct()
            mode = neighbor_mode(labels, targets=candidates).persist()
        dirty = stable_checkpoint(
            mode.where(~F.col("cur_in_argmax")).select("id"), eager=False
        )
        incomplete = dirty.count()
        if incomplete == 0:
            drained = True
            mode.unpersist()
            if stats_out is not None:
                stats_out["sweeps"] = sweep  # sweeps that moved labels
                stats_out["warmup_rounds"] = warmup_rounds
            break
        # Luby accept: every dirty node is a mover (Prec-Max forces a
        # target when cur ∉ argmax); a mover accepts unless an ADJACENT
        # mover with a DIFFERENT target outranks it on the sweep-salted
        # (hash, id) priority. Same-target neighbors are exempt: two
        # adjacent accepted movers must then share one label L (if
        # their targets differed each would need to outrank the other),
        # and a simultaneous same-L adoption only RAISES L's frequency
        # in every member's gather — each individual gain
        # (best_freq − cur_freq ≥ 1) is computed against pre-state
        # labels and only the mover-mover edges deviate, upward. So the
        # edge-agreement potential Φ = Σ_edges [l(u)=l(v)] still rises
        # by ≥ |accepted| per sweep → termination within Φ ≤ m accepted
        # moves; the exemption is what lets a hub-label cascade (the
        # dominant web-graph pattern) land in ONE sweep instead of
        # serializing by priority. Losers stay dirty and re-roll a
        # fresh priority next sweep; the max-priority mover always
        # accepts, so every sweep makes progress.
        movers = mode.where(~F.col("cur_in_argmax")).select(
            "id", "best_label", F.xxhash64("id", F.lit(sweep)).alias("p")
        )
        losers = (
            edges.join(
                movers.select(
                    F.col("id").alias("src"),
                    F.col("p").alias("ps"),
                    F.col("best_label").alias("bs"),
                ),
                "src",
            )
            .join(
                movers.select(
                    F.col("id").alias("dst"),
                    F.col("p").alias("pd"),
                    F.col("best_label").alias("bd"),
                ),
                "dst",
            )
            .where(
                (F.col("bd") != F.col("bs"))
                & (F.struct("pd", "dst") > F.struct("ps", "src"))
            )
            .select(F.col("src").alias("id"))
            .distinct()
        )
        # checkpointed lazily (the eager labels checkpoint below is the
        # materializing action — one job, not two): next sweep's
        # candidate set is N(accepted) — the accepted ids ARE the
        # changed set, so no labels-diff join ever runs.
        accepted = stable_checkpoint(
            movers.join(losers, "id", "left_anti"), eager=False
        )
        labels = stable_checkpoint(
            labels.join(
                accepted.select("id", F.col("best_label").alias("new_label")),
                "id",
                "left",
            ).select("id", F.coalesce("new_label", "label").alias("label")),
            eager=True,
        )
        mode.unpersist()
        if os.environ.get("LPA_DEBUG"):
            sc = spark.sparkContext
            infos = sc._jsc.sc().getRDDStorageInfo()
            mem = sum(i.memSize() for i in infos) / (1 << 20)
            print(
                f"LPA sweep={sweep} dirty={incomplete}"
                f" accepted={accepted.count()}"
                f" cached_rdds={len(infos)} cached_mb={mem:.0f}"
                f" t={time.monotonic():.1f}",
                flush=True,
            )
    edges.unpersist()
    if not drained:
        # Φ ≤ Σw bounds accepted moves, not sweeps, so a pathological
        # schedule could exhaust the budget mid-drain; a partial
        # labeling violates the documented fixpoint contract, so raise
        # (the round-4 silent-truncation bug class) rather than return.
        raise RuntimeError(
            "label_propagation_communities did not reach its fixpoint "
            f"within max_rounds={max_rounds} sweeps"
        )
    return labels


def communities(graph: LinkGraph, **kwargs) -> list[frozenset]:
    """Driver-side community sets (pytest boundary): list of frozensets
    of vertex ids, parity with the reference's ``groups`` inversion
    (networkx/utils/misc.py:249)."""
    rows = (
        label_propagation_communities(graph, **kwargs)
        .groupBy("label")
        .agg(F.collect_set("id").alias("members"))
        .collect()
    )
    return [frozenset(r["members"]) for r in rows]
