"""Superstep harness: persist/unpersist, checkpointing, ledger, resume.

Spark has no fixpoint operator; every iterative algorithm in this
engine (pagerank / connected components / LPA) drives a Python loop
where each superstep is one Catalyst-planned job. Without lineage
truncation the logical plan grows linearly per iteration and planning
time dominates by ~iteration 20 — so every ``checkpoint_every``
supersteps the frontier is snapshotted to Parquet (durable, resumable)
and re-read, and a JSON-lines ledger records per-partition lineage +
convergence metrics (the north rule's "checkpointed every k supersteps
with per-partition lineage and convergence metrics so runs resume
mid-algorithm").

The reference has no analog (eager single-process library); the
closest devices are its conversion caches
(networkx/utils/backends.py:690-695) and cached properties
(networkx/classes/graph.py:23-68) — here replaced by explicit
persist()/unpersist() of per-superstep DataFrames.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


class PowerIterationFailedConvergence(RuntimeError):
    """Mirror of networkx.PowerIterationFailedConvergence
    (raised at networkx/algorithms/link_analysis/pagerank_alg.py:172,498)."""

    def __init__(self, num_iterations: int):
        super().__init__(f"power iteration failed to converge within {num_iterations} iterations")
        self.num_iterations = num_iterations


def stable_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """``localCheckpoint`` + STATISTICS RESET — the checkpoint every
    iterative self-joining loop must use.

    Spark's (local)checkpoint truncates lineage but copies the child
    plan's computed statistics onto the resulting ``LogicalRDD``
    (``originStats``). When a superstep's query references the state
    frame k ≥ 2 times (pointer-jump self-joins, gather+current joins),
    the estimated ``sizeInBytes`` therefore multiplies by itself every
    round — after ~20 rounds the BigInteger holds MILLIONS of digits
    and Catalyst's ``SizeInBytesOnlyStatsPlanVisitor`` (join-strategy
    selection + AQE ``reOptimize``) spends minutes in Toom-Cook
    BigInteger multiplication ON THE DRIVER while all executors idle.
    Measured on this box: speculative-coloring round 20 with 76 live
    rows took 47.6 s, >99%% of it one spinning driver thread; with the
    reset the same round is sub-second.

    The reset rebuilds the frame as a FRESH ``LogicalRDD`` over the
    checkpointed InternalRow RDD (``internalCreateDataFrame`` — the
    same JVM constructor PySpark itself uses), which carries no
    origin stats, so every round restarts from the default sizing.
    Zero data movement; laziness of ``eager=False`` is preserved
    (``toRdd`` is lazy). Side effect: these frames are never chosen
    for auto-broadcast (their default size estimate is large) — the
    correct bias for loop state, which is the big side by
    construction."""
    ck = df.localCheckpoint(eager=eager)
    spark = ck.sparkSession
    jdf = ck._jdf
    fresh = spark._jsparkSession.internalCreateDataFrame(
        jdf.queryExecution().toRdd(), jdf.schema(), False
    )
    return DataFrame(fresh, spark)


def partition_lineage(df: DataFrame, value_col: str | None = None) -> list[dict]:
    """Per-partition row counts + content checksum, one extra job.

    Checksum = sum of xxhash64 over all columns — order-insensitive,
    so it is stable across task retries and resumes.
    """
    cols = [F.col(c) for c in df.columns]
    agg = df.groupBy(F.spark_partition_id().alias("pid")).agg(
        F.count(F.lit(1)).alias("rows"),
        # decimal accumulator: sum of 64-bit hashes overflows long under ANSI
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).cast("string").alias("checksum"),
    )
    return [r.asDict() for r in agg.orderBy("pid").collect()]


class SuperstepLoop:
    """Manages one iterative frontier DataFrame across supersteps."""

    def __init__(
        self,
        spark: SparkSession,
        name: str,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 5,
        lineage: bool = False,
        storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    ):
        self.spark = spark
        self.name = name
        self.dir = checkpoint_dir
        self.every = max(1, checkpoint_every)
        self.lineage = lineage
        self.level = storage_level
        self.iteration = 0
        self._current: DataFrame | None = None
        self._pending: list[DataFrame] = []
        if self.dir:
            os.makedirs(self.dir, exist_ok=True)

    # -- ledger --------------------------------------------------------
    @property
    def ledger_path(self) -> str:
        return os.path.join(self.dir, f"{self.name}.ledger.jsonl")

    def _log(self, record: dict) -> None:
        if not self.dir:
            return
        with open(self.ledger_path, "a") as f:
            f.write(json.dumps(record, sort_keys=True) + "\n")

    def _snap_path(self, iteration: int) -> str:
        return os.path.join(self.dir, f"{self.name}.superstep={iteration:05d}")

    # -- lifecycle -------------------------------------------------------
    def start(self, frontier: DataFrame) -> DataFrame:
        self._current = frontier.persist(self.level)
        return self._current

    def advance(
        self, new_frontier: DataFrame, metrics_fn=None, defer: bool = False
    ) -> tuple[DataFrame, dict]:
        """Install the next superstep's frontier.

        Truncates lineage (Parquet snapshot on checkpoint boundaries,
        ``localCheckpoint`` otherwise), evaluates ``metrics_fn(prev,
        new)`` — the per-superstep convergence action(s) — THEN
        unpersists the previous frontier. Returns (frontier, metrics).

        ``defer=True`` (fixed-iteration mode only): NO action, NO
        lineage truncation — the superstep is composed lazily and the
        whole chain executes as ONE multi-stage job at the next
        non-deferred advance. This removes the per-superstep driver
        round-trip + cache write (the dominant fixed cost at high
        parallelism). ONLY valid when the frontier is referenced once
        per superstep (a second reference would double the deferred
        subtree per iteration → exponential plan growth); convergence
        mode can never defer because the L1 metric is a per-step
        action by definition.
        """
        self.iteration += 1
        prev = self._current
        if defer:
            if prev is not None:
                self._pending.append(prev)
            self._current = new_frontier
            return self._current, {}
        t0 = time.monotonic()
        checkpointed = False
        if self.dir and self.iteration % self.every == 0:
            path = self._snap_path(self.iteration)
            new_frontier.write.mode("overwrite").parquet(path)
            new_frontier = self.spark.read.parquet(path).persist(self.level)
            checkpointed = True
        else:
            # localCheckpoint persists the RDD; eager=False defers
            # materialization to the metrics action below. The stats
            # reset stops sizeInBytes self-multiplication across
            # supersteps (see stable_checkpoint — CC's pointer-jump
            # references the state twice per round).
            new_frontier = stable_checkpoint(new_frontier, eager=False)
        self._current = new_frontier
        metrics = dict(metrics_fn(prev, new_frontier)) if metrics_fn else {}
        rec = {
            "algo": self.name,
            "iteration": self.iteration,
            "checkpointed": checkpointed,
            **metrics,
        }
        if checkpointed and self.lineage:
            rec["partitions"] = partition_lineage(self._current)
        rec["wall_s"] = round(time.monotonic() - t0, 4)
        self._log(rec)
        if prev is not None:
            prev.unpersist()
        for p in self._pending:
            p.unpersist()
        self._pending.clear()
        return self._current, metrics

    def stop(self) -> None:
        if self._current is not None:
            self._current.unpersist()

    # -- resume ----------------------------------------------------------
    @classmethod
    def resume(
        cls, spark: SparkSession, name: str, checkpoint_dir: str, **kwargs
    ) -> tuple["SuperstepLoop", DataFrame | None]:
        """Reload the latest valid snapshot + iteration counter.

        Returns (loop, frontier) — frontier None if no snapshot exists.
        """
        loop = cls(spark, name, checkpoint_dir=checkpoint_dir, **kwargs)
        snaps = sorted(
            d
            for d in os.listdir(checkpoint_dir)
            if d.startswith(f"{name}.superstep=")
            and os.path.exists(os.path.join(checkpoint_dir, d, "_SUCCESS"))
        )
        if not snaps:
            return loop, None
        last = snaps[-1]
        loop.iteration = int(last.rsplit("=", 1)[1])
        frontier = spark.read.parquet(os.path.join(checkpoint_dir, last))
        loop._current = frontier.persist(loop.level)
        return loop, frontier
