"""Event-stream table operators: sessionization and JSON property
extraction — the clickstream half of a webtext pipeline.

No reference analog (the reference is a graph library); these are the
standard large-scale shapes: sessionization is one shuffle on the
user key + a per-user ordered window (lag/cumsum — Spark's window
translates to a single sort within each user's partition slice), and
property extraction is JVM-side ``get_json_object`` (no Python). At
100 TB the user key is the natural partitioner; power users (bots)
are the skew hazard — AQE skew-join handles the downstream joins, and
the window itself is linear per user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _us(ts_col: str):
    """Epoch micros; NTZ timestamps are cast first (a constant session
    -tz shift, invisible to gaps/durations/grouping)."""
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Input rows + (session_seq, is_session_start): a new session
    starts at the first event of a user or after a gap >
    ``gap_seconds`` since the previous event (the standard 30-min web
    sessionization rule). session_seq numbers a user's sessions from 1
    in time order; ties on ts are broken by the full ordering below to
    keep the cumsum deterministic."""
    us = _us(ts_col)
    w = Window.partitionBy(user_col).orderBy(us)
    prev = F.lag(us).over(w)
    is_start = F.when(
        prev.isNull() | ((us - prev) > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    return events.withColumn("_start", is_start).withColumn(
        "session_seq",
        F.sum("_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).withColumn("is_session_start", F.col("_start") == 1).drop("_start")


def session_stats(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, session_seq, n_events, duration_us, n_types) — one
    row per session."""
    s = sessionize(events, gap_seconds, user_col, ts_col)
    return s.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(_us(ts_col)) - F.min(_us(ts_col))).alias("duration_us"),
        F.count_distinct("event_type").alias("n_types"),
    )


def extract_prop(events: DataFrame, key: str, col: str = "props") -> DataFrame:
    """Input rows + prop_<key> BIGINT parsed from the JSON props
    column — JVM-side ``get_json_object``, whole-stage codegen."""
    return events.withColumn(
        f"prop_{key}",
        F.get_json_object(F.col(col), f"$.{key}").cast("long"),
    )
