"""Streaming sessionization via Spark's native session windows.

The streaming twin of ``functions.events.sessionize``: Structured
Streaming's ``session_window`` (dynamic-gap event-time windows) with a
watermark for state eviction — the engine-native way to sessionize an
unbounded clickstream (the batch form's lag/cumsum window needs the
whole user history; session_window keeps only open sessions in state
and emits a session when the watermark passes its close).

Scale notes: state is one row per OPEN session keyed by (user, window)
— bounded by active users × gap, not history; the watermark is the
eviction contract. Skewed users just widen one state row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    late_threshold: str = "10 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, session_start, session_end, n_events, n_types) — one
    row per closed session (append mode once the watermark passes)."""
    return (
        events.withWatermark(ts_col, late_threshold)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("event_type").alias("n_types"),
        )
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "n_types",
        )
    )
