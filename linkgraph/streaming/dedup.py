"""Custom stateful streaming operator: first-seen exact dedup.

The streaming form of ``functions.dedup.exact_dedup_groups``: as page
drops arrive, keep only the FIRST page per text hash (by url
tie-break within a micro-batch) and carry the seen-set across batches
in operator state via ``applyInPandasWithState`` — the engine's
instance of Spark's custom-stateful-operator surface (the batch
engine has no state; this is the one place per-key state must live in
the stream runtime).

Scale notes: state is one row per distinct hash (hash + first url +
count), partitioned by the groupBy key — the same md5 key space as the
batch dedup, so skew-free. A production deployment would add state
TTL via ``GroupStateTimeout.ProcessingTimeTimeout``; the operator
keeps state forever by design (a dedup seen-set never expires), so
RocksDB state store + changelog checkpointing is the documented
at-scale configuration.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "text_hash string, url string, warc_ts timestamp, n_dups_so_far long"
STATE_SCHEMA = "first_url string, n_seen long"


def _dedup_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Per text-hash group: emit the first-ever row (first batch that
    sees the hash, lowest warc_ts then url within it), update the
    running duplicate count in state."""
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values(["warc_ts", "url"], kind="mergesort")
    if state.exists:
        first_url, n_seen = state.get
        state.update((first_url, int(n_seen) + len(batch)))
        yield pd.DataFrame(
            columns=["text_hash", "url", "warc_ts", "n_dups_so_far"]
        ).astype({"n_dups_so_far": "int64"})
    else:
        head = batch.iloc[0]
        state.update((str(head["url"]), len(batch)))
        yield pd.DataFrame(
            {
                "text_hash": [key[0]],
                "url": [head["url"]],
                "warc_ts": [head["warc_ts"]],
                "n_dups_so_far": [len(batch) - 1],
            }
        )


def first_seen_dedup_stream(pages: DataFrame) -> DataFrame:
    """pages stream -> stream of first-seen pages per md5(text):
    (text_hash, url, warc_ts, n_dups_so_far). Later occurrences are
    swallowed (their count accumulates in state)."""
    hashed = pages.select(
        F.md5(F.col("text")).alias("text_hash"), "url", "warc_ts"
    )
    return hashed.groupBy("text_hash").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
