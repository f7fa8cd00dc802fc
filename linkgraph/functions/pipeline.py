"""End-to-end training-data curation pipeline — the composition a
100 TB webtext job actually runs: quality features + language-ID +
near-dup survivorship in ONE pass over the corpus.

Each stage is an existing operator (textops.text_stats,
dedup.near_dup_clusters); this module only composes them, so the
physical plan stays: one scan computing all quality/lang columns
JVM-side (whole-stage codegen), the banded LSH equi-join for
candidates, pointer-jumping CC for transitive clusters, and a final
left-semi join — no driver loops, no per-row Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import near_dup_clusters
from .textops import text_stats


def training_mix(
    docs: DataFrame,
    min_tokens: int = 10,
    min_alpha_ratio: float = 0.5,
    max_digit_ratio: float = 0.3,
    langs: Sequence[str] | None = ("de", "en", "es", "fr"),
    dedup_threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    **lsh_kwargs,
) -> DataFrame:
    """(doc_id, pred_lang, n_tokens, n_chars) — documents that survive
    quality gates (token count, alpha ratio, digit ratio), language
    whitelist (``langs=None`` keeps all), and near-duplicate removal
    (cluster survivor only). The kept set is what a tokenizer run
    would consume."""
    stats = text_stats(docs, text_col=text_col, id_col=id_col)
    surv = near_dup_clusters(
        docs, threshold=dedup_threshold, text_col=text_col, id_col=id_col,
        **lsh_kwargs,
    ).where(F.col("is_survivor"))
    kept = (
        stats.join(surv.select(id_col), id_col, "left_semi")
        .where(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("alpha_ratio") >= min_alpha_ratio)
            & (F.col("digit_ratio") <= max_digit_ratio)
        )
    )
    if langs is not None:
        kept = kept.where(F.col("pred_lang").isin(list(langs)))
    return kept.select(id_col, "pred_lang", "n_tokens", "n_chars")
