"""C4-style line-level quality filtering for webtext pipelines.

Not present in the reference (networkx has no text surface) — mandated
by the web-corpus domain. These are the document-cleaning rules of the
C4 dataset (Raffel et al. 2020, "Exploring the Limits of Transfer
Learning…", §2.2), applied per LINE before document-level filters:

* keep a line only if it ends in terminal punctuation (. ! ? ")
* keep a line only if it has >= ``min_line_words`` words
* drop any line containing the word "javascript"
* drop the whole document if it contains "lorem ipsum" or a curly
  brace "{" (code), or retains < ``min_sentences`` sentences

All of it is JVM column algebra over one ``split``/``filter``/
``array_join`` chain — one scan, whole-stage codegen, no Python.
Functions are restricted to the Spark∩DuckDB common surface
(``split``, ``filter``/``list_filter``, ``array_join``/
``list_aggregate``) so the oracle re-derives identical bytes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textops import token_count

# terminal punctuation per C4: period, exclamation, question, end quote
_TERMINAL = ('.', '!', '?', '"')


def _kept_lines(text: Column, min_line_words: int) -> Column:
    """ARRAY<STRING> of lines surviving the C4 line rules."""
    lines = F.split(text, "\n")
    trimmed = lambda ln: F.trim(ln)  # noqa: E731
    keeps = lambda ln: (  # noqa: E731
        F.substring(trimmed(ln), -1, 1).isin(*_TERMINAL)
        & (F.size(F.split(trimmed(ln), r"\s+")) >= min_line_words)
        & ~F.lower(ln).contains("javascript")
    )
    return F.filter(lines, lambda ln: keeps(ln))


def c4_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """(id, n_lines, n_kept_lines, n_sentences, has_lorem_ipsum,
    has_brace, c4_keep) — the per-document C4 decision with its
    component signals. ``n_sentences`` counts terminal-punctuation
    marks in the kept text (the C4 sentence proxy)."""
    text = F.col(text_col)
    kept = _kept_lines(text, min_line_words)
    kept_text = F.array_join(kept, "\n")
    n_sent = (
        F.length(kept_text)
        - F.length(F.translate(kept_text, ".!?", ""))
    ).cast("long")
    lower = F.lower(text)
    has_lorem = lower.contains("lorem ipsum")
    has_brace = text.contains("{")
    return df.select(
        F.col(id_col),
        F.size(F.split(text, "\n")).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        n_sent.alias("n_sentences"),
        has_lorem.alias("has_lorem_ipsum"),
        has_brace.alias("has_brace"),
        (
            ~has_lorem
            & ~has_brace
            & (n_sent >= min_sentences)
        ).alias("c4_keep"),
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """(id, text) — surviving documents with only their kept lines,
    re-joined by newline. Rows failing the document-level rules are
    dropped entirely (the C4 behavior)."""
    sig = c4_signals(
        df, text_col, id_col, min_line_words, min_sentences
    ).where(F.col("c4_keep"))
    kept_text = F.array_join(
        _kept_lines(F.col(text_col), min_line_words), "\n"
    ).alias("text")
    return (
        df.join(sig.select(id_col), id_col, "left_semi")
        .select(F.col(id_col), kept_text)
    )
