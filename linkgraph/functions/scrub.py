"""PII redaction and corpus-LM quality scoring for webtext pipelines.

Not present in the reference (networkx has no text surface) — mandated
by the web-corpus domain. Two operators a 100 TB curation job runs
before tokenization:

* ``pii_counts`` / ``scrub_pii`` — regex redaction of emails, SSNs,
  phone numbers, and IPv4 addresses. Pure JVM ``regexp_replace`` /
  ``regexp_count`` column expressions: one scan, whole-stage codegen,
  zero Python. Patterns are restricted to the Java∩RE2 common dialect
  (character classes + bounded repetition, no lookaround or
  backreferences) so the DuckDB oracle runs the *same* pattern strings.

* ``unigram_logprob`` — corpus-self-trained unigram language-model
  score (the KenLM-filter proxy): P(tok) = corpus_count(tok)/total,
  per-doc mean of ln P. Physical plan: one explode + count groupBy
  builds the vocab, an equi-join on token scores every doc, and the
  corpus total rides the plan as a one-row broadcast (the repo's
  scalar-broadcast idiom) — no driver round-trip, no second scan of
  the documents table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textops import tokens

# Ordered: applied top-to-bottom (email first — its local part may
# contain digits/dots that the later numeric patterns would clip).
# Java-regex ∩ RE2 dialect only; [0-9] over \d for parity.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def pii_counts(text: Column) -> dict[str, Column]:
    """{kind: #non-overlapping matches} per PII pattern, counted on the
    raw text (before any redaction)."""
    return {
        kind: F.regexp_count(text, F.lit(pat)) for kind, pat, _ in PII_PATTERNS
    }


def scrub_pii(text: Column) -> Column:
    """Text with every PII match replaced by its ``<KIND>`` token,
    applied in ``PII_PATTERNS`` order (email→ssn→phone→ipv4, so the
    numeric patterns never see an already-redacted email's digits)."""
    out = text
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_scrub_table(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_email, n_ssn, n_phone, n_ipv4, scrubbed) in one scan."""
    t = F.col(text_col)
    counts = pii_counts(t)
    return docs.select(
        id_col,
        *[counts[kind].alias(f"n_{kind}") for kind, _, _ in PII_PATTERNS],
        scrub_pii(t).alias("scrubbed"),
    )


def unigram_logprob(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_tokens, avg_logprob) — mean ln P(token) under the
    corpus's own unigram distribution; docs with no tokens get NULL.
    Low scores flag gibberish / OOD pages, the standard pre-training
    quality gate shape (perplexity-filter proxy).

    Scale notes: the vocab table is a hash-partitioned count groupBy
    (map-side partial agg); the scoring join is a plain equi-join on
    the token (AQE picks broadcast when the vocab is small); the
    corpus-total scalar rides the plan as a one-row broadcast.
    """
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").cast("double").alias("_total"))
    scored = (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg(F.log(F.col("cnt") / F.col("_total"))).alias("avg_logprob"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            "avg_logprob",
        )
    )
