"""Text analysis for web-corpus pipelines: tokenization, quality
scoring, language-ID, fingerprinting, minhash shingling.

Not present in the reference (networkx has no text surface) — mandated
by the web-corpus domain: these run on the ``pages.text`` /
``documents.text`` columns at corpus scale, so everything here is
built-in JVM column expressions (whole-stage codegen, zero Python in
the hot path).  Each helper returns Columns/DataFrames so callers
compose them into one scan.

Determinism contract: every function here has a line-for-line ANSI-SQL
equivalent (used by the DuckDB oracle in ``__spark_entry__``), so
results are exact-matchable cross-engine: hashing uses md5 (identical
hex in Spark/DuckDB), never engine-private hash functions. The scale
path may swap md5 → xxhash64 (cheaper, JVM-side) without changing
shapes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# languages scored by the n-gram/stopword heuristic, with their most
# frequent function words; deterministic tie-break = language name asc
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "de", "que", "los"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokens of trimmed text; [] for empty/blank."""
    return F.when(
        F.length(F.trim(text)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(text), r"\s+"))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def char_class_count(text: Column, pattern: str) -> Column:
    """#chars NOT removed by stripping ``pattern``-complement —
    i.e. how many chars match the class."""
    return F.length(text) - F.length(F.regexp_replace(text, pattern, ""))


def quality_features(text: Column) -> dict[str, Column]:
    """Length / alpha-ratio / digit-ratio / mean-token-length features
    for corpus quality filtering. Ratios are 0.0 on empty text."""
    n = F.length(text)
    nz = F.greatest(n, F.lit(1))
    alpha = char_class_count(text, "[a-zA-Z]")
    digit = char_class_count(text, "[0-9]")
    space = char_class_count(text, r"\s")
    ntok = token_count(text)
    return {
        "n_chars": n.cast("long"),
        "n_tokens": ntok.cast("long"),
        "alpha_ratio": (alpha / nz).cast("double"),
        "digit_ratio": (digit / nz).cast("double"),
        "space_ratio": (space / nz).cast("double"),
        "mean_token_len": ((n - space) / F.greatest(ntok, F.lit(1))).cast("double"),
    }


def stopword_hits(text: Column, word: str) -> Column:
    """Occurrences of `` word `` (space-delimited) in lowercased text,
    counted by the length-difference trick — identical semantics in
    any SQL dialect."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def lang_scores(text: Column) -> dict[str, Column]:
    return {
        lang: sum(stopword_hits(text, w) for w in words)
        for lang, words in STOPWORDS.items()
    }


def lang_id(text: Column) -> Column:
    """Predicted language: argmax stopword score, ties → lexicographic
    language code, 'und' when all scores are zero.

    Shape matters here: an explicit WHEN-fold duplicates the running
    ``best`` struct (score expressions and all) on BOTH branches of
    every step, so the expression tree doubles per language and janino
    refuses the >64KB generated method — Spark then drops the whole
    stage to interpreted eval (observed on the doc_training_mix plan).
    ``array_max`` over one struct per language keeps every score
    expression exactly once; struct ordering on (score, pref) gives
    max score with ties → highest ``pref`` = lexicographically first
    language, identical semantics to the fold."""
    scores = lang_scores(text)
    langs = sorted(scores)
    entries = [
        F.struct(
            scores[lang].alias("score"),
            F.lit(len(langs) - i).alias("pref"),
            F.lit(lang).alias("lang"),
        )
        for i, lang in enumerate(langs)
    ]
    best = F.array_max(F.array(*entries))
    return F.when(best["score"] <= 0, F.lit("und")).otherwise(best["lang"])


def fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted
    distinct token set — the classic 'fingerprint clustering' key for
    near-identical docs that differ only in token order/duplication."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(text))), " "))


ROLLING_MOD = 2147483647  # 2^31 - 1: keeps acc*31 + tok < 2^63 exact
ROLLING_MULT = 31


def rolling_fingerprint(text: Column) -> Column:
    """Order-SENSITIVE Karp–Rabin fingerprint: a polynomial rolling
    hash folded left-to-right over the token stream —
    h = ((h * 31) + hash(tok)) mod (2^31 - 1), token hash = the first
    8 hex digits of md5. Complements :func:`fingerprint` (order-
    insensitive): two docs with the same words in a different order
    collide there but not here. Pure column arithmetic, one scan."""
    tok_hashes = F.transform(
        tokens(text),
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
    )
    return F.aggregate(
        tok_hashes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * ROLLING_MULT + x) % ROLLING_MOD,
    )


# BPE-ish pre-tokenization: letter runs, single digits, single
# punctuation marks — the GPT-2-style split shape without a merges
# table (the merge table is a model artifact; counting pre-tokens is
# the corpus-side statistic)
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokens (letter runs / digits / punct)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings; [] when fewer than n tokens."""
    t = tokens(text)
    return F.when(F.size(t) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.array_join(F.slice(t, i + 1, n), " "),
        )
    )


def minhash_signature(
    text: Column,
    num_hashes: int = 8,
    shingle_n: int = 3,
    hasher: str = "md5",
) -> Column:
    """Array of ``num_hashes`` min-hash values over the shingle set.

    Seed s is mixed in by prefixing the shingle. ``hasher="md5"`` is
    the ORACLE lane — md5 is identical across engines, so signatures
    are oracle-exact. ``hasher="xxhash64"`` is the SCALE lane: one
    64-bit JVM-intrinsic hash per (seed, shingle) and BIGINT mins
    instead of 32-hex-char string mins — severalfold cheaper per
    token, same banding statistics (any uniform hash family works for
    MinHash); not expressible in the DuckDB oracle, hence bench-only.
    Empty shingle set → array of nulls (doc too short to minhash)."""
    sh = shingles(text, shingle_n)

    # NB: factory, not default-arg lambda — a 2-param lambda would make
    # F.transform pass (element, index) and clobber the seed
    def _minhash(seed: int) -> Column:
        prefix = f"{seed}|"
        if hasher == "xxhash64":
            return F.array_min(
                F.transform(sh, lambda x: F.xxhash64(F.concat(F.lit(prefix), x)))
            )
        return F.array_min(
            F.transform(sh, lambda x: F.md5(F.concat(F.lit(prefix), x)))
        )

    return F.array(*[_minhash(s) for s in range(num_hashes)])


def minhash_bands(
    text: Column,
    num_bands: int = 4,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    hasher: str = "md5",
) -> Column:
    """LSH band keys: array of num_bands structs (band, key) where
    key hashes the band's concatenated minhash rows. Docs sharing any
    band key are near-duplicate candidates. ``hasher`` selects the
    md5 oracle lane (string keys) or the xxhash64 scale lane (BIGINT
    keys — cheaper to shuffle and compare)."""
    sig = minhash_signature(text, num_bands * rows_per_band, shingle_n, hasher)
    if hasher == "xxhash64":
        return F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(
                        *[sig[b * rows_per_band + r] for r in range(rows_per_band)]
                    ).alias("key"),
                )
                for b in range(num_bands)
            ]
        )
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|", *[sig[b * rows_per_band + r] for r in range(rows_per_band)]
                    )
                ).alias("key"),
            )
            for b in range(num_bands)
        ]
    )


def simhash64(text: Column) -> Column:
    """64-bit SimHash over whitespace tokens, md5-derived bit planes.

    Each token contributes +1/−1 per bit position; bit b of the token
    hash comes from hex digit b//4 of md5(token) (4 bits per digit,
    engine-portable via instr over the hex alphabet). Returns BIGINT
    whose bit b is set iff the summed contribution is positive."""
    toks = tokens(text)

    def _votes(b: int) -> Column:
        # factory (not default-arg lambdas): F.aggregate's merge lambda
        # must stay exactly 2-ary or PySpark reinterprets the signature
        d, shift = divmod(b, 4)

        def bit(x: Column) -> Column:
            digit = F.instr(
                F.lit("0123456789abcdef"), F.substring(F.md5(x), d + 1, 1)
            ) - 1
            return F.shiftright(digit, shift) % 2

        return F.aggregate(
            toks, F.lit(0), lambda a, x: a + F.when(bit(x) == 1, 1).otherwise(-1)
        )

    acc = F.lit(0).cast("long")
    for b in range(64):
        acc = acc + F.when(
            _votes(b) > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    return acc


def simhash_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    out_col: str = "simhash",
) -> DataFrame:
    """(id, simhash BIGINT) — identical bits to :func:`simhash64`, but
    each token is md5-hashed ONCE (vs once per bit in the Column form):
    explode tokens → one md5 per token → a single groupBy with 64
    bit-vote sums (map-side partial agg, one shuffle on ``id_col``).
    This is the corpus-scale path; ``simhash64`` remains for
    single-expression composition. Docs with no tokens get simhash 0
    (all vote sums are 0, no bit set) — same as the Column form."""
    tk = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_tok")
    )
    hx = tk.select(id_col, F.md5(F.col("_tok")).alias("_hx"))
    votes = []
    for b in range(64):
        d, shift = divmod(b, 4)
        digit = F.instr(
            F.lit("0123456789abcdef"), F.substring(F.col("_hx"), d + 1, 1)
        ) - 1
        bit = F.shiftright(digit, shift) % 2
        votes.append(F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"_v{b}"))
    agg = hx.groupBy(id_col).agg(*votes)
    acc = F.lit(0).cast("long")
    for b in range(64):
        acc = acc + F.when(
            F.col(f"_v{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    sh = agg.select(F.col(id_col), acc.alias(out_col))
    return (
        df.select(id_col)
        .join(sh, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col(out_col), F.lit(0).cast("long")).alias(out_col),
        )
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit simhashes (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-scan per-document feature table."""
    feats = quality_features(F.col(text_col))
    return df.select(
        F.col(id_col),
        *[c.alias(k) for k, c in feats.items()],
        lang_id(F.col(text_col)).alias("pred_lang"),
        fingerprint(F.col(text_col)).alias("fingerprint"),
    )


def repetition_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, dup_token_frac, adjacent_dup_frac, top_bigram_share) —
    the Gopher-style repetition quality signals (Rae et al. 2021 §A1.3
    repetition filters, adapted to unstructured token streams):

      dup_token_frac    = 1 - |distinct tokens| / |tokens|
      adjacent_dup_frac = fraction of consecutive equal token pairs
      top_bigram_share  = occurrences of the most frequent bigram /
                          total bigrams

    The first two are pure array expressions (one scan, codegen); the
    bigram share is one explode + two-level aggregate keyed by
    (doc, bigram) — high-entropy keys, skew-free shuffle. Short docs
    (< 2 tokens) report 0 for the pairwise signals.
    """
    t = tokens(F.col(text_col))
    n = F.size(t)
    base = df.select(
        F.col(id_col).alias("id"),
        F.when(n > 0, 1.0 - F.size(F.array_distinct(t)) / n)
        .otherwise(0.0)
        .alias("dup_token_frac"),
        F.when(
            n > 1,
            F.aggregate(
                F.zip_with(
                    F.slice(t, 1, F.greatest(n - 1, F.lit(0))),
                    F.slice(t, 2, F.greatest(n - 1, F.lit(0))),
                    lambda a, b: (a == b).cast("int"),
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            )
            / (n - 1),
        )
        .otherwise(0.0)
        .alias("adjacent_dup_frac"),
        shingles(F.col(text_col), 2).alias("_bgs"),
    )
    bg = (
        base.select("id", F.explode("_bgs").alias("bg"))
        .groupBy("id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg((F.max("c") / F.sum("c")).alias("top_bigram_share"))
    )
    return (
        base.drop("_bgs")
        .join(bg, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.round("dup_token_frac", 8).alias("dup_token_frac"),
            F.round("adjacent_dup_frac", 8).alias("adjacent_dup_frac"),
            F.round(F.coalesce("top_bigram_share", F.lit(0.0)), 8).alias(
                "top_bigram_share"
            ),
        )
    )
