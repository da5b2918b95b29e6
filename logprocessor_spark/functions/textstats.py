"""Text analysis for training-data pipelines: language-ID, quality scoring,
token counting, document fingerprinting. All native Catalyst expressions
(JVM, codegen) — at 100 TB these run inside the scan stage with zero
Python. Each has a DuckDB-expressible twin registered via
``__spark_entry__.oracle_sql`` for value-level verification.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword profiles for the n-gram/stopword heuristic.
# Deliberately ASCII-representable and short: this is a cheap router, not a
# model; rows it can't score fall back to 'und' (unknown).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est", "une"],
    "es": ["el", "la", "los", "que", "es", "una", "por"],
}

BPE_ISH_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count(text: Column) -> Column:
    """Whitespace token count (size of split on runs of whitespace)."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-flavored token estimate: alpha runs + digit runs + single
    punctuation marks each count as one token (regexp_count, codegen'd)."""
    return F.regexp_count(text, F.lit(BPE_ISH_TOKEN_RE))


def stopword_hits(text: Column, lang: str) -> Column:
    """Number of stopword occurrences for one language profile."""
    pat = r"(?i)\b(" + "|".join(STOPWORDS[lang]) + r")\b"
    return F.regexp_count(text, F.lit(pat))


def lang_id(text: Column) -> Column:
    """Heuristic language-ID: argmax of per-language stopword hit rates.

    Returns 'und' when no profile scores a hit. greatest() + chained
    when() keeps it a pure expression (one pass over the text per profile;
    the regex engine is JVM-side).
    """
    scores = {lg: stopword_hits(text, lg) for lg in STOPWORDS}
    best = F.greatest(*scores.values())
    expr = F.when(best <= 0, F.lit("und"))
    for lg, sc in scores.items():  # ties break in dict order: en first
        expr = expr.when(sc == best, F.lit(lg))
    return expr


def quality_features(text: Column) -> dict[str, Column]:
    """Quality-scoring features (C4/Gopher-style cheap filters):
    length, token count, mean word length, punctuation ratio, stopword
    ratio, uppercase ratio, digit ratio."""
    n_chars = F.length(text)
    n_tokens = token_count(text)
    n_punct = F.regexp_count(text, F.lit(r"[^\w\s]"))
    n_upper = F.regexp_count(text, F.lit(r"[A-Z]"))
    n_digit = F.regexp_count(text, F.lit(r"[0-9]"))
    n_stop = stopword_hits(text, "en")
    nn = F.when(n_chars > 0, n_chars).otherwise(F.lit(1))
    nt = F.when(n_tokens > 0, n_tokens).otherwise(F.lit(1))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_word_len": (n_chars - (n_tokens - 1)) / nt,
        "punct_ratio": n_punct / nn,
        "upper_ratio": n_upper / nn,
        "digit_ratio": n_digit / nn,
        "stopword_ratio": n_stop / nt,
    }


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score: rewards stopword presence and sane
    word lengths, penalizes punctuation/digit soup. Deterministic,
    monotone in its features — a filter threshold, not a model."""
    f = quality_features(text)
    score = (
        F.lit(0.4) * F.least(f["stopword_ratio"] * 4, F.lit(1.0))
        + F.lit(0.3) * F.when((f["mean_word_len"] >= 3) & (f["mean_word_len"] <= 10), 1.0).otherwise(0.0)
        + F.lit(0.2) * (F.lit(1.0) - F.least(f["punct_ratio"] * 5, F.lit(1.0)))
        + F.lit(0.1) * (F.lit(1.0) - F.least(f["digit_ratio"] * 5, F.lit(1.0)))
    )
    return F.round(score, 4)


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the exact bytes. md5 (not xxhash64)
    because it is bit-identical across Spark and DuckDB — the oracle can
    verify fingerprints value-for-value."""
    return F.md5(F.encode(text, "UTF-8"))


def rolling_fingerprints(text: Column, window: int = 64, stride: int = 32) -> Column:
    """Rolling content-defined fingerprints: md5 of each ``window``-char
    slice every ``stride`` chars — array<string>. Built from sequence +
    transform (no UDF); used for near-dup candidate generation."""
    n = F.length(text)
    starts = F.sequence(
        F.lit(1),
        F.greatest(n - window + 1, F.lit(1)),
        F.lit(stride),
    )
    return F.transform(starts, lambda s: F.md5(F.encode(F.substring(text, s, window), "UTF-8")))
