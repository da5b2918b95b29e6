"""Repetition-based quality signals (Gopher/C4-style): the fraction of a
document accounted for by its most frequent word and most frequent word
bigram. High values flag boilerplate, keyword stuffing, and generator
loops — standard drop rules in web-corpus curation (Gopher drops docs with
top-2-gram fraction > 0.20).

Scale shape: explode words/bigrams -> count per (doc_id, gram) -> max/sum
per doc. Both aggregations are partial-aggregatable (map-side combine
collapses each partition's repeats before the shuffle), and the shuffle
key is (doc_id, 8-byte xxhash of the gram) — the gram string itself never
shuffles. Unlike an ``aggregate``-HOF mode-of-array approach this costs a
shuffle, but it parallelizes over grams WITHIN a giant document too —
single-doc skew (one 1 GB page) spreads across the cluster instead of
pinning one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import split_words, word_shingles


def _top_frac(grams: DataFrame, id_col: str, out_name: str) -> DataFrame:
    """(id, gram) -> per-id round(max(count)/sum(count), 4), 0.0 when no
    grams. Grams are xxhash64-compressed before the shuffle: counts over
    hashed grams equal counts over grams up to 2^-64 collisions.

    The rounding is EXACT integer arithmetic, not round(double, 4):
    HALF_UP of m/s at 4 decimals == (20000*m + s) div (2*s) / 1e4 for
    positive ints. round() on the double ratio differs between engines at
    representational ties (Spark rounds the shortest decimal repr, DuckDB
    rounds x*1e4 — the 2.675 -> 2.68 vs 2.67 split), which would make the
    oracle hash flaky; the integer form is bit-identical everywhere."""
    counts = (
        grams.select(F.col(id_col), F.xxhash64("gram").alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        counts.groupBy(id_col)
        .agg(F.max("c").alias("__m"), F.sum("c").alias("__s"))
        .select(
            F.col(id_col),
            (F.expr("(20000 * __m + __s) div (2 * __s)") / 10000.0).alias(out_name),
            F.col("__s").cast("bigint").alias(f"__n_{out_name}"),
        )
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc repetition metrics: (id_col, n_words, top_word_frac,
    top_bigram_frac). Docs with < 2 words have top_bigram_frac 0.0."""
    words = df.select(
        F.col(id_col), F.explode(split_words(F.col(text_col))).alias("gram")
    )
    uni = _top_frac(words, id_col, "top_word_frac")
    # word_shingles(k=2) yields DISTINCT shingles; for counting we need the
    # multiset, so build bigrams positionally from the split
    w = df.select(F.col(id_col), split_words(F.col(text_col)).alias("__w"))
    bigrams = w.where(F.size("__w") >= 2).select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("__w") - 1),
                lambda i: F.concat_ws(
                    " ",
                    F.try_element_at(F.col("__w"), i.cast("int")),
                    F.try_element_at(F.col("__w"), (i + 1).cast("int")),
                ),
            )
        ).alias("gram"),
    )
    bi = _top_frac(bigrams, id_col, "top_bigram_frac")
    return (
        uni.join(bi, on=id_col, how="left")
        .select(
            id_col,
            F.col("__n_top_word_frac").alias("n_words"),
            "top_word_frac",
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
        )
    )


# word_shingles imported for API discoverability of the distinct-shingle
# variant next to the counting variant used here
__all__ = ["repetition_stats", "split_words", "word_shingles"]
