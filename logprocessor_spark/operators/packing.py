"""Sequence packing for training-data assembly: assign every document a
(bucket, sequence bin, offset) under GPT-style contiguous packing — docs
are concatenated in order and split at fixed token boundaries (a doc may
straddle two bins; the trainer's loader masks across the seam).

Why bucketed: a single global running-token-count is one window over one
partition — a non-starter at corpus scale. Sharding docs into ``buckets``
independent streams (``doc_id % buckets`` — deterministic, no RNG to
ship) makes the cumulative window per-bucket: ``buckets`` parallel
windows, each a single ordered partition of corpus_size/buckets docs.
Set buckets ≈ a few × total cores; packing quality is unaffected (only
the final partially-filled bin per bucket is waste, bounded by
buckets × seq_len tokens over the whole corpus).

The assignment is pure window arithmetic (sum over rows preceding), so
the DuckDB oracle expresses it verbatim — deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    df: DataFrame,
    token_count_col: Column,
    id_col: str = "doc_id",
    seq_len: int = 2048,
    buckets: int = 32,
) -> DataFrame:
    """(id_col, bucket, n_tokens, seq_bin, bin_offset): doc ``id`` starts
    at token offset ``bin_offset`` of sequence ``seq_bin`` in its bucket's
    stream. ``token_count_col`` is any integer token-count expression
    (whitespace, BPE-ish regex, ...)."""
    t = df.select(
        F.col(id_col),
        (F.col(id_col) % buckets).cast("int").alias("bucket"),
        token_count_col.cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    return t.select(
        id_col,
        "bucket",
        "n_tokens",
        F.floor(cum_before / seq_len).cast("long").alias("seq_bin"),
        (cum_before % seq_len).cast("long").alias("bin_offset"),
    )
