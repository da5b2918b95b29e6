"""Span-level train-set decontamination: detection AND removal.

``harness.q_decontaminate`` flags training docs sharing any 64-char window
with a benchmark holdout (broadcast semi-join on 16-byte fingerprints).
Real pipelines go one step further: excise the contaminated spans and keep
the rest of the document. ``remove_contaminated_spans`` rebuilds the text
with every flagged window's character range deleted (overlapping flagged
windows merge into one cut).

Scale shape: the span grid (window 64, stride 32 — the same grid as
``functions.textstats.rolling_fingerprints``) shuffles only (doc_id, start,
16-byte fp) rows; the benchmark fingerprint set is broadcast; the cut runs
in an Arrow-batched pandas UDF (never per-row Python) over ONLY the
flagged docs — the clean-doc common case stays entirely JVM-side and pays
no Arrow round-trip (split-and-union, because Spark evaluates Python UDFs
unconditionally even under when/otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def span_grid(text: F.Column, window: int = 64, stride: int = 32) -> F.Column:
    """(start, fp) structs for every rolling window — md5 so the DuckDB
    oracle reproduces fingerprints bit-for-bit (same grid as
    ``rolling_fingerprints``: starts 1, 1+stride, ...; short docs get one
    clamped window)."""
    n = F.length(text)
    starts = F.sequence(F.lit(1), F.greatest(n - window + 1, F.lit(1)), F.lit(stride))
    return F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start"),
            F.md5(F.encode(F.substring(text, s, window), "UTF-8")).alias("fp"),
        ),
    )


def _cut_spans_udf(window: int):
    import pandas as pd

    def _cut(text, starts):
        out = []
        for t, ss in zip(text, starts):
            if t is None:
                out.append(None)
                continue
            if ss is None or len(ss) == 0:
                out.append(t)
                continue
            keep = bytearray(b"\x01") * len(t)
            for s in ss:
                lo = int(s) - 1  # grid is 1-indexed
                hi = min(lo + window, len(t))
                for i in range(max(lo, 0), hi):
                    keep[i] = 0
            out.append("".join(c for c, k in zip(t, keep) if k))
        return pd.Series(out)

    _cut.__annotations__ = {"text": pd.Series, "starts": pd.Series, "return": pd.Series}
    return F.pandas_udf(_cut, StringType())


def remove_contaminated_spans(
    train: DataFrame,
    bench_fps: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 64,
    stride: int = 32,
) -> DataFrame:
    """Delete every ``window``-char span of ``train`` whose fingerprint
    appears in ``bench_fps`` (one column ``fp``). Returns ``train`` with
    ``text_col`` rebuilt and an ``n_spans_cut`` count. Overlapping flagged
    windows merge; unflagged docs keep their exact original string."""
    spans = train.select(
        F.col(id_col),
        F.explode(span_grid(F.col(text_col), window, stride)).alias("sp"),
    ).select(id_col, "sp.start", "sp.fp")
    flagged = (
        spans.join(F.broadcast(bench_fps.select("fp").distinct()), on="fp", how="leftsemi")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_set("start")).alias("__cut_starts"))
    )
    cut = _cut_spans_udf(window)
    # split-and-union, NOT when/otherwise: Spark extracts Python UDFs out
    # of conditionals and evaluates them for EVERY row, so a when-guard
    # would still ship 100% of document text through Arrow even when <1%
    # of docs are flagged. Filtering first keeps the clean-doc common case
    # entirely JVM-side. ``flagged`` is persisted because both branches
    # reference it (it is small by construction: contaminated docs only).
    flagged = flagged.persist()
    joined = train.join(flagged, on=id_col, how="left")
    untouched = (
        joined.where(F.col("__cut_starts").isNull())
        .withColumn("n_spans_cut", F.lit(0))
        .drop("__cut_starts")
    )
    touched = (
        joined.where(F.col("__cut_starts").isNotNull())
        .withColumn("n_spans_cut", F.size("__cut_starts"))
        .withColumn(text_col, cut(F.col(text_col), F.col("__cut_starts")))
        .drop("__cut_starts")
    )
    return untouched.unionByName(touched)
