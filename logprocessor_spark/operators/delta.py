"""Crawl-snapshot delta: classify every URL across two crawl snapshots as
added / removed / changed / unchanged — the incremental-ingest planning
step of a continuous crawl (recrawl scheduling, changed-only reprocessing,
tombstoning vanished pages). The reference processes one partition per
task with no cross-run diffing (processing.clj:65-88); an always-on corpus
needs the delta.

Scale shape: ONE full-outer shuffle join on the key over (key, 16-byte
fingerprint) projections — document text never moves; two crawl snapshots
are both fact-sized, so this is the sort-merge regime (AQE handles skew).
Downstream consumers semi-join the "changed"/"added" keys back against the
new snapshot to reprocess only those rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def crawl_delta(
    old: DataFrame,
    new: DataFrame,
    key: str = "url",
    fp_col: str = "fp",
) -> DataFrame:
    """(key, status) for every key in either snapshot, status in
    {added, removed, changed, unchanged} by fingerprint comparison.
    Inputs must be unique per key (a crawl snapshot is)."""
    # presence markers, NOT fp-is-null: a page with NULL text has a NULL
    # fingerprint in both engines, and using fp as the absence signal
    # would misclassify it as added/removed even when the URL matched.
    # The changed-check is null-safe for the same reason.
    o = old.select(
        F.col(key), F.col(fp_col).alias("__fp_old"), F.lit(1).alias("__in_old")
    )
    n = new.select(
        F.col(key), F.col(fp_col).alias("__fp_new"), F.lit(1).alias("__in_new")
    )
    j = o.join(n, on=key, how="full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(
            ~F.col("__fp_old").eqNullSafe(F.col("__fp_new")), F.lit("changed")
        )
        .otherwise(F.lit("unchanged"))
    )
    return j.select(F.col(key), status.alias("status"))
