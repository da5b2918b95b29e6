"""Sink layer: routed fan-out writes with idempotent replay (S5-S7, X7).

The reference bulk-indexes into monthly ES indices with ``_id=message-id``
so re-runs upsert (es.clj:99-104) — at-least-once processing with an
idempotent sink. The Spark equivalent here:

* ONE dataset, Hive-partitioned by ``(sink, month, dt)``:
  - ``sink``  — routing target (the ES index-family analog),
  - ``month`` — the ``titan-YYYY.MM`` suffix (es.clj:104),
  - ``dt``    — the INPUT partition key (source day), which is what makes
    replay idempotent: with ``partitionOverwriteMode=dynamic``, re-running
    day X atomically replaces exactly day X's output directories in every
    sink, never touching other days. This is the Parquet stand-in for
    Iceberg's ``overwritePartitions()``; with Iceberg jars present, the
    writer swaps to ``writeTo(tbl).overwritePartitions()`` — same call
    shape, snapshot-atomic.
* within-batch ``dropDuplicates(message_id)`` per (sink,dt) — the ``_id``
  collapse (es.clj:102-103).

Scale: a single pass over the input — N sinks never cause N scans. The
write shuffles once on the partition columns (``repartition``) so each
output dir is written by one task (no small-file explosion at 1000
executors: file count = #(sink,month,dt) combos, not #combos x #tasks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

PARTITION_COLS = ["sink", "month", "dt"]


def write_fanout(
    routed: DataFrame,
    path: str,
    dedup_key: str = "message_id",
    dedup_buckets: int = 8,
) -> None:
    """Single-pass, single-shuffle fan-out write of routed rows (must carry
    sink/month/dt).

    Dedup scope is **(sink, month)** — the reference's monthly-index
    ``_id``-upsert scope (es.clj:102-104): a duplicate id arriving under a
    different ingest day of the same month is collapsed, latest ``dt`` wins
    (upsert = last write wins). Scope is within the batch; collapsing a
    duplicate against a *previously committed* day would be a read-merge
    (Iceberg ``MERGE INTO``) — documented environment debt.

    Shuffle shape: one exchange on (sink, month, bucket) where ``bucket``
    salts ``dedup_key`` into ``dedup_buckets`` slices. Same key -> same
    bucket, so a window over exactly those keys dedups with no second
    shuffle, while parallelism stays #(sink,month) x buckets (a plain
    (sink, month) window would sort a whole month in one task) and file
    count stays bounded at #(sink,month,dt) x buckets — not #combos x
    #tasks (no small-file explosion at 1000 executors).
    Null-key rows (parse failures -> quarantine) are all kept, salted by
    url so a month's quarantine doesn't pile into one task."""
    bucket = F.pmod(
        F.xxhash64(F.coalesce(F.col(dedup_key), F.col("url"))), F.lit(dedup_buckets)
    )
    w = Window.partitionBy("sink", "month", "__b").orderBy(
        F.col(dedup_key).asc_nulls_first(), F.col("dt").desc()
    )
    cleaned = (
        routed.withColumn("__b", bucket)
        .repartition(F.col("sink"), F.col("month"), F.col("__b"))
        .withColumn("__prev", F.lag(dedup_key).over(w))
        .where(
            F.col(dedup_key).isNull()
            | F.col("__prev").isNull()
            | (F.col("__prev") != F.col(dedup_key))
        )
        .drop("__prev", "__b")
    )
    (
        cleaned.write.mode("overwrite")
        .partitionBy(*PARTITION_COLS)
        .parquet(path)
    )


def read_sink(spark: SparkSession, path: str, sink: str | None = None) -> DataFrame:
    """Read back routed output; `sink` filter prunes partitions at the scan."""
    df = spark.read.parquet(path)
    return df.where(F.col("sink") == sink) if sink else df


def to_ndjson(routed: DataFrame, drop: tuple[str, ...] = ("month",)) -> DataFrame:
    """Bulk-payload serialization (S7/F10, es.clj:106-117): one JSON line
    per document, routing-internal columns dropped pre-serialization the way
    the reference dissoc's ``:date`` (es.clj:113). Native ``to_json`` over a
    struct — codegen'd, no Python. Write with ``.write.text(path)`` to get
    NDJSON files for an external bulk indexer."""
    cols = [c for c in routed.columns if c not in drop]
    return routed.select(
        F.to_json(F.struct(*[F.col(c) for c in cols]), {"ignoreNullFields": "true"}).alias("json")
    )
