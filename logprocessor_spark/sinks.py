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


def write_fanout(routed: DataFrame, path: str, dedup_key: str = "message_id") -> None:
    """Single-pass, single-shuffle fan-out write of routed rows (must carry
    sink/month/dt).

    Dedup is fused into the fan-out exchange: routing is deterministic in
    ``dedup_key``, so duplicate ids always land in the same (sink, month,
    dt) partition — a window over exactly the repartition keys reuses the
    exchange (Catalyst adds only a sort, no second shuffle; compare the old
    shape ``dropDuplicates`` + ``repartition`` = two full-data shuffles).
    Null-key rows (parse failures -> quarantine) are all kept.
    Cross-day replays are collapsed by dynamic partition overwrite, not by
    this dedup — the scope here is within one written partition (the
    ``_id``-upsert analog, es.clj:102-103)."""
    w = Window.partitionBy(*PARTITION_COLS).orderBy(F.col(dedup_key).asc_nulls_first())
    cleaned = (
        routed.repartition(*[F.col(c) for c in PARTITION_COLS])
        .withColumn("__prev", F.lag(dedup_key).over(w))
        .where(
            F.col(dedup_key).isNull()
            | F.col("__prev").isNull()
            | (F.col("__prev") != F.col(dedup_key))
        )
        .drop("__prev")
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
