"""Fixed schemas for the pipeline (SURVEY.md §1).

The reference flows schema-lite heterogeneous maps (utils.clj:47-53); we pin
one superset StructType with nullable optional columns — the Spark-idiomatic
equivalent (dynamic keys would defeat columnar execution and pruning).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input table per BASELINE.json input_hint: Common-Crawl-style pages.
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# Parsed-record superset (reference doc map, utils.clj:47-53 + parsers.clj:34-43).
# errors -> ArrayType (parsers.clj:45-49); detail cols nullable (utils.clj:21-25);
# error (exception analog, utils.clj:60-65) marks quarantine rows.
PARSED_FIELDS = [
    ("url", T.StringType()),
    ("lang", T.StringType()),
    ("host", T.StringType()),
    ("session_id", T.StringType()),
    ("message_id", T.StringType()),
    ("service", T.StringType()),
    ("msg_type", T.StringType()),
    ("ts_raw", T.StringType()),
    ("ts", T.TimestampType()),
    ("refto", T.StringType()),
    ("pcc", T.StringType()),
    ("errors", T.ArrayType(T.StringType())),
    ("ind", T.BooleanType()),
    ("detail_id", T.StringType()),
    ("text", T.StringType()),
    ("error", T.StringType()),
]
PARSED_SCHEMA = T.StructType(
    [T.StructField(n, t, True) for n, t in PARSED_FIELDS]
)

# Checkpoint ledger: one row per (run, input partition) — FIXTURES.md §5.
LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_key", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("rows_in", T.LongType(), True),
        T.StructField("rows_out", T.LongType(), True),
        T.StructField("committed_at", T.TimestampType(), True),
    ]
)

# Metrics: per (run, partition, sink) lineage counters — FIXTURES.md §5,
# replacing the reference's in-memory progress atom (processing.clj:16,24-43).
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_key", T.StringType(), False),
        T.StructField("sink", T.StringType(), False),
        T.StructField("parsed", T.LongType(), True),
        T.StructField("quarantined", T.LongType(), True),
        T.StructField("routed", T.LongType(), True),
        T.StructField("wall_ms", T.LongType(), True),
    ]
)

# Enrichment dims (FIXTURES.md §3) — broadcast-join sides.
GEO_DIM_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("country", T.StringType(), True),
        T.StructField("region", T.StringType(), True),
    ]
)
AGENT_DIM_SCHEMA = T.StructType(
    [
        T.StructField("msg_type", T.StringType(), False),
        T.StructField("detail_kind", T.StringType(), True),
        T.StructField("is_request", T.BooleanType(), True),
    ]
)

# Routing rules (FIXTURES.md §4): ordered CASE/WHEN fan-out spec.
RULES_SCHEMA = T.StructType(
    [
        T.StructField("rule_id", T.IntegerType(), False),
        T.StructField("predicate_col", T.StringType(), False),
        T.StructField("predicate_val", T.StringType(), False),
        T.StructField("sink", T.StringType(), False),
    ]
)
