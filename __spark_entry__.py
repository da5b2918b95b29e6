"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``logprocessor_spark/harness.py``; operator
coverage maps to SURVEY.md §2 (parse F1-F9, enrich J1-J2, route
S5-S7/F11, quarantine P2/X4, point lookup S8, search O1-O3, aggregates
A1-A4 + salted two-phase) plus the training-data operators (dedup,
similarity search, text analysis). As of round 5 every registered query
has an oracle entry (the deterministic hash-sampled IVF quantizer closed
the last rows-only gap).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from logprocessor_spark import harness


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full parse→enrich→route→aggregate pipeline over pages
    constructed from /root/testdata/sf0.001 documents."""
    return harness.flagship(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(harness.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(harness.ORACLES)
