"""Skew-aware aggregation (SURVEY §2e + north_rule salted groupBy).

The reference only counts (processing.clj:74,82). The north_rule requires
per-sink groupBy aggregates that survive **Zipfian key skew** (hosts,
languages): a single hot key would pin one reducer and destroy the 0.8
scaling-efficiency target at 4N executors.

``salted_agg`` implements the classic two-phase pattern:

    phase 1: groupBy(key, salt)  — salt = pmod(xxhash64(unique col), S)
             partial aggregates spread the hot key over S reducers
    phase 2: groupBy(key)        — merge the S partials

For algebraic aggregates (count/sum/min/max) Spark's hash aggregate already
does map-side partial combine, which handles *map-side* skew; the salt
matters when the merge itself is heavy (collect_* / distinct-like state) or
when AQE is off. We expose both and default the pipeline to salted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, phase1 expr over rows, phase2 expr over partials)
_ALGEBRAIC = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_col: str | Column | None = None,
    salt_buckets: int = 64,
) -> DataFrame:
    """Two-phase skew-safe aggregate.

    ``aggs``: output_name -> (fn, input_col) with fn in count/sum/min/max
    (avg is derived: request sum+count and divide downstream).
    ``salt_col``: any high-cardinality column (defaults to a hash of all
    non-key columns is too wide — pass e.g. the row id/url). Buckets sized
    ~2x max parallelism by the caller at cluster scale.
    """
    salt_src = F.col(salt_col) if isinstance(salt_col, str) else salt_col
    if salt_src is None:
        salt_src = F.monotonically_increasing_id()
    salt = F.pmod(F.xxhash64(salt_src), F.lit(salt_buckets)).alias("__salt")

    phase1 = df.groupBy(*keys, salt).agg(
        *[
            _ALGEBRAIC[fn][0](F.col(col) if col else None).alias(f"__p_{name}")
            for name, (fn, col) in aggs.items()
        ]
    )
    phase2 = phase1.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[fn][1](F.col(f"__p_{name}")).alias(name)
            for name, (fn, col) in aggs.items()
        ]
    )
    return phase2


def sink_aggregates(routed: DataFrame) -> DataFrame:
    """Per-(sink, month) counts + distinct-ish stats — the correctness gate
    'per-sink aggregate counts' (BASELINE.json north_rule). Salted on
    message_id because sink distribution is Zipfian by construction."""
    return salted_agg(
        routed,
        keys=["sink", "month"],
        aggs={"doc_count": ("count", None), "min_ts": ("min", "ts"), "max_ts": ("max", "ts")},
        salt_col="message_id",
    ).orderBy("sink", "month")
