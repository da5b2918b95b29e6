"""Temporal join operators Spark lacks as built-ins: as-of join and
range (interval) join, both expressed as compositions of shuffle-friendly
DataFrame primitives — never an inequality-only join, which Spark can only
execute as BroadcastNestedLoop (O(n*m) compare, the classic scale-killer).

* ``asof_join``  — for each left row, the latest right row with
  ``right.ts <= left.ts`` per key. Implemented as the union-and-window
  pattern: tag sides, sort each key's rows by (ts, side), carry the last
  non-null right attributes forward with an ``ignorenulls`` window. ONE
  shuffle on the key (the window's), zero joins, no candidate explosion —
  the same shape a 100 TB point-in-time-correct feature join runs.
  The reference has no temporal joins (its pipeline is stateless per
  record, parsers.clj); this is engine surface the brief names explicitly.

* ``range_join_binned`` — events ⋈ intervals where
  ``start <= ts <= end``, via time-binning: each interval explodes into
  the fixed-width bins it covers, events map to exactly one bin, and the
  pair space collapses to an EQUI-join on (key, bin) followed by the
  exact ``between`` filter. Bin width should be chosen ~ median interval
  length: candidate blow-up is ceil(len/bin)+1 rows per interval, and the
  equi-join shuffles/AQE-balances like any other join. An event lands in
  one bin only, so no pair dedup pass is needed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the ``right_cols`` of the
    latest ``right`` row with ``right_ts <= left_ts`` for the same key
    (NULLs when no prior right row exists). Equal timestamps match, like
    DuckDB/kdb ``ASOF JOIN`` with a ``>=`` condition.

    DETERMINISM contract: ``right`` must be unique per (key, right_ts) —
    pre-aggregate it otherwise (the matched row at a tied timestamp is
    undefined in every engine's as-of semantics; make the tie-break
    explicit upstream instead of inheriting one).

    Scale shape: union of the two relations (map-side, no shuffle), one
    window over (key) ordered by (ts, side) — a single hash-partition
    exchange on the key; per-row state is the last-seen right attributes,
    O(1). Compare with the naive ``left.join(right, ts >= ts)`` +
    groupBy-max: that is a nested-loop candidate product. Skewed keys
    behave like any skewed window: pre-split hot keys upstream if needed.
    """
    keys = [key] if isinstance(key, str) else list(key)
    # right_ts is always carried as f"{right_ts}{suffix}"; listing it in
    # right_cols too would build a duplicate output column and fail at
    # unionByName with an ambiguous-reference error
    rc = [c for c in right_cols if c not in keys and c != right_ts]
    # ALL right attributes travel as ONE struct: the struct is non-null
    # whenever a right row exists, even if every field in it is NULL, so
    # last(ignorenulls) carries the latest right ROW atomically. Carrying
    # columns separately would mix attributes from different right rows
    # whenever the latest row has a NULL field (ignorenulls would reach
    # past it to an older row's value for that one column).
    r_struct = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c).alias(c) for c in rc]
    )
    # side 0 sorts before side 1 at equal ts -> a right row at exactly
    # left_ts is visible to that left row (inclusive as-of)
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        r_struct.alias("__r"),
    )
    l_cols = left.columns
    l = left.select(
        *[F.col(c) for c in l_cols],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
    )
    # align schemas: right side lacks left-only columns
    for c in l_cols:
        if c not in keys:
            r = r.withColumn(c, F.lit(None).cast(l.schema[c].dataType))
    unioned = l.unionByName(r.select(*l.columns))
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = unioned.select(
        *l_cols,
        F.col("__side"),
        F.last("__r", ignorenulls=True).over(w).alias("__r"),
    )
    return (
        out.where(F.col("__side") == 1)
        .select(
            *l_cols,
            F.col("__r.__rts").alias(f"{right_ts}{suffix}"),
            *[F.col(f"__r.{c}").alias(f"{c}{suffix}") for c in rc],
        )
    )


def range_join_binned(
    events: DataFrame,
    intervals: DataFrame,
    key: str,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bin_seconds: int = 600,
    how: str = "inner",
) -> DataFrame:
    """Equi-join reformulation of ``events ⋈ intervals ON key AND
    start <= ts <= end`` (inclusive bounds). Returns event rows joined
    with their matching interval's columns; an event inside k overlapping
    intervals yields k rows (standard range-join semantics).

    Each interval emits one row per ``bin_seconds`` bin it covers; events
    hash to exactly one bin. The join is then a plain equi-join on
    (key, bin) — broadcastable when intervals are small, sort-merge +
    AQE otherwise — followed by the exact between filter. No pair can
    appear twice (the event's single bin meets each covering interval
    once), so there is no dedup pass.
    """
    if how.replace("_", "").lower() not in ("inner", "left", "leftouter"):
        # right/full outer would emit one NULL-extended row PER EXPLODED
        # BIN for an unmatched interval (and its key vanishes with the
        # renamed join column) — support them only with an interval-side
        # design, not silently wrong output
        raise ValueError(
            f"range_join_binned supports how='inner'|'left', got {how!r}"
        )
    bin_e = (F.unix_timestamp(F.col(ts_col)) / bin_seconds).cast("long")
    ev = events.withColumn("__bin", bin_e)
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col)) / bin_seconds).cast("long"),
                (F.unix_timestamp(F.col(end_col)) / bin_seconds).cast("long"),
            )
        ),
    ).withColumnsRenamed({key: "__rkey", "__bin": "__rbin"})
    # the exact between-predicate lives IN the join condition, not a
    # post-join filter: a filter after an outer join silently re-imposes
    # inner semantics (unmatched rows fail ts BETWEEN NULL AND NULL).
    # Catalyst still extracts the two equalities as equi-join keys.
    cond = (
        (ev[key] == iv["__rkey"])
        & (ev["__bin"] == iv["__rbin"])
        & F.col(ts_col).between(F.col(start_col), F.col(end_col))
    )
    return ev.join(iv, on=cond, how=how).drop("__bin", "__rkey", "__rbin")
