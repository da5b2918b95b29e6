"""Timestamp normalization — the reference's ``clean-ts`` rule (F5).

Reference semantics (parsers.clj:24-32): request logs stamp **PST wall-clock
time with a bogus trailing Z**; response logs stamp true UTC without a Z.
So a raw ts ending in "Z" must be *reinterpreted* as America/Los_Angeles
wall time and converted to UTC; a raw ts without "Z" passes through.
E.g. ``2015-11-11T16:16:02Z`` -> ``2015-11-12T00:16:02`` UTC (PST is UTC-8
after the Nov 1 2015 DST fall-back; before it, UTC-7 — region tz, not a
fixed offset, which is why ``to_utc_timestamp`` with the zone *name* is
required; see SURVEY §7 risks).

The secondary parse gate (utils.clj:44-46): missing/unparseable timestamp
throws "Incorrect date: %s" and the record is quarantined — here that is a
null ``ts`` with an error string, decided in parse.py, never a task failure.
"""

from __future__ import annotations

from datetime import datetime
from zoneinfo import ZoneInfo

from pyspark.sql import Column
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd'T'HH:mm:ss"
_LA = ZoneInfo("America/Los_Angeles")
_UTC = ZoneInfo("UTC")


def clean_ts_col(ts_raw: Column) -> Column:
    """Native clean-ts: null when unparseable (quarantine signal).

    ``try_to_timestamp`` keeps a bad string from failing the task —
    the per-record error containment the reference does with try/catch
    (utils.clj:60-65) is a null + error column here.
    """
    stripped = F.regexp_replace(ts_raw, "Z$", "")
    parsed = F.try_to_timestamp(stripped, F.lit(TS_FMT))
    return F.when(
        ts_raw.endswith("Z"),
        F.to_utc_timestamp(parsed, "America/Los_Angeles"),
    ).otherwise(parsed)


def clean_ts_py(ts_raw: str | None) -> datetime | None:
    """Python twin for the mapInPandas parity path and goldens."""
    if not ts_raw:
        return None
    s = ts_raw[:-1] if ts_raw.endswith("Z") else ts_raw
    try:
        naive = datetime.strptime(s, "%Y-%m-%dT%H:%M:%S")
    except ValueError:
        return None
    if ts_raw.endswith("Z"):
        return naive.replace(tzinfo=_LA).astimezone(_UTC).replace(tzinfo=None)
    return naive
