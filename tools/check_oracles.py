"""Local stand-in for the driver's correctness gate: run every
``__spark_entry__.queries()`` entry and its DuckDB oracle side by side,
compare row count, column names, and an order-insensitive canonical value
hash. Usage::

    python tools/check_oracles.py [sf_dir] [query ...]

Scale note: a few oracles verify by brute force on purpose (independent
re-derivation beats re-implementing the operator's pruning): the
``dedup_minhash_keep`` oracle joins all document pairs and closes the
duplicate graph with a recursive CTE — O(n^2) pairs, tractable at the
driver's sf0.01 gate (~8 s), intractable at sf0.1+ (the Spark side runs
sf0.1 in ~4 s; see bench). ``dedup_ngram_pairs`` shares the shape
(all-pairs char-5-gram list intersections). Run the full sweep at
sf0.01; at larger SFs skip those two.
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon_val(v) -> str:
    """Canonicalize one cell AFTER pandas/arrow materialization (see main():
    both engines go through pandas, like the driver) — numpy scalars are
    unwrapped so e.g. DuckDB HUGEINT->float64 drift hashes differently from
    Spark's int64, exactly as it does in the driver (CORRECTNESS_r01
    events_sessionize root cause)."""
    import math

    if hasattr(v, "item"):  # numpy scalar -> python scalar
        v = v.item()
    if v is None or v != v:
        # None and NaN both hash as NULL: pandas materialization turns a
        # NULL in a float/bool column into NaN on whichever side took that
        # dtype path (observed: DuckDB null BOOLEAN -> NaN while Spark gives
        # None, yet the r1 driver hashed log_parse_fields equal — so the
        # driver treats them as one missing value, and we must too).
        return "NULL"
    if isinstance(v, float):
        return repr(v)  # shortest round-trip repr: bit-exact comparison
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def canon_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(canon_val(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from logprocessor_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        df = fn(spark, sf_dir)
        # materialize BOTH engines through pandas/arrow, like the driver —
        # fetchall() hides type drift that pandas surfaces (HUGEINT->float64)
        pdf = df.toPandas()
        cols = list(pdf.columns)
        rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(rows)} rows  [{spark_s:.1f}s]")
            continue
        odf = con.execute(oracles[name]).df()
        ocols = list(odf.columns)
        orows = [tuple(r) for r in odf.itertuples(index=False, name=None)]
        ok_cols = sorted(cols) == sorted(ocols)
        ok_count = len(rows) == len(orows)
        h1 = canon_hash(cols, rows)
        h2 = canon_hash(ocols, orows)
        ok_hash = h1 == h2
        status = "OK" if (ok_cols and ok_count and ok_hash) else "FAIL"
        print(
            f"{name:24s} {status}  rows={len(rows)}/{len(orows)} "
            f"cols={'=' if ok_cols else f'{cols} vs {ocols}'} hash={'=' if ok_hash else 'DIFF'}"
            f"  [{spark_s:.1f}s]"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_hash and ok_cols and ok_count:
                order = sorted(range(len(cols)), key=lambda i: cols[i])
                s1 = sorted("\x1f".join(canon_val(r[i]) for i in order) for r in rows)
                oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
                s2 = sorted("\x1f".join(canon_val(r[i]) for i in oorder) for r in orows)
                diffs = [(a, b) for a, b in zip(s1, s2) if a != b][:3]
                for a, b in diffs:
                    print(f"    spark: {a[:200]}")
                    print(f"    duck : {b[:200]}")
    print(f"\n{len(failures)} failures: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
