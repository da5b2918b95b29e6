"""Benchmark driver (driver contract + BASELINE.md measurement protocol).

Default mode (what the per-round driver runs): executes the headline query
suite at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` plus one end-to-end pipeline run over a
deterministic synthetic pages table, and prints ONE JSON line::

    {"metric": "e2e_suite_wall", "value": <sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": 0.1,
     "pipeline": {"docs": N, "wall_sec": s, "docs_per_sec": r}}

Other modes (BASELINE.md §"Measurement protocol"):

* ``--mode pipeline --master local[8]`` — one pipeline run, JSON to stdout
  (used as the subprocess unit of the scaling experiment).
* ``--mode scaling`` — runs the pipeline at local[8] and local[32] in
  fresh JVMs on the same input, computes scaling efficiency
  (>=0.8 required by BASELINE.json north_rule), writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
PIPELINE_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "150000"))

# headline queries: one per operator family, run at the bench sf_dir
HEADLINE = [
    "log_parse_fields",     # vectorized parse (F1-F9)
    "log_route_counts",     # route + per-sink aggregate (north_rule gate)
    "log_enrich_geo",       # broadcast enrich (J1)
    "tpch_q1",              # wide aggregate
    "join_enrich_region",   # multi-dim broadcast join
    "window_top3_orders",   # window function
    "events_hourly",        # tumbling-window agg
    "dedup_exact_keep",     # exact dedup
    "dedup_minhash_pairs",  # MinHash+LSH near-dup
    "cosine_topk",          # brute-force ANN baseline
    "ann_lsh_topk",         # LSH ANN
    "doc_search_topk",      # full-text top-k
]


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _make_input(spark, n_docs: int, workdir: str) -> str:
    from logprocessor_spark.synth import gen_pages, write_pages_partitioned

    path = os.path.join(workdir, f"pages_{n_docs}")
    if not os.path.exists(path):
        write_pages_partitioned(gen_pages(spark, n_docs, seed=42), path)
    return path


def run_pipeline_once(master: str, n_docs: int, pages_path: str, out_dir: str) -> dict:
    """One cold end-to-end run: scan -> parse -> enrich -> route -> fan-out
    write -> salted per-sink aggregates -> ledger/metrics. Returns timing."""
    from logprocessor_spark.job import run_pipeline
    from logprocessor_spark.session import get_spark

    cores = int(master[6:-1]) if master.startswith("local[") and master[6:-1].isdigit() else 32
    spark = get_spark("bench-pipeline", master=master, shuffle_partitions=max(cores, 4))
    pages_path = pages_path or _make_input(spark, n_docs, tempfile.mkdtemp(prefix="benchpages"))
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    res = run_pipeline(spark, pages_path, out_dir, run_id=f"bench-{cores}")
    wall = time.time() - t0
    return {
        "master": master,
        "docs": res.rows_in,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(res.rows_in / wall, 1),
        "quarantined": res.quarantined,
        "sinks": res.sink_counts,
    }


def mode_pipeline(args) -> None:
    out = run_pipeline_once(
        args.master, args.docs, args.pages, args.out or tempfile.mkdtemp(prefix="benchout")
    )
    print(json.dumps(out))


def mode_scaling(args) -> None:
    """BASELINE.md protocol: same input, fresh JVM per parallelism level."""
    from logprocessor_spark.session import get_spark

    workdir = args.workdir or tempfile.mkdtemp(prefix="benchscale")
    # generate input once with a throwaway session
    spark = get_spark("bench-gen", master=f"local[{DEFAULT_CPUS}]")
    pages = _make_input(spark, args.docs, workdir)
    spark.stop()

    results = {}
    for cores in (8, 32):
        cmd = [
            sys.executable, os.path.abspath(__file__),
            "--mode", "pipeline", "--master", f"local[{cores}]",
            "--docs", str(args.docs), "--pages", pages,
            "--out", os.path.join(workdir, f"out_{cores}"),
        ]
        proc = subprocess.run(cmd, capture_output=True, text=True, check=True)
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
        results[cores] = json.loads(line)
    eff = (results[32]["docs_per_sec"] / results[8]["docs_per_sec"]) / (32 / 8)
    summary = {
        "docs": args.docs,
        "throughput_8": results[8]["docs_per_sec"],
        "throughput_32": results[32]["docs_per_sec"],
        "wall_8": results[8]["wall_sec"],
        "wall_32": results[32]["wall_sec"],
        "scaling_efficiency": round(eff, 3),
        "pass_0_8": eff >= 0.8,
    }
    _write_bench_md(summary)
    print(json.dumps(summary))


def _write_bench_md(s: dict) -> None:
    os.makedirs("BENCH", exist_ok=True)
    import pyspark

    with open("BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH — measured results (protocol: /root/repo/BASELINE.md)

Environment: Spark {pyspark.__version__}, single JVM `local[N]` (sandbox
proxy for N executors; BASELINE.md §Target), AQE on, shuffle partitions =
cores, storage = Parquet fallback (Iceberg jars unavailable offline),
input = deterministic synthetic pages table (synth.gen_pages, seed=42),
fresh JVM + fresh sink dirs per run, same input path for both runs.

| metric | value |
|---|---|
| pages (docs) | {s['docs']} |
| throughput @ local[8] | {s['throughput_8']} docs/sec ({s['wall_8']} s) |
| throughput @ local[32] | {s['throughput_32']} docs/sec ({s['wall_32']} s) |
| scaling efficiency (N→4N) | {s['scaling_efficiency']} (target >= 0.8) |
| pass | {s['pass_0_8']} |

Efficiency = (throughput_32 / throughput_8) / 4, per BASELINE.md §4.
""")


def mode_suite(args) -> None:
    from logprocessor_spark import harness
    from logprocessor_spark.session import get_spark

    sf_dir = args.sf_dir
    spark = get_spark("bench", master=f"local[{args.cpus}]")
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = harness.QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    workdir = tempfile.mkdtemp(prefix="benchpipe")
    pages = _make_input(spark, args.docs, workdir)
    t0 = time.time()
    from logprocessor_spark.job import run_pipeline

    res = run_pipeline(spark, pages, os.path.join(workdir, "out"), run_id="bench")
    pipe_wall = time.time() - t0
    timings["pipeline_e2e"] = round(pipe_wall, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "e2e_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(sf_dir),
        "pipeline": {
            "docs": res.rows_in,
            "wall_sec": round(pipe_wall, 2),
            "docs_per_sec": round(res.rows_in / pipe_wall, 1),
        },
        "cpus": int(args.cpus),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["suite", "pipeline", "scaling"], default="suite")
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--cpus", default=DEFAULT_CPUS)
    ap.add_argument("--master", default=f"local[{DEFAULT_CPUS}]")
    ap.add_argument("--docs", type=int, default=PIPELINE_DOCS)
    ap.add_argument("--pages", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()
    {"suite": mode_suite, "pipeline": mode_pipeline, "scaling": mode_scaling}[args.mode](args)


if __name__ == "__main__":
    main()
