"""Deployment-unit test: the pipeline must run via REAL ``spark-submit
--py-files logprocessor_spark.zip`` in a fresh JVM/interpreter — the
north-rule packaging contract — with imports resolved from the shipped
zip, not the repo checkout."""

import json
import os
import shutil
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_spark_submit_py_files_runs_pipeline(spark, tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    from logprocessor_spark.synth import gen_pages, write_pages_partitioned
    from tools.package import build

    pages_dir = str(tmp_path / "pages")
    write_pages_partitioned(gen_pages(spark, 2000, seed=11), pages_dir)
    zpath, lpath = build(str(tmp_path / "dist"))

    # run from an empty cwd so `import logprocessor_spark` can only come
    # from the --py-files zip (the repo dir must not be on sys.path)
    workdir = str(tmp_path / "cwd")
    os.makedirs(workdir)
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)
    }
    env["PYSPARK_PYTHON"] = sys.executable
    out_dir = str(tmp_path / "out")
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zpath,
            lpath,
            "--pages", pages_dir,
            "--out", out_dir,
            "--run-id", "submit-e2e",
        ],
        cwd=workdir,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    # launcher prints the result dict; rows must round-trip
    summary_line = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("{") and "rows_in" in ln
    ]
    assert summary_line, proc.stdout[-2000:]
    summary = json.loads(summary_line[-1].replace("'", '"'))
    assert summary["rows_in"] == 2000
    assert summary["rows_out"] > 0
    routed = spark.read.parquet(f"{out_dir}/routed")
    # rows_out counts non-quarantined routed rows; the table holds both
    assert routed.count() == summary["rows_in"]
    assert routed.where("sink <> 'quarantine'").count() == summary["rows_out"]
