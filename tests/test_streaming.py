"""Streaming pipeline tests: the stream must produce the same routed rows
as the batch run over identical input (one logical plan, two modes)."""

import pytest
from pyspark.sql import functions as F

from logprocessor_spark.job import run_pipeline
from logprocessor_spark.sinks import read_sink
from logprocessor_spark.streaming.pipeline import (
    sessionize,
    stream_pages,
    stream_pipeline,
    windowed_sink_counts,
)
from logprocessor_spark.synth import (
    default_rules,
    gen_agent_dim,
    gen_geo_dim,
    gen_pages,
    write_pages_partitioned,
)


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("stream"))
    pages = gen_pages(spark, 800, seed=3)
    write_pages_partitioned(pages, f"{base}/pages")
    run_pipeline(spark, f"{base}/pages", f"{base}/batch", run_id="b")
    return base


def test_stream_matches_batch(spark, setup):
    base = setup
    src = stream_pages(spark, f"{base}/pages")
    assert src.isStreaming
    q = stream_pipeline(
        src,
        f"{base}/stream_out",
        f"{base}/ckpt",
        gen_geo_dim(spark),
        gen_agent_dim(spark),
        default_rules(spark),
    )
    q.awaitTermination(120)
    got = set(
        spark.read.parquet(f"{base}/stream_out").select("sink", "url").collect()
    )
    want = set(read_sink(spark, f"{base}/batch/routed").select("sink", "url").collect())
    assert got == want


def test_windowed_counts(spark, setup):
    base = setup
    src = stream_pages(spark, f"{base}/pages")
    agg = windowed_sink_counts(
        src, gen_geo_dim(spark), gen_agent_dim(spark), default_rules(spark)
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM win_counts").collect()
    assert rows
    total = sum(r.doc_count for r in rows)
    batch_total = (
        read_sink(spark, f"{base}/batch/routed").where(F.col("ts").isNotNull()).count()
    )
    assert total == batch_total


def test_sessionize_stream(spark, tmp_path):
    # file-source stream over the events table sample
    src_dir = str(tmp_path / "events")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(2000).write.parquet(src_dir)
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        ).parquet(src_dir)
    )
    q = (
        sessionize(stream)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert rows
    assert all(r.session_end > r.session_start and r.n_events >= 1 for r in rows)
