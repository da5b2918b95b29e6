"""Shuffle-join regime tests: the fact x fact SortMergeJoin path and AQE
skew-splitting — the join shapes no broadcast-dim query exercises (SURVEY
§2d note; r2 VERDICT missing #3)."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _final_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_tpch_q3_is_sort_merge_join(spark):
    """tpch_q3 must compile to SortMergeJoin on BOTH joins (no broadcast):
    the 100 TB fact x fact shape, proven at sf-small via merge hints."""
    from logprocessor_spark.harness import q_tpch_q3

    df = q_tpch_q3(spark, SF)
    plan = _final_plan(df)
    assert plan.count("SortMergeJoin") == 2
    assert "BroadcastHashJoin" not in plan
    assert df.count() == 10


@pytest.fixture()
def skew_confs(spark):
    """Lower AQE skew thresholds so a local-scale skewed partition trips
    the same runtime re-plan a multi-GB partition does on a cluster."""
    keys = [
        ("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"),
        ("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"),
        ("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB"),
        ("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16KB"),
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
    ]
    old = {k: spark.conf.get(k, None) for k, _ in keys}
    for k, v in keys:
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark, skew_confs):
    """A Zipf-skewed join key (95% of rows on one key) must trigger AQE's
    skew-join split: the final adaptive plan shows a skewed AQEShuffleRead,
    and results stay correct. This is the runtime half of the skew story
    (the compile-time half is salted aggregation, salted_agg_parity)."""
    pad = F.repeat(F.lit("x"), 64)
    left = spark.range(0, 120_000).select(
        F.when(F.col("id") < 114_000, F.lit(0)).otherwise(F.col("id") % 97).alias("k"),
        F.col("id").alias("v"),
        pad.alias("pad"),
    )
    right = spark.range(0, 97).select(F.col("id").alias("k"), pad.alias("rpad"))
    j = left.join(right.hint("merge"), "k")
    # execute THIS query (count() would plan a different one) so the
    # AdaptiveSparkPlan finalizes and records the runtime re-plan
    n = len(j.collect())
    assert n == 120_000  # every left row matches exactly one right row
    plan = _final_plan(j)
    assert "isFinalPlan=true" in plan
    assert "SortMergeJoin(skew=true)" in plan, plan[:1500]
    assert "AQEShuffleRead coalesced and skewed" in plan, plan[:1500]


def test_crawl_delta_golden(spark):
    from logprocessor_spark.operators.delta import crawl_delta

    old = spark.createDataFrame(
        [("u1", "a"), ("u2", "b"), ("u3", "c")], "url string, fp string"
    )
    new = spark.createDataFrame(
        [("u2", "b"), ("u3", "C"), ("u4", "d")], "url string, fp string"
    )
    got = {r["url"]: r["status"] for r in crawl_delta(old, new).collect()}
    assert got == {
        "u1": "removed",
        "u2": "unchanged",
        "u3": "changed",
        "u4": "added",
    }


def test_bucketed_join_has_zero_exchanges(spark, tmp_path):
    """Co-located fact x fact join: identically bucketed tables join with
    NO shuffle and NO sort — the bucketing contract at 100 TB."""
    from logprocessor_spark.sinks import colocated_join, write_bucketed

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        write_bucketed(
            orders, "t_orders_b", "o_orderkey", 8, path=str(tmp_path / "o")
        )
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "t_lineitem_b", "o_orderkey", 8, path=str(tmp_path / "l"),
        )
        j = colocated_join(spark, "t_orders_b", "t_lineitem_b", "o_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:800]
        assert "SortMergeJoin" in plan
        # values still correct vs the plain (shuffling) join
        plain = orders.join(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        )
        assert j.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_crawl_delta_null_fingerprints(spark):
    """NULL-text pages (NULL fp) present in both snapshots are matched by
    URL, not misread as added/removed; NULL->value is 'changed'."""
    from logprocessor_spark.operators.delta import crawl_delta

    old = spark.createDataFrame(
        [("u1", None), ("u2", None), ("u3", "c")], "url string, fp string"
    )
    new = spark.createDataFrame(
        [("u1", None), ("u2", "b"), ("u4", None)], "url string, fp string"
    )
    got = {r["url"]: r["status"] for r in crawl_delta(old, new).collect()}
    assert got == {
        "u1": "unchanged",
        "u2": "changed",
        "u3": "removed",
        "u4": "added",
    }
