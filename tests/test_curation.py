"""Curation operators: per-host cap (salted top-k), corpus-frequency
boilerplate-line removal, vocabulary top-k, approx-percentile scale path."""

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from logprocessor_spark.operators.curation import (
    host_cap,
    host_of,
    remove_boilerplate_lines,
    vocab_topk,
)

SF = "/root/testdata/sf0.001"


def _skewed_hosts(spark, n=2000):
    """90% of rows on one host (the Zipf head), rest spread over 50."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 9, F.lit("mega.example.com"))
        .otherwise(F.concat(F.lit("tail"), (F.col("id") % 50).cast("string")))
        .alias("host"),
    )


def test_host_cap_matches_plain_window_on_skew(spark):
    df = _skewed_hosts(spark)
    salted = host_cap(df, cap=3, salt_buckets=8)
    w = Window.partitionBy("host").orderBy("doc_id")
    plain = (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .drop("rn")
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_host_cap_respects_cap_and_order(spark):
    df = _skewed_hosts(spark, n=500)
    out = host_cap(df, cap=2).groupBy("host").agg(
        F.count(F.lit(1)).alias("n"), F.max("doc_id").alias("mx")
    )
    rows = {r["host"]: r for r in out.collect()}
    assert all(r["n"] <= 2 for r in rows.values())
    # lowest-doc_id-first: the mega host keeps exactly ids {0, 1}
    assert rows["mega.example.com"]["mx"] == 1


def test_host_of_parses_host(spark):
    r = spark.range(1).select(
        host_of(F.lit("https://host042.example.com/d/7")).alias("h")
    ).first()
    assert r["h"] == "host042.example.com"


def test_remove_boilerplate_lines_golden(spark):
    # "NAV" appears in all 4 docs, "FOOT" in 3; unique bodies survive.
    docs = spark.createDataFrame(
        [
            (0, "NAV\nalpha\nFOOT"),
            (1, "NAV\nbeta\nFOOT"),
            (2, "NAV\ngamma\nFOOT"),
            (3, "NAV\ndelta"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(docs, min_docs=3).collect()
    }
    assert out[0]["text"] == "alpha" and out[0]["n_lines_cut"] == 2
    assert out[3]["text"] == "delta" and out[3]["n_lines_cut"] == 1


def test_remove_boilerplate_all_lines_cut(spark):
    docs = spark.createDataFrame(
        [(i, "SAME") for i in range(5)], "doc_id long, text string"
    )
    out = remove_boilerplate_lines(docs, min_docs=2).collect()
    assert len(out) == 5
    assert all(r["text"] == "" and r["n_lines_cut"] == 1 for r in out)


def test_remove_boilerplate_repeated_line_within_one_doc(spark):
    # a line repeated inside ONE doc counts that doc once toward min_docs
    docs = spark.createDataFrame(
        [(0, "X\nX\nbody0"), (1, "body1")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(docs, min_docs=2).collect()
    }
    assert out[0]["text"] == "X\nX\nbody0" and out[0]["n_lines_cut"] == 0


def test_vocab_topk_deterministic_ties(spark):
    docs = spark.createDataFrame(
        [(0, "b a"), (1, "a b"), (2, "c")], "doc_id long, text string"
    )
    rows = vocab_topk(docs, k=2).collect()
    assert [(r["token"], r["n"]) for r in rows] == [("a", 2), ("b", 2)]


def test_approx_percentile_exact_below_accuracy(spark):
    """The corpus_report_approx premise: approx_percentile(·, q, 10000) is
    exact (== discrete rank quantile) while group counts < accuracy."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    got = {
        r["lang"]: (r["p50"], r["p90"])
        for r in d.groupBy("lang")
        .agg(
            F.expr("approx_percentile(n_chars, 0.5, 10000)").alias("p50"),
            F.expr("approx_percentile(n_chars, 0.9, 10000)").alias("p90"),
        )
        .collect()
    }
    pdf = d.select("lang", "n_chars").toPandas()
    for lang, grp in pdf.groupby("lang"):
        xs = np.sort(grp["n_chars"].to_numpy())
        n = len(xs)
        # Spark's rule: smallest value with ceil(q*n) values <= it
        exp = (
            xs[int(np.ceil(0.5 * n)) - 1],
            xs[int(np.ceil(0.9 * n)) - 1],
        )
        assert got[lang] == exp, lang


def test_remove_boilerplate_preserves_null_docs(spark):
    docs = spark.createDataFrame(
        [(0, "NAV\nalpha"), (1, "NAV\nbeta"), (2, None), (3, "NAV\ngamma")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_boilerplate_lines(docs, min_docs=3).collect()}
    assert set(out) == {0, 1, 2, 3}  # the NULL doc survives as a row
    assert out[2]["text"] is None and out[2]["n_lines_cut"] == 0
    assert out[0]["text"] == "alpha"


def _budget_docs(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, "g1" if i % 2 == 0 else "g2",
         round(rng.choice([0.1, 0.25, 0.25, 0.5, 0.5, 0.9]), 4),
         rng.choice([0, 5, 10, 17]))
        for i in range(400)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, lang string, qscore double, n_tokens long"
    )


def test_token_budget_histogram_equals_window(spark):
    from logprocessor_spark.operators.curation import (
        select_token_budget,
        select_token_budget_histogram,
    )

    d = _budget_docs(spark)
    for budget in (1, 37, 200, 10**6):
        exact = select_token_budget(d, budget)
        hist = select_token_budget_histogram(d, budget)
        assert exact.exceptAll(hist).count() == 0, budget
        assert hist.exceptAll(exact).count() == 0, budget


def test_token_budget_exact_fit_and_zero_token_edge(spark):
    """A bucket whose cumulative mass EQUALS the budget: kept docs stop at
    the budget, and a trailing zero-token doc (prior == budget) is dropped
    by both forms."""
    from logprocessor_spark.operators.curation import (
        select_token_budget,
        select_token_budget_histogram,
    )

    d = spark.createDataFrame(
        [
            (0, "g", 0.9, 10),
            (1, "g", 0.9, 10),
            (2, "g", 0.9, 0),   # prior == 20 == budget -> dropped
            (3, "g", 0.5, 10),  # lower bucket, over budget -> dropped
        ],
        "doc_id long, lang string, qscore double, n_tokens long",
    )
    for fn in (select_token_budget, select_token_budget_histogram):
        got = {r["doc_id"] for r in fn(d, budget=20).collect()}
        assert got == {0, 1}, fn.__name__


def test_token_budget_null_quality_docs_rank_last_in_both_forms(spark):
    from logprocessor_spark.operators.curation import (
        select_token_budget,
        select_token_budget_histogram,
    )

    d = spark.createDataFrame(
        [(0, "g", 0.9, 10), (1, "g", None, 10), (2, "g", 0.5, 10)],
        "doc_id long, lang string, qscore double, n_tokens long",
    )
    for budget, want in ((25, {0, 2, 1}), (15, {0, 2}), (10, {0})):
        for fn in (select_token_budget, select_token_budget_histogram):
            got = {r["doc_id"] for r in fn(d, budget=budget).collect()}
            assert got == want, (fn.__name__, budget)


def test_boilerplate_invariants_random_corpora(spark):
    """Property check over randomized corpora: (1) with an unreachable
    threshold the text round-trips byte-exactly; (2) kept+cut line counts
    always sum to the original; (3) no boilerplate line survives."""
    import random

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        lines_pool = [f"L{j}" for j in range(8)]
        rows = [
            (i, "\n".join(rng.choice(lines_pool) for _ in range(rng.randint(1, 6))))
            for i in range(60)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")

        # (1) round-trip when nothing can reach the threshold
        rt = remove_boilerplate_lines(docs, min_docs=10**9)
        orig = dict(rows)
        for r in rt.collect():
            assert r["text"] == orig[r["doc_id"]] and r["n_lines_cut"] == 0

        # (2)+(3) against an independently computed frequent-line set
        from collections import Counter

        freq = Counter()
        for _, t in rows:
            for ln in set(t.split("\n")):
                freq[ln] += 1
        bp = {ln for ln, c in freq.items() if c >= 30}
        out = remove_boilerplate_lines(docs, min_docs=30)
        for r in out.collect():
            total = len(orig[r["doc_id"]].split("\n"))
            kept = r["text"].split("\n") if r["text"] else []
            assert len(kept) + r["n_lines_cut"] == total
            assert not (set(kept) & bp)


def test_token_budget_totals_within_one_doc_overshoot(spark):
    """The kept set's token total never exceeds budget + (largest kept
    doc), and adding the best dropped doc would always overshoot."""
    from logprocessor_spark.operators.curation import select_token_budget

    d = _budget_docs(spark)
    budget = 120
    kept = select_token_budget(d, budget)
    totals = {
        r["lang"]: r["t"]
        for r in kept.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    }
    max_doc = {
        r["lang"]: r["m"]
        for r in kept.groupBy("lang").agg(F.max("n_tokens").alias("m")).collect()
    }
    for lang, t in totals.items():
        assert t <= budget + max_doc[lang]
        assert t >= budget or d.where(
            (F.col("lang") == lang)
        ).count() == kept.where(F.col("lang") == lang).count()


def test_token_budget_null_group_key_survives_histogram_form(spark):
    from logprocessor_spark.operators.curation import (
        select_token_budget,
        select_token_budget_histogram,
    )

    d = spark.createDataFrame(
        [(0, None, 0.9, 10), (1, None, 0.5, 10), (2, "en", 0.9, 10)],
        "doc_id long, lang string, qscore double, n_tokens long",
    )
    for fn in (select_token_budget, select_token_budget_histogram):
        got = {r["doc_id"] for r in fn(d, budget=15).collect()}
        # NULL lang is its own group: doc 0 fits, doc 1 crosses after it
        assert got == {0, 1, 2}, fn.__name__
    for fn in (select_token_budget, select_token_budget_histogram):
        got = {r["doc_id"] for r in fn(d, budget=10).collect()}
        assert got == {0, 2}, fn.__name__


def test_mix_to_recipe_rates_and_determinism(spark):
    from logprocessor_spark.operators.curation import mix_to_recipe

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")
    recipe = {"en": 500_000, "de": 500_000}
    out = mix_to_recipe(d, recipe, budget=20)
    rows = out.collect()
    # deterministic: second evaluation identical
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in out.collect()
    )
    by_lang = {}
    for r in rows:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + 1
    # recipe-absent groups drop entirely
    assert set(by_lang) <= {"en", "de"}
    # each group lands near its 10-doc share (modulus quantization slack)
    for lang, n in by_lang.items():
        assert 3 <= n <= 20, (lang, n)
    # a group whose share exceeds its size keeps everything (rate capped)
    all_de = d.where(F.col("lang") == "de")
    kept = mix_to_recipe(all_de, {"de": 1_000_000}, budget=10**9)
    assert kept.count() == all_de.count()


def test_token_budget_histogram_resolution_guard(spark):
    """validate_resolution raises on a raw double score (more than
    `resolution` decimals) instead of silently selecting differently from
    the exact window form; passes on properly-quantized scores."""
    import pytest

    from logprocessor_spark.operators.curation import (
        select_token_budget_histogram,
    )

    d = _budget_docs(spark)
    raw = d.withColumn("qscore", F.col("qscore") + F.lit(1e-7))
    with pytest.raises(ValueError, match="decimal places"):
        select_token_budget_histogram(raw, 100, validate_resolution=True)
    # quantized scores validate clean, and a coarser score passes a
    # coarser declared resolution
    ok = select_token_budget_histogram(d, 100, validate_resolution=True)
    assert ok.count() > 0
    raw7 = d.withColumn("qscore", F.round(F.col("qscore") + F.lit(1e-7), 7))
    ok7 = select_token_budget_histogram(
        raw7, 100, resolution=7, validate_resolution=True
    )
    assert ok7.count() > 0
