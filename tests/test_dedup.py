"""Dedup operator tests on the driver-provided documents table + planted
duplicates/near-duplicates (the table itself has no exact dupes)."""

import pytest
from pyspark.sql import functions as F

from logprocessor_spark.operators.dedup import (
    exact_dedup,
    exact_dup_groups,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash,
    simhash_candidates,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def with_dupes(docs):
    """30 originals + 30 exact copies (ids shifted) + 10 near-copies with
    one word changed."""
    sub = docs.limit(30)
    exact = sub.withColumn("doc_id", F.col("doc_id") + 10_000)
    near = (
        docs.limit(10)
        .withColumn("doc_id", F.col("doc_id") + 20_000)
        .withColumn("text", F.concat(F.col("text"), F.lit("tailword")))
    )
    return sub.unionByName(exact).unionByName(near).cache()


def test_exact_dedup_keeps_min_id(with_dupes):
    kept = exact_dedup(with_dupes)
    assert kept.count() == 40  # 30 winners + 10 near-dupes (not exact)
    assert kept.where(F.col("doc_id") >= 10_000).where(F.col("doc_id") < 20_000).count() == 0


def test_exact_dup_groups(with_dupes):
    g = exact_dup_groups(with_dupes)
    rows = g.collect()
    assert len(rows) == 30
    assert all(r.n_dupes == 2 and r.keeper_id < 10_000 for r in rows)


def test_minhash_lsh_finds_exact_and_near(with_dupes):
    pairs = minhash_lsh_dedup(with_dupes, threshold=0.5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    exact_pairs = {(i, i + 10_000) for i in range(30)}
    assert exact_pairs <= got
    sims = {(r.id_a, r.id_b): r.jaccard_sim for r in pairs.collect()}
    assert all(sims[p] == 1.0 for p in exact_pairs)
    # near-dupes (one appended word on ~40+ words) should also surface
    near_found = {p for p in got if p[1] >= 20_000}
    assert len(near_found) >= 5


def test_minhash_no_false_positives_at_high_threshold(docs):
    # distinct random docs: no pairs above 0.9
    assert minhash_lsh_dedup(docs.limit(80), threshold=0.9).count() == 0


def test_simhash_deterministic_and_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "completely different words entirely unrelated content here")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.sh for r in df.select("doc_id", simhash(F.col("text")).alias("sh")).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_simhash_candidates(with_dupes):
    pairs = simhash_candidates(with_dupes.where("doc_id < 10030 or doc_id >= 20000"), max_hamming=6)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # near-dupes differ by one appended token -> tiny hamming distance
    assert len({p for p in got if p[1] >= 20_000}) >= 5


def test_ngram_jaccard(with_dupes):
    pairs = ngram_jaccard_pairs(with_dupes, threshold=0.8)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert {(i, i + 10_000) for i in range(30)} <= got


def test_short_docs_do_not_crash_ansi(spark):
    """ANSI guard: docs with fewer words than the shingle size k (empty,
    one-word, two-word) must shingle to a clamped set, not throw
    SparkArrayIndexOutOfBoundsException (Spark 4 default ANSI mode)."""
    df = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "two words"), (4, "three word doc"),
         (5, "three word doc")],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_dedup(df, threshold=0.8).collect()
    assert {(p.id_a, p.id_b) for p in pairs} >= {(4, 5)}
    from logprocessor_spark.operators.dedup import word_shingles

    sh = df.select(word_shingles(F.col("text")).alias("s")).collect()
    assert all(len(r.s) >= 1 for r in sh)
    assert ngram_jaccard_pairs(df, threshold=0.9).count() >= 1
    assert simhash_candidates(df).count() >= 1
