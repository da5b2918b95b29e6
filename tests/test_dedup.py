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


def test_simhash_and_minhash_match_independent_reference(spark, docs):
    """Blind verification of the hash-based operators: recompute simhash
    fingerprints and minhash signatures from first principles with a
    pure-Python XXH64 (tests/xxh64_ref.py, public spec) and require
    bit-equality with the Spark expressions — the engine-independent check
    SQL oracles can't provide (r1 VERDICT #7)."""
    import re as _re

    from pyspark.sql import functions as F

    from logprocessor_spark.operators.dedup import (
        minhash_signature,
        word_shingle_hashes,
    )
    from .xxh64_ref import I32, MASK, spark_xxhash64, to_i64

    sample = docs.orderBy("doc_id").limit(5).select("doc_id", "text").collect()
    got = (
        docs.orderBy("doc_id").limit(5)
        .select(
            "doc_id",
            simhash(F.col("text")).alias("sh"),
            word_shingle_hashes(F.col("text")).alias("wsh"),
        )
        .withColumn("sig", minhash_signature(F.col("wsh")))
        .collect()
    )

    def py_simhash(text, bits=64):
        votes = [0] * bits
        for t in _re.split(r"\s+", text.strip().lower()):
            hu = spark_xxhash64(t) & MASK
            for b in range(bits):
                votes[b] += 1 if (hu >> b) & 1 else -1
        packed = 0
        for b in range(bits):
            if votes[b] > 0:
                packed |= 1 << b
        return to_i64(packed)

    def py_shingle_hashes(text, k=3):
        words = _re.split(r"\s+", text.strip().lower())
        n = len(words)
        out, seen = [], set()
        for i in range(max(n - k + 1, 1)):
            h = spark_xxhash64(*[words[i + j] for j in range(k) if i + j < n])
            if h not in seen:
                seen.add(h)
                out.append(h)
        return out

    def py_signature(shingles, num=32):
        return [
            min(to_i64(spark_xxhash64(s, I32(i)) & MASK) for s in shingles)
            for i in range(num)
        ]

    for row, src in zip(got, sample):
        assert row.doc_id == src.doc_id
        assert row.sh == py_simhash(src.text), f"simhash doc {src.doc_id}"
        assert list(row.wsh) == py_shingle_hashes(src.text), f"shingles {src.doc_id}"
        assert list(row.sig) == py_signature(row.wsh), f"signature {src.doc_id}"


def test_arrow_signature_bit_equals_expression_and_reference(spark, docs):
    """The numpy XXH64 kernel (the DEFAULT signature path) must be
    bit-identical to BOTH the Spark expression path and the scalar
    tests/xxh64_ref.py reference — not just preserve banding collisions."""
    from logprocessor_spark.operators.dedup import (
        minhash_signature,
        minhash_signature_arrow,
        word_shingle_hashes,
    )
    from .xxh64_ref import I32, MASK, spark_xxhash64, to_i64

    base = docs.orderBy("doc_id").limit(8).select(
        "doc_id", word_shingle_hashes(F.col("text")).alias("wsh")
    )
    rows = (
        base.withColumn("sig_expr", minhash_signature(F.col("wsh")))
        .withColumn("sig_arrow", minhash_signature_arrow(F.col("wsh")))
        .collect()
    )
    assert len(rows) == 8
    for r in rows:
        assert list(r.sig_arrow) == list(r.sig_expr), f"doc {r.doc_id}"
        ref = [
            min(to_i64(spark_xxhash64(s, I32(i)) & MASK) for s in r.wsh)
            for i in range(32)
        ]
        assert list(r.sig_arrow) == ref, f"doc {r.doc_id} vs scalar reference"


def test_null_text_degrades_not_crashes(spark):
    """A NULL text row must yield a NULL signature on the Arrow path (the
    expression path's semantics) and be dropped from pair generation —
    never a task-killing TypeError in the numpy kernel."""
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "the same repeated doc body here"),
         (4, "the same repeated doc body here")],
        "doc_id long, text string",
    )
    for arrow in (True, False):
        pairs = minhash_lsh_dedup(df, threshold=0.8, arrow_signature=arrow)
        got = {(r.id_a, r.id_b) for r in pairs.collect()}
        assert got == {(3, 4)}, f"arrow_signature={arrow}"
    # same null semantics on the simhash and char-ngram paths
    assert {(r.id_a, r.id_b) for r in simhash_candidates(df).collect()} == {(3, 4)}
    assert {
        (r.id_a, r.id_b) for r in ngram_jaccard_pairs(df, threshold=0.8).collect()
    } == {(3, 4)}


def _union_find_components(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_resolve_dup_clusters_matches_union_find(spark):
    """Connected components over a graph with a 5-chain (exercises pointer
    jumping beyond near-clique diameter), a triangle, and a 2-clique must
    equal a scalar union-find reference."""
    from logprocessor_spark.operators.dedup import resolve_dup_clusters

    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (10, 12), (11, 12), (20, 21)]
    pdf = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {(r.doc_id, r.keeper_id) for r in resolve_dup_clusters(pdf).collect()}
    want = set(_union_find_components(pairs).items())
    assert got == want
    assert {k for _, k in got} == {1, 10, 20}


def test_near_dup_dedup_keeps_one_per_cluster(with_dupes):
    """End-to-end fuzzy dedup: survivors are exactly the min-id member of
    each pair-graph component; every dropped doc is linked to its cluster
    by at least one pair with jaccard >= threshold."""
    from logprocessor_spark.operators.dedup import near_dup_dedup

    tau = 0.5
    kept = near_dup_dedup(with_dupes, threshold=tau)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    all_ids = {r.doc_id for r in with_dupes.select("doc_id").collect()}
    pair_rows = minhash_lsh_dedup(with_dupes, threshold=tau).collect()
    comp = _union_find_components([(r.id_a, r.id_b) for r in pair_rows])
    expect_dropped = {x for x, root in comp.items() if root != x}
    assert kept_ids == all_ids - expect_dropped
    # the 30 exact copies are always dropped; their originals survive
    assert kept_ids.isdisjoint(set(range(10_000, 10_030)))
    assert set(range(30)) <= kept_ids
    # every dropped doc has >= 1 incident pair at/above the threshold
    incident = {r.id_a for r in pair_rows} | {r.id_b for r in pair_rows}
    assert expect_dropped <= incident
    assert all(r.jaccard_sim >= tau for r in pair_rows)


def test_simhash_arrow_bit_equals_expression(spark, docs):
    """The Arrow simhash kernel (default in simhash_candidates) must be
    bit-identical to the expression path, including null/empty rows."""
    from logprocessor_spark.operators.dedup import simhash_arrow, split_words

    sample = docs.limit(50).select("doc_id", "text").unionByName(
        spark.createDataFrame([(90001, None), (90002, "")], "doc_id long, text string")
    )
    hashes = F.transform(split_words(F.col("text")), lambda t: F.xxhash64(t))
    both = sample.select(
        "doc_id", simhash(F.col("text")).alias("e"), simhash_arrow(hashes).alias("a")
    )
    rows = both.collect()
    assert len(rows) == 52
    for r in rows:
        assert r.e == r.a, r.doc_id


def test_incremental_index_matches_cross_set_pairs(with_dupes, tmp_path):
    """dedup_against_index(new, index(corpus)) must equal the cross-set
    restriction of the full-batch pair set over corpus ∪ new."""
    from logprocessor_spark.operators.dedup import (
        dedup_against_index,
        minhash_index_build,
    )

    corpus = with_dupes.where(F.col("doc_id") < 10_000).select("doc_id", "text")
    new = with_dupes.where(F.col("doc_id") >= 10_000).select("doc_id", "text")
    path = str(tmp_path / "idx")
    minhash_index_build(corpus, path)
    inc = {
        (r["new_id"], r["index_id"], r["jaccard_sim"])
        for r in dedup_against_index(new, path, threshold=0.8).collect()
    }
    full = minhash_lsh_dedup(corpus.unionByName(new), threshold=0.8)
    cross = {
        (r["id_b"], r["id_a"], r["jaccard_sim"])
        for r in full.where(
            (F.col("id_a") < 10_000) & (F.col("id_b") >= 10_000)
        ).collect()
    }
    assert inc == cross and len(inc) > 0


def test_incremental_index_append_equals_rebuild(with_dupes, tmp_path):
    """Appending batch B into index(A) must answer probes like index(A∪B)."""
    from logprocessor_spark.operators.dedup import (
        dedup_against_index,
        minhash_index_append,
        minhash_index_build,
    )

    a = with_dupes.where(F.col("doc_id") < 25).select("doc_id", "text")
    b = with_dupes.where(
        (F.col("doc_id") >= 25) & (F.col("doc_id") < 10_000)
    ).select("doc_id", "text")
    probe = with_dupes.where(F.col("doc_id") >= 10_000).select("doc_id", "text")

    p1 = str(tmp_path / "accreted")
    minhash_index_build(a, p1)
    minhash_index_append(b, p1)
    p2 = str(tmp_path / "rebuilt")
    minhash_index_build(a.unionByName(b), p2)

    r1 = set(map(tuple, dedup_against_index(probe, p1).collect()))
    r2 = set(map(tuple, dedup_against_index(probe, p2).collect()))
    assert r1 == r2 and len(r1) > 0


def test_incremental_index_append_rejects_mismatched_params(docs, tmp_path):
    from logprocessor_spark.operators.dedup import (
        minhash_index_append,
        minhash_index_build,
    )

    path = str(tmp_path / "idx")
    minhash_index_build(docs.limit(5).select("doc_id", "text"), path, bands=8)
    with pytest.raises(ValueError, match="built with"):
        minhash_index_append(
            docs.limit(5).select("doc_id", "text"), path, bands=16
        )


def test_index_append_replay_keeps_decisions_stable(with_dupes, tmp_path):
    """foreachBatch is at-least-once: a REPLAYED append duplicates band
    rows in the index, but dedup decisions must not change (candidates
    dedupe on id pairs before verification) — the claim
    stream_dedup_against_index's docstring makes."""
    from logprocessor_spark.operators.dedup import (
        dedup_against_index,
        minhash_index_append,
        minhash_index_build,
    )

    corpus = with_dupes.where(F.col("doc_id") < 25).select("doc_id", "text")
    extra = with_dupes.where(
        (F.col("doc_id") >= 25) & (F.col("doc_id") < 10_000)
    ).select("doc_id", "text")
    probe = with_dupes.where(F.col("doc_id") >= 10_000).select("doc_id", "text")

    path = str(tmp_path / "idx")
    minhash_index_build(corpus, path)
    minhash_index_append(extra, path)
    before = set(map(tuple, dedup_against_index(probe, path).collect()))
    minhash_index_append(extra, path)  # the retry replay
    after = set(map(tuple, dedup_against_index(probe, path).collect()))
    assert before == after and len(before) > 0


def test_index_compact_equals_rebuild_and_shrinks(with_dupes, tmp_path):
    """compact(build + append + append-replay) must answer probes exactly
    like a fresh rebuild, while collapsing the replay's duplicate rows and
    merging the appends' small files."""
    from logprocessor_spark.operators.dedup import (
        dedup_against_index,
        minhash_index_append,
        minhash_index_build,
        minhash_index_compact,
    )

    corpus = with_dupes.where(F.col("doc_id") < 25).select("doc_id", "text")
    extra = with_dupes.where(
        (F.col("doc_id") >= 25) & (F.col("doc_id") < 10_000)
    ).select("doc_id", "text")
    probe = with_dupes.where(F.col("doc_id") >= 10_000).select("doc_id", "text")

    path = str(tmp_path / "idx")
    minhash_index_build(corpus, path)
    minhash_index_append(extra, path)
    minhash_index_append(extra, path)  # at-least-once replay
    stats = minhash_index_compact(corpus.sparkSession, path)

    rebuilt = str(tmp_path / "rebuilt")
    minhash_index_build(corpus.unionByName(extra), rebuilt)

    got = set(map(tuple, dedup_against_index(probe, path).collect()))
    want = set(map(tuple, dedup_against_index(probe, rebuilt).collect()))
    assert got == want and len(got) > 0
    # the replay's rows are gone and the three writes' files are merged
    assert stats["bands_rows_after"] < stats["bands_rows_before"]
    assert stats["shingles_rows_after"] < stats["shingles_rows_before"]
    assert stats["bands_files_after"] <= stats["bands_files_before"]
    assert stats["bands_files_after"] == 1  # tiny index -> one right-sized file


def test_index_compact_purges_deleted_ids(with_dupes, tmp_path):
    """Retention: compacting with deleted_ids must equal rebuilding the
    index without those documents — the TTL/unlearn hook."""
    from logprocessor_spark.operators.dedup import (
        dedup_against_index,
        minhash_index_build,
        minhash_index_compact,
    )

    corpus = with_dupes.where(F.col("doc_id") < 10_000).select("doc_id", "text")
    probe = with_dupes.where(F.col("doc_id") >= 10_000).select("doc_id", "text")
    drop = [r.doc_id for r in corpus.limit(13).collect()]

    path = str(tmp_path / "idx")
    minhash_index_build(corpus, path)
    minhash_index_compact(corpus.sparkSession, path, deleted_ids=drop)

    rebuilt = str(tmp_path / "rebuilt")
    minhash_index_build(
        corpus.where(~F.col("doc_id").isin(drop)), rebuilt
    )
    got = set(map(tuple, dedup_against_index(probe, path).collect()))
    want = set(map(tuple, dedup_against_index(probe, rebuilt).collect()))
    assert got == want
    # none of the purged ids can ever appear as an index-side match again
    assert not {g[1] for g in got} & set(drop)


def test_index_probe_scan_stays_narrow_after_compact(with_dupes, tmp_path):
    """The probe's candidate join must read ONLY (doc_id, band, bhash)
    from the compacted bands table — a scan that drags the shingle arrays
    into the 24 B/row join side would be quadratically wrong at crawl
    scale."""
    from logprocessor_spark.operators.dedup import (
        dedup_against_index,
        minhash_index_build,
        minhash_index_compact,
    )

    corpus = with_dupes.where(F.col("doc_id") < 10_000).select("doc_id", "text")
    probe = with_dupes.where(F.col("doc_id") >= 10_000).select("doc_id", "text")
    path = str(tmp_path / "idx")
    minhash_index_build(corpus, path)
    minhash_index_compact(corpus.sparkSession, path)

    # formatted mode puts each scan's full ReadSchema on its own line —
    # the tree toString truncates long lines, which made this assertion
    # depend on how long pytest's tmp_path happened to be
    out = dedup_against_index(probe, path)
    spark = corpus.sparkSession
    plan = spark._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    blocks = [b for b in plan.split("\n\n") if "Scan parquet" in b]
    band_scans = [b for b in blocks if "/bands" in b]
    assert band_scans, plan  # the bands scan must exist
    for b in band_scans:
        schema = [ln for ln in b.splitlines() if ln.startswith("ReadSchema:")]
        assert schema and "bhash" in schema[0], b
        # the shingle column is named `sh`; bare "sh:" would also match
        # inside "bhash:"
        assert "<sh:" not in schema[0] and ",sh:" not in schema[0], b
        assert "text" not in schema[0], b


def test_resolve_dup_clusters_raises_on_non_convergence(spark):
    """Exiting via max_iter with labels still moving must raise, not
    silently return wrong keeper_ids (a chain of 9 nodes needs more than
    one min-label+jump round)."""
    import pytest

    from logprocessor_spark.operators.dedup import resolve_dup_clusters

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        resolve_dup_clusters(chain, max_iter=1)
