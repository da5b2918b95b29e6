"""Similarity-search tests on the driver-provided embeddings table."""

import pytest
from pyspark.sql import functions as F

from logprocessor_spark.operators.similarity import (
    cosine_knn_join,
    cosine_topk,
    embedding_near_dup_pairs,
    lsh_ann_topk,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def query_vec(emb):
    return [float(x) for x in emb.where("vec_id = 0").first().embedding]


def test_brute_force_topk(emb, query_vec):
    rows = cosine_topk(emb, query_vec, k=10).collect()
    assert len(rows) == 10
    assert rows[0].vec_id == 0 and rows[0].cosine_sim == 1.0
    sims = [r.cosine_sim for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_topk_oracle_parity_duckdb(emb, query_vec):
    """Value-level parity with DuckDB list_dot_product on doubles."""
    import duckdb

    got = {(r.vec_id, r.cosine_sim) for r in cosine_topk(emb, query_vec, k=5).collect()}
    q = ",".join(str(x) for x in query_vec)
    want = {
        (r[0], round(r[1], 6))
        for r in duckdb.sql(
            f"""
        SELECT vec_id,
               list_dot_product(embedding::DOUBLE[], [{q}]::DOUBLE[]) /
               (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
                sqrt(list_dot_product([{q}]::DOUBLE[], [{q}]::DOUBLE[]))) AS sim
        FROM '{SF}/embeddings.parquet'
        ORDER BY sim DESC, vec_id LIMIT 5
        """
        ).fetchall()
    }
    assert got == want


def test_lsh_ann_finds_self_and_subsets_brute(emb, query_vec):
    ann = lsh_ann_topk(emb, query_vec, k=5)
    rows = ann.collect()
    assert rows[0].vec_id == 0 and rows[0].cosine_sim == 1.0
    # every ANN result's sim must equal the brute-force sim for that id
    brute = {r.vec_id: r.cosine_sim for r in cosine_topk(emb, query_vec, k=500).collect()}
    for r in rows:
        assert brute[r.vec_id] == r.cosine_sim


def test_lsh_candidate_reduction(emb, query_vec):
    """The ANN path must scan far fewer rows than the corpus (the point of
    the bucketing at 100 TB)."""
    from logprocessor_spark.operators.similarity import hyperplane_bucket

    dim = len(query_vec)
    b = emb.withColumn("__b", hyperplane_bucket(F.col("embedding"), dim, 8, 42))
    qb = (
        emb.sparkSession.range(1)
        .select(hyperplane_bucket(F.array(*[F.lit(x) for x in query_vec]), dim, 8, 42).alias("b"))
        .collect()[0]
        .b
    )
    cand = b.where(F.bit_count(F.col("__b").bitwiseXOR(F.lit(qb))) <= 1).count()
    total = emb.count()
    assert cand < total * 0.2


def test_embedding_near_dups(emb):
    planted = emb.limit(10).withColumn("vec_id", F.col("vec_id") + 100_000)
    pairs = embedding_near_dup_pairs(emb.unionByName(planted), tau=0.999)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert {(i, i + 100_000) for i in range(10)} <= got


def test_knn_join(emb):
    queries = emb.limit(3).select(F.col("vec_id").alias("q_id"), "embedding")
    out = cosine_knn_join(queries, emb, k=4)
    rows = out.collect()
    assert len(rows) == 12
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    for q, rs in by_q.items():
        best = min(rs, key=lambda r: r.rank)
        assert best.vec_id == q and best.cosine_sim == 1.0


def test_lsh_near_dup_pairs_equal_exact_twin(spark, emb):
    """The banded-LSH near-dup path (the 100 TB plan) must reproduce the
    exact all-pairs result at sf-small — pair set AND cosine values."""
    from logprocessor_spark.operators.similarity import cosine

    small = emb.select("vec_id", "embedding")
    doubled = small.unionAll(
        small.select((F.col("vec_id") + 100_000).alias("vec_id"), "embedding")
    )
    lsh = {
        (r.id_a, r.id_b, r.cosine_sim)
        for r in embedding_near_dup_pairs(doubled, tau=0.95).collect()
    }
    a = doubled.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = doubled.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    exact = {
        (r.id_a, r.id_b, r.cosine_sim)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= 0.95)
        .collect()
    }
    assert lsh == exact and len(lsh) >= 500


def test_prebucketed_ann_equals_in_memory(spark, emb, query_vec, tmp_path):
    """materialize_lsh_buckets + partition-pruned probe must return exactly
    what the on-the-fly lsh_ann_topk returns (same planes, same seed), and
    the scan must actually prune partitions."""
    from logprocessor_spark.operators.similarity import (
        lsh_ann_topk_prebucketed,
        materialize_lsh_buckets,
    )

    path = str(tmp_path / "buckets")
    materialize_lsh_buckets(emb.select("vec_id", "embedding"), path)
    pre = lsh_ann_topk_prebucketed(spark, path, query_vec, k=10)
    mem = lsh_ann_topk(emb, query_vec, k=10)
    assert [tuple(r) for r in pre.collect()] == [tuple(r) for r in mem.collect()]
    # partition pruning: the physical plan's scan must carry bucket IN (...)
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "bucket" in plan
    import os

    n_dirs = len([d for d in os.listdir(path) if d.startswith("bucket=")])
    assert n_dirs > 9  # multiple buckets exist; probe reads <= 9 of them


def test_ivf_build_and_probe(spark, emb, query_vec, tmp_path):
    """IVF: seeded k-means lists, partition-pruned probe, self found at
    rank 1, all returned sims equal brute-force values, candidate set
    strictly smaller than the corpus."""
    import os

    from logprocessor_spark.operators.similarity import ivf_build, ivf_topk

    path = str(tmp_path / "ivf")
    cents = ivf_build(emb.select("vec_id", "embedding"), path, k=8)
    assert len(cents) == 8 and len(cents[0]) == len(query_vec)
    got = ivf_topk(spark, path, cents, query_vec, k=5, nprobe=2).collect()
    assert got[0].vec_id == 0 and got[0].cosine_sim == 1.0
    brute = {r.vec_id: r.cosine_sim for r in cosine_topk(emb, query_vec, k=500).collect()}
    for r in got:
        assert brute[r.vec_id] == r.cosine_sim
    n_lists = len([d for d in os.listdir(path) if d.startswith("list_id=")])
    assert n_lists == 8  # probe reads 2 of them (partition pruning)
    cand = spark.read.parquet(path).where(F.col("list_id").isin([0, 1])).count()
    assert cand < emb.count()


def test_ivf_deterministic_build_and_probe(spark, emb, query_vec, tmp_path):
    """Hash-sampled-center IVF (the oracle-gated quantizer): self found
    at rank 1, every returned sim equals brute force, rebuild reproduces
    the identical centers (no RNG anywhere), probe prunes partitions."""
    import os

    from logprocessor_spark.operators.similarity import (
        ivf_build_deterministic,
        ivf_topk_deterministic,
    )

    path = str(tmp_path / "ivfd")
    cents = ivf_build_deterministic(emb.select("vec_id", "embedding"), path, k=8)
    assert len(cents) == 8 and len(cents[0]) == len(query_vec)
    got = ivf_topk_deterministic(spark, path, cents, query_vec, k=5, nprobe=2).collect()
    assert got[0].vec_id == 0 and got[0].cosine_sim == 1.0
    brute = {r.vec_id: r.cosine_sim for r in cosine_topk(emb, query_vec, k=500).collect()}
    for r in got:
        assert brute[r.vec_id] == r.cosine_sim
    n_lists = len([d for d in os.listdir(path) if d.startswith("list_id=")])
    assert n_lists == 8

    path2 = str(tmp_path / "ivfd2")
    cents2 = ivf_build_deterministic(emb.select("vec_id", "embedding"), path2, k=8)
    assert cents == cents2


def test_hyperplane_bucket_matches_independent_reference(spark, emb):
    """Blind verification of the LSH bucket: recompute the hyperplane
    projections and sign-bit packing from first principles with the
    pure-Python XXH64 reference and require equality with the Spark
    expression — completes the engine-independent story for the rows-only
    ANN queries (minhash/simhash covered in tests/test_dedup.py)."""
    from logprocessor_spark.operators.similarity import hyperplane_bucket

    from .xxh64_ref import I32, spark_xxhash64

    sample = emb.orderBy("vec_id").limit(8).select("vec_id", "embedding").collect()
    dim = len(sample[0].embedding)
    got = {
        r.vec_id: r.b
        for r in emb.orderBy("vec_id").limit(8)
        .select(
            "vec_id",
            hyperplane_bucket(F.col("embedding"), dim, 8, 42).alias("b"),
        )
        .collect()
    }

    def plane_component(p, j, seed=42):
        h = spark_xxhash64(I32(p), I32(j), I32(seed))
        return (h % 2_000_001 - 1_000_000) / 1_000_000.0

    for row in sample:
        vec = [float(x) for x in row.embedding]
        bucket = 0
        for p in range(8):
            proj = 0.0
            for j in range(dim):  # same j order as the Spark aggregate
                proj += vec[j] * plane_component(p, j)
            if proj > 0:
                bucket |= 1 << p
        assert got[row.vec_id] == bucket, row.vec_id


def test_allpairs_guard_refuses_at_scale(spark):
    """The exact all-pairs verification twin must fail fast above the row
    limit instead of materializing an n^2 BroadcastNestedLoopJoin."""
    import pytest

    from logprocessor_spark.harness import (
        ALLPAIRS_ROW_LIMIT,
        assert_small_for_allpairs,
    )

    big = spark.range(0, ALLPAIRS_ROW_LIMIT + 1)
    with pytest.raises(ValueError, match="all-pairs"):
        assert_small_for_allpairs(big, "guard-test")
    assert_small_for_allpairs(spark.range(0, 10), "guard-test")  # small: fine


def test_projections_arrow_bit_equals_expression(spark):
    """The Arrow plane-projection kernel must be bit-identical to the
    interpreted aggregate fold (same additions, same order) — sign bits
    and buckets depend on exact equality at the boundary."""
    from pyspark.sql import functions as F

    from logprocessor_spark.operators.similarity import (
        _projections,
        _projections_arrow,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").limit(100)
    dim = len(emb.first().embedding)
    both = emb.select(
        "vec_id",
        _projections(F.col("embedding"), dim, 48, 42).alias("e"),
        _projections_arrow(F.col("embedding"), dim, 48, 42).alias("a"),
    )
    for r in both.collect():
        assert list(r.e) == list(r.a), r.vec_id


def test_cosine_arrow_bit_equals_expression(spark):
    from pyspark.sql import functions as F

    from logprocessor_spark.operators.similarity import cosine, cosine_arrow

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").limit(60)
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = emb.select((F.col("vec_id") + 1).alias("ib"), F.col("embedding").alias("vb"))
    pairs = a.join(b, F.col("ia") == F.col("ib"))
    both = pairs.select(
        cosine(F.col("va"), F.col("vb")).alias("e"),
        cosine_arrow(F.col("va"), F.col("vb")).alias("a"),
    )
    rows = both.collect()
    assert len(rows) > 0
    for r in rows:
        assert r.e == r.a


def test_cosine_null_on_zero_norm_both_paths(spark):
    """Zero-norm vectors are similar to nothing: both cosine paths must
    yield NULL (an unguarded NaN would pass every `>= tau` filter, since
    Spark orders NaN above all numbers) — matching DuckDB's 0/0 -> NULL."""
    from logprocessor_spark.operators.similarity import cosine, cosine_arrow

    df = spark.createDataFrame(
        [
            (0, [0.0, 0.0], [1.0, 0.0]),
            (1, [0.0, 0.0], [0.0, 0.0]),
            (2, [1.0, 0.0], [1.0, 0.0]),
        ],
        "i long, a array<double>, b array<double>",
    )
    rows = df.select(
        "i",
        cosine(F.col("a"), F.col("b")).alias("ce"),
        cosine_arrow(F.col("a"), F.col("b")).alias("ca"),
    ).collect()
    by_i = {r["i"]: r for r in rows}
    assert by_i[0]["ce"] is None and by_i[0]["ca"] is None
    assert by_i[1]["ce"] is None and by_i[1]["ca"] is None
    assert abs(by_i[2]["ce"] - 1.0) < 1e-12 and abs(by_i[2]["ca"] - 1.0) < 1e-12
    # and a zero-norm pair never survives a similarity threshold
    kept = df.select("i", cosine(F.col("a"), F.col("b")).alias("s")).where(
        F.col("s") >= 0.0
    )
    assert {r["i"] for r in kept.collect()} == {2}


def test_cosine_nan_component_null_on_both_paths(spark):
    from logprocessor_spark.operators.similarity import cosine, cosine_arrow

    df = spark.createDataFrame(
        [(0, [float("nan"), 1.0], [1.0, 1.0]), (1, [1.0, 0.0], [1.0, 0.0])],
        "i long, a array<double>, b array<double>",
    )
    rows = {
        r["i"]: r
        for r in df.select(
            "i",
            cosine(F.col("a"), F.col("b")).alias("ce"),
            cosine_arrow(F.col("a"), F.col("b")).alias("ca"),
        ).collect()
    }
    assert rows[0]["ce"] is None and rows[0]["ca"] is None
    assert abs(rows[1]["ce"] - 1.0) < 1e-12 and abs(rows[1]["ca"] - 1.0) < 1e-12
