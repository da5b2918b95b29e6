"""Similarity search over embedding columns (array<float>).

* ``cosine_topk``      — brute-force exact top-k: native ``zip_with`` +
                         ``aggregate`` dot product, TakeOrderedAndProject.
                         The baseline and the verifier for the ANN path.
* ``lsh_ann_topk``     — random-hyperplane LSH: deterministic pseudo-random
                         planes derived from a seed via hashing (no RNG
                         state to ship), sign-bit bucket key, rerank within
                         the probed bucket(s). The 100 TB path: candidate
                         set per query is ~n/2^bits, tunable.
* ``embedding_near_dup_pairs`` — near-duplicate pairs by cosine >= tau via
                         the same LSH bucketing (self-join on bucket).
* ``cosine_knn_join``  — small query set (broadcast) x corpus exact k-NN.

Dot products in double precision so results are oracle-comparable.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to a constant query vector. orderBy+limit
    compiles to TakeOrderedAndProject: each partition keeps k rows, the
    driver merges — no global sort at any scale."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine(F.col(vec_col), q).alias("cosine_sim")
    return (
        emb.select(F.col(id_col), F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def _plane_component(plane: int, j: Column, dim: int, seed: int) -> Column:
    """Deterministic pseudo-random plane component in [-1, 1): derived from
    (plane, j, seed) by hashing — every executor recomputes identical
    planes, nothing is broadcast or randomly seeded."""
    h = F.xxhash64(F.lit(plane), j, F.lit(seed))
    return (F.pmod(h, F.lit(2_000_001)) - 1_000_000) / 1_000_000.0


def hyperplane_bucket(
    vec: Column, dim: int, n_planes: int = 8, seed: int = 42
) -> Column:
    """LSH bucket id: sign bits of <vec, plane_p> packed into a long."""
    idx = F.sequence(F.lit(0), F.lit(dim - 1))

    def _proj_fn(p: int):
        # closure factory: Spark HOF lambdas must take exactly (acc, x)
        return lambda acc, j: acc + F.element_at(
            vec, (j + 1).cast("int")
        ).cast("double") * _plane_component(p, j, dim, seed)

    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(idx, F.lit(0.0), _proj_fn(p))
        bucket = bucket + F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(0)
    return bucket


def lsh_ann_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: rerank only rows whose LSH bucket is within
    ``multiprobe_hamming`` bits of the query's bucket. Expected candidate
    fraction ~ sum_{i<=h} C(P,i) / 2^P (P=n_planes) — at P=8, h=1 that is
    ~3.5% of the corpus. Bucket assignment is a pure projection; in a real
    deployment it is precomputed + partitioned-by, making a query a
    partition-pruned scan."""
    dim = len(query_vec)
    # the query's bucket comes from the same Spark expression on a 1-row df
    # (no Python reimplementation of xxhash64 to drift)
    spark = emb.sparkSession
    qdf = spark.range(1).select(
        F.array(*[F.lit(float(x)) for x in query_vec]).alias("v")
    )
    qb = qdf.select(
        hyperplane_bucket(F.col("v"), dim, n_planes, seed).alias("b")
    ).collect()[0].b
    bucketed = emb.withColumn(
        "__bucket", hyperplane_bucket(F.col(vec_col), dim, n_planes, seed)
    )
    probe = F.bit_count(F.col("__bucket").bitwiseXOR(F.lit(qb))) <= multiprobe_hamming
    return cosine_topk(bucketed.where(probe), query_vec, k, id_col, vec_col)


def embedding_near_dup_pairs(
    emb: DataFrame,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs with cosine >= tau. Candidates = same LSH
    bucket (equi-join, shuffle on an 8-byte key), verified exactly."""
    first = emb.select(vec_col).first()
    dim = len(first[vec_col]) if first else 0
    # persist: the hyperplane projection (n_planes x dim-step HOF aggregate)
    # feeds both sides of the bucket self-join — un-materialized, Catalyst
    # project-collapsing would recompute it per side (same recompute shape
    # as dedup._banded_candidate_pairs; persist = compute-once).
    b = emb.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        hyperplane_bucket(F.col(vec_col), dim, n_planes, seed).alias("__bucket"),
    ).persist()
    pairs = (
        b.alias("a")
        .join(
            b.alias("b"),
            on=[
                F.col("a.__bucket") == F.col("b.__bucket"),
                F.col("a.__id") < F.col("b.__id"),
            ],
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.round(cosine(F.col("a.__v"), F.col("b.__v")), 6).alias("cosine_sim"),
        )
    )
    return pairs.where(F.col("cosine_sim") >= tau)


def cosine_knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "q_id",
    c_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact k-NN join: small query set x corpus. The query side is
    broadcast (crossJoin with a broadcast hint -> BroadcastNestedLoopJoin);
    per-query top-k via window rank. Corpus is never shuffled."""
    from pyspark.sql.window import Window

    j = corpus.crossJoin(F.broadcast(queries.select(F.col(q_id), F.col(vec_col).alias("__qv"))))
    sim = cosine(F.col(vec_col), F.col("__qv"))
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine_sim"), F.col(c_id))
    return (
        j.select(q_id, c_id, F.round(sim, 6).alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
