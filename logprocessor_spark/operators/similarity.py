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
    """NULL when either vector has zero norm (or is NULL): Spark's double
    0/0 is NaN, and Spark orders NaN ABOVE every number, so an unguarded
    NaN would sail through every ``sim >= tau`` filter while the DuckDB
    oracle (0/0 -> NULL) drops it. Zero-norm embeddings exist in real
    corpora (empty docs); they are similar to nothing."""
    den = _norm(a) * _norm(b)
    dot = _dot(a, b)
    # NaN guards on BOTH operands: Spark orders NaN above every number, so
    # `NaN > 0` is TRUE and a NaN component (den or dot NaN) would leak
    # through the zero-norm guard — and diverge from the Arrow path
    return F.when((den > 0) & ~F.isnan(den) & ~F.isnan(dot), dot / den)


def cosine_arrow(a: Column, b: Column) -> Column:
    """Arrow fast path for pairwise ``cosine``: per batch, dot and norms
    accumulate with a vectorized loop in ascending-j order — the SAME
    double additions in the SAME order as the expression fold, so values
    are bit-identical (the verify stage feeds a round(6) that two engines
    must agree on exactly). The interpreted HOF path costs ~2 lambda evals
    per dimension per ROW; this is dim fused vector ops per BATCH."""
    import pandas as pd
    from pyspark.sql.types import DoubleType

    def _cos(x, y):
        import numpy as np

        mask = [u is not None and v is not None for u, v in zip(x, y)]
        ua = [np.asarray(u, dtype=np.float64) for u, ok in zip(x, mask) if ok]
        vb = [np.asarray(v, dtype=np.float64) for v, ok in zip(y, mask) if ok]
        if ua:
            A, B = np.stack(ua), np.stack(vb)
            dot = np.zeros(len(A))
            na = np.zeros(len(A))
            nb = np.zeros(len(A))
            for j in range(A.shape[1]):
                dot += A[:, j] * B[:, j]
                na += A[:, j] * A[:, j]
                nb += B[:, j] * B[:, j]
            den = np.sqrt(na) * np.sqrt(nb)
            with np.errstate(divide="ignore", invalid="ignore"):
                res = dot / den
            # zero-norm or NaN operand -> None, matching the expression
            # path's predicate exactly (a NaN here would pass Spark's
            # `>= tau` — NaN sorts above all)
            ok2 = (den > 0) & ~np.isnan(den) & ~np.isnan(dot)
            vals = iter((float(r) if o else None) for r, o in zip(res, ok2))
        else:
            vals = iter(())
        return pd.Series(
            [next(vals) if ok else None for ok in mask], index=x.index, dtype=object
        )

    _cos.__annotations__ = {"x": pd.Series, "y": pd.Series, "return": pd.Series}
    return F.pandas_udf(_cos, DoubleType())(a, b)


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


def _projections(vec: Column, dim: int, n_planes: int, seed: int) -> Column:
    """array<double> of <vec, plane_p> for p in 0..n_planes-1, computed in
    ONE ``aggregate`` pass over the dimensions (per j, a ``zip_with``
    accumulates all planes at once). Numerically identical to a
    plane-by-plane loop — per plane the additions run in the same j
    order — but the expression tree is O(1) in n_planes instead of O(P)
    separate aggregates, which cuts plan/codegen compile from ~8 s to
    well under a second for 48 planes (measured; compile is a per-plan
    fixed cost every fresh query pays)."""
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    planes = F.sequence(F.lit(0), F.lit(n_planes - 1))
    return F.aggregate(
        idx,
        F.array_repeat(F.lit(0.0), n_planes),
        lambda acc, j: F.zip_with(
            acc,
            F.transform(
                planes,
                lambda p: F.element_at(vec, (j + 1).cast("int")).cast("double")
                * _plane_component_col(p, j, seed),
            ),
            lambda a, b: a + b,
        ),
    )


def _plane_component_col(p: Column, j: Column, seed: int) -> Column:
    """Column-typed twin of _plane_component (p as a column)."""
    h = F.xxhash64(p, j, F.lit(seed))
    return (F.pmod(h, F.lit(2_000_001)) - 1_000_000) / 1_000_000.0


_PLANES_CACHE: dict = {}


def _planes_matrix(dim: int, n_planes: int, seed: int):
    """(dim, n_planes) float64 plane-component matrix, identical values to
    ``_plane_component_col``: XXH64 int-lane chain xxhash64(p, j, seed)
    through the numpy kernel, pmod into [-1, 1). Computed once per
    (dim, planes, seed) per process — this is the 'planes derived from a
    seed, nothing broadcast' property kept in the Arrow path."""
    import numpy as np

    from ..functions.xxh64_np import hash_int

    key = (dim, n_planes, seed)
    if key not in _PLANES_CACHE:
        ps = np.arange(n_planes, dtype=np.int64)
        h1 = hash_int(ps, 42)  # per-plane first lane (seed 42, Spark default)
        mat = np.empty((dim, n_planes), dtype=np.float64)
        for j in range(dim):
            h3 = hash_int(seed, hash_int(j, h1)).view(np.int64)
            mat[j] = (h3 % 2_000_001 - 1_000_000) / 1_000_000.0
        _PLANES_CACHE[key] = mat
    return _PLANES_CACHE[key]


def _projections_arrow(vec: Column, dim: int, n_planes: int, seed: int) -> Column:
    """Arrow fast path for ``_projections``: whole-batch accumulation
    ``acc += M[:, j] * planes[j]`` in ascending-j order — the SAME double
    additions in the SAME order as the Spark aggregate fold, so the
    projections (and therefore every sign bit / bucket) are bit-identical
    (asserted in tests/test_similarity.py's blind bucket check). The
    interpreted HOF path evaluates dim x n_planes lambdas per ROW,
    re-hashing the plane components each time; here the planes matrix is
    computed once per process and the batch does dim fused vector ops."""
    import pandas as pd
    from pyspark.sql.types import ArrayType, DoubleType

    def _proj(s):
        import numpy as np

        P = _planes_matrix(dim, n_planes, seed)
        mask = [x is not None and len(x) == dim for x in s]
        valid = [np.asarray(x, dtype=np.float64) for x, ok in zip(s, mask) if ok]
        if valid:
            M = np.stack(valid)
            acc = np.zeros((len(valid), n_planes), dtype=np.float64)
            for j in range(dim):
                acc += M[:, j : j + 1] * P[j]
            rows = iter(acc)
        else:
            rows = iter(())
        return pd.Series(
            [next(rows) if ok else None for ok in mask], index=s.index, dtype=object
        )

    _proj.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(_proj, ArrayType(DoubleType()))(vec)


def _sign_bits(projs: Column, n: int, offset: int = 0) -> Column:
    """Pack sign bits of projs[offset .. offset+n-1] into a long."""
    key = F.lit(0).cast("long")
    for b in range(n):
        key = key + F.when(
            F.element_at(projs, offset + b + 1) > 0,
            F.shiftleft(F.lit(1).cast("long"), b),
        ).otherwise(0)
    return key


def hyperplane_bucket(
    vec: Column, dim: int, n_planes: int = 8, seed: int = 42
) -> Column:
    """LSH bucket id: sign bits of <vec, plane_p> packed into a long."""
    return _sign_bits(_projections(vec, dim, n_planes, seed), n_planes)


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


def _band_keys(vec: Column, dim: int, bands: int, r: int, seed: int) -> Column:
    """array<struct<band:int, key:long>>: per band, the sign bits of r
    hyperplane projections packed into a long. Two vectors are candidates
    iff they agree on ALL r bits of at least one band — the sign-bit analog
    of MinHash banding. P(candidate) for similarity s (bit-agreement
    probability p = 1 - acos(s)/pi): 1 - (1 - p^r)^bands; at bands=6, r=8
    that is ~1.0 for s >= 0.99 and ~2% for random pairs."""
    projs = _projections(vec, dim, bands * r, seed)
    keys = [
        F.struct(
            F.lit(b).alias("band"), _sign_bits(projs, r, offset=b * r).alias("key")
        )
        for b in range(bands)
    ]
    return F.array(*keys)


def embedding_near_dup_pairs(
    emb: DataFrame,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 6,
    rows_per_band: int = 8,
    seed: int = 42,
    arrow_projections: bool = True,
) -> DataFrame:
    """Near-duplicate pairs with cosine >= tau, banded-LSH candidates.

    The 100 TB path (vs the exact all-pairs twin kept as its sf-small
    verifier in harness.q_near_dup_embeddings): the banded explode carries
    only (__id, band, key) — 20 B/row — through the candidate equi-join
    shuffle; vectors are joined back for the (much smaller) deduplicated
    candidate set only, then verified with the exact double-precision
    cosine. Never an O(n^2) cross join.

    persist is load-bearing: the 48-projection band keys and the vectors
    feed both self-join sides plus two join-backs — un-materialized,
    Catalyst project-collapsing would recompute the projections per subtree
    (same recompute shape as dedup._banded_candidate_pairs)."""
    first = emb.select(vec_col).first()
    dim = len(first[vec_col]) if first else 0
    # two projections: the 48-plane projection aggregate lands in its own
    # column first, and the 48 sign-bit references read that column.
    # CollapseProject leaves this split alone (a non-cheap expression
    # referenced more than once is not inlined), so both the Catalyst tree
    # and the generated code contain the aggregate ONCE — collapsing it
    # into _band_keys directly costs ~8 s of plan/codegen compile per
    # fresh query (measured).
    from .dedup import _spread

    proj_fn = _projections_arrow if arrow_projections else _projections
    cos_fn = cosine_arrow if arrow_projections else cosine
    emb = _spread(emb)  # small-SF reads are 1-2 splits; spread the CPU stage
    projected = emb.select(
        F.col(id_col).alias("__id"),
        proj_fn(F.col(vec_col), dim, bands * rows_per_band, seed).alias("__p"),
    )
    # persist the NARROW banding relation only: (id, 6x(int,long)) — ~60 B
    # per row. Caching the vectors alongside (the r2 shape) made the cache
    # materialization the dominant stage; the verify joins the vector
    # column back from the source scan instead, pruned to the candidates.
    base = projected.select(
        "__id",
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    _sign_bits(F.col("__p"), rows_per_band, offset=b * rows_per_band).alias("key"),
                )
                for b in range(bands)
            ]
        ).alias("__bk"),
    ).persist()
    banded = base.select("__id", F.explode("__bk").alias("bk")).select(
        "__id", "bk.band", "bk.key"
    )
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.key") == F.col("b.key"),
                F.col("a.__id") < F.col("b.__id"),
            ],
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    v = emb.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    pairs = (
        cand.join(v.withColumnsRenamed({"__id": "id_a", "__v": "va"}), "id_a")
        .join(v.withColumnsRenamed({"__id": "id_b", "__v": "vb"}), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cos_fn(F.col("va"), F.col("vb")), 6).alias("cosine_sim"),
        )
    )
    return pairs.where(F.col("cosine_sim") >= tau)


def materialize_lsh_buckets(
    emb: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
) -> None:
    """Precompute the hyperplane bucket and write the corpus partitioned by
    it — the index-build step that turns every subsequent ANN query into a
    partition-pruned scan of ~(1+P)/2^P of the data instead of a full pass
    computing buckets on the fly (lsh_ann_topk's docstring caveat, closed).
    One-time cost, amortized over every query; at 10^12 rows the bucketed
    table is the same bytes as the corpus, reshuffled once."""
    first = emb.select(vec_col).first()
    dim = len(first[vec_col]) if first else 0
    (
        emb.withColumn(
            "bucket", hyperplane_bucket(F.col(vec_col), dim, n_planes, seed)
        )
        .repartition(F.col("bucket"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def lsh_ann_topk_prebucketed(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k against a ``materialize_lsh_buckets`` table: the probe set
    (query bucket + all buckets within ``multiprobe_hamming`` bits) is
    enumerated driver-side into an IN-list predicate on the partition
    column, so the scan prunes to those directories — identical results to
    ``lsh_ann_topk`` (same planes, same seed), none of the per-query
    bucket recomputation over the full corpus."""
    dim = len(query_vec)
    qdf = spark.range(1).select(
        F.array(*[F.lit(float(x)) for x in query_vec]).alias("v")
    )
    qb = qdf.select(
        hyperplane_bucket(F.col("v"), dim, n_planes, seed).alias("b")
    ).collect()[0].b
    import itertools

    probes = []
    for h in range(multiprobe_hamming + 1):
        for combo in itertools.combinations(range(n_planes), h):
            b = qb
            for p in combo:
                b ^= 1 << p
            probes.append(b)
    bucketed = spark.read.parquet(path).where(F.col("bucket").isin(probes))
    return cosine_topk(bucketed, query_vec, k, id_col, vec_col)


def ivf_build(
    emb: DataFrame,
    path: str,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_fraction: float = 1.0,
) -> list[list[float]]:
    """IVF index build: k-means coarse quantizer (Spark MLlib, seeded,
    trained on a sample — ``train_fraction`` — because centroids converge
    long before the full corpus is seen at 10^12 rows), then the corpus
    written partitioned by its nearest-centroid list id. Returns the
    centroids (driver-side, k x dim — tiny) for the query path.

    The flat-LSH alternative is ``materialize_lsh_buckets``; IVF adapts
    to the data distribution where hyperplane buckets are data-oblivious."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = emb.withColumn(
        "__features", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    train = feats if train_fraction >= 1.0 else feats.sample(train_fraction, seed=seed)
    model = KMeans(k=k, seed=seed, featuresCol="__features").fit(
        train.select("__features")
    )
    assigned = (
        model.transform(feats)
        .withColumnRenamed("prediction", "list_id")
        .select(id_col, vec_col, "list_id")
    )
    (
        assigned.repartition(F.col("list_id"))
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(path)
    )
    return [[float(x) for x in c] for c in model.clusterCenters()]


def ivf_topk(
    spark,
    path: str,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe: rank centroids by cosine to the query DRIVER-side (k x
    dim floats — no Spark job), then rerank only the ``nprobe`` nearest
    inverted lists via a partition-pruned scan. Candidate fraction ~
    nprobe/k of the corpus, adapting to density unlike hyperplane LSH."""
    import math

    qn = math.sqrt(sum(x * x for x in query_vec))

    def cos(c):
        cn = math.sqrt(sum(x * x for x in c))
        d = sum(a * b for a, b in zip(c, query_vec))
        return d / (cn * qn) if cn and qn else 0.0

    order = sorted(range(len(centroids)), key=lambda i: -cos(centroids[i]))
    probes = order[:nprobe]
    lists = spark.read.parquet(path).where(F.col("list_id").isin(probes))
    return cosine_topk(lists, query_vec, k, id_col, vec_col)


def ivf_build_deterministic(
    emb: DataFrame,
    path: str,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """IVF index build with a DETERMINISTIC, SQL-reproducible coarse
    quantizer: the centers are the k corpus vectors with the smallest
    portable 60-bit hash of their id (first 15 hex chars of md5 — the
    same hash family as SimHash/CMS/HLL), list_id = ascending
    (hash, id) rank. Hash-sampled centers are real data points, so the
    quantizer adapts to the data distribution (unlike formula or
    hyperplane codebooks) while every step — center choice, assignment
    argmin, probe ranking — has an exact DuckDB twin (harness oracle
    ``ann_ivf_topk``). For recall-tuned deployments swap in the trained
    k-means ``ivf_build``; same index layout, same probe path.

    Center selection is orderBy+limit (TakeOrderedAndProject: per
    partition k rows, driver merges — no global sort); assignment is the
    broadcast-join argmin of ``operators/pq.ivf_assign`` (64-term
    left-associated fold, bit-identical across engines); the corpus is
    written partitioned by list_id so probes prune partitions."""
    from .dedup import md5_token_hash
    from .pq import ivf_assign

    spark = emb.sparkSession
    h = md5_token_hash(F.col(id_col).cast("string"))
    crows = (
        emb.select(F.col(id_col), F.col(vec_col))
        .orderBy(h.asc(), F.col(id_col).asc())
        .limit(k)
        .collect()
    )
    if len(crows) < k:
        raise ValueError(
            f"ivf_build_deterministic needs >= k={k} vectors, got {len(crows)}"
        )
    centers = [[float(x) for x in r[1]] for r in crows]
    dim = len(centers[0])
    coarse = spark.createDataFrame(
        [tuple([c] + centers[c]) for c in range(k)],
        ["c"] + [f"g{d}" for d in range(dim)],
    )
    assigned = ivf_assign(
        emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")),
        coarse,
        dim,
    )
    (
        emb.select(F.col(id_col), F.col(vec_col))
        .join(assigned.withColumnRenamed("vec_id", id_col), id_col)
        .repartition(F.col("list_id"))
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(path)
    )
    return centers


def ivf_probe_ids(
    spark, centers: list[list[float]], query_vec: list[float], nprobe: int
) -> list[int]:
    """Rank centers by cosine to the query ENGINE-side (16-row job) with
    the same round(cos, 6) + id tiebreak the corpus rerank uses, so the
    probe choice is reproducible in any engine (driver Python float math
    would be a third float implementation to keep in sync). Returns the
    ``nprobe`` best list ids — nprobe ints, the documented dimension-sized
    collect."""
    cent = spark.createDataFrame(
        [(c, centers[c]) for c in range(len(centers))],
        schema="c int, g array<double>",
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    rows = (
        cent.select("c", F.round(cosine(F.col("g"), q), 6).alias("cs"))
        .orderBy(F.desc("cs"), F.asc("c"))
        .limit(nprobe)
        .collect()
    )
    return [r["c"] for r in rows]


def ivf_topk_deterministic(
    spark,
    path: str,
    centers: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe over a ``ivf_build_deterministic`` index: engine-ranked
    probe lists (see ``ivf_probe_ids``), partition-pruned scan of the
    nprobe lists, exact cosine rerank. Candidate fraction ~ nprobe/k."""
    probes = ivf_probe_ids(spark, centers, query_vec, nprobe)
    lists = spark.read.parquet(path).where(F.col("list_id").isin(probes))
    return cosine_topk(lists, query_vec, k, id_col, vec_col)


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
