"""Product quantization (PQ) for embedding compression + ANN.

At 10^12 documents a float32[64] embedding column is ~256 TB; PQ stores
M=8 one-byte codes per vector (32× compression) and answers top-k with
asymmetric distance computation (ADC): per query, an M×K table of
query-subvector→centroid distances is built once, and each candidate's
approximate distance is M table lookups — no float vector ever read at
query time (Jégou et al., "Product Quantization for Nearest Neighbor
Search", TPAMI 2011).

Deterministic-by-construction variant: the codebook is a fixed integer
formula over (subspace, centroid, dim) instead of trained k-means —
every engine derives bit-identical centroids, which makes the encode
argmin EXACTLY reproducible (integer codes, no FP-tie ambiguity: ties
break to the lowest centroid id) and lets a SQL oracle verify the whole
path. A production deployment swaps ``formula_codebook`` for trained
centroids; every plan shape below is unchanged.

Scale shape: the codebook is M×K rows (128 here) — always broadcast; the
encode is explode(M) + broadcast join + map-side-combinable argmin
groupBy, one shuffle of (vec_id, s, dist, k) rows; ADC is another
broadcast join (the M×K query table) + one groupBy sum. No all-pairs
join anywhere.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PQ_M = 8          # subspaces
PQ_DS = 8         # dims per subspace (M * DS = embedding dim 64)
PQ_K = 16         # centroids per subspace

# centroid[s][k][d] = ((s*73 + k*151 + d*211 + 17) % 2001) / 1000 - 1  ∈ [-1, 1]
_CB_A, _CB_B, _CB_C, _CB_D, _CB_MOD = 73, 151, 211, 17, 2001


def formula_codebook(
    spark: SparkSession, m: int = PQ_M, k: int = PQ_K, ds: int = PQ_DS
) -> DataFrame:
    """(s, k, c0..c{ds-1}) codebook rows from the integer formula — exact
    doubles, reproducible in any engine."""
    rows = [
        tuple(
            [s, kk]
            + [
                ((s * _CB_A + kk * _CB_B + d * _CB_C + _CB_D) % _CB_MOD) / 1000.0
                - 1.0
                for d in range(ds)
            ]
        )
        for s in range(m)
        for kk in range(k)
    ]
    return spark.createDataFrame(
        rows, ["s", "k"] + [f"c{d}" for d in range(ds)]
    )


def _sub_dist(ds: int):
    """Squared L2 distance of the s-th subvector to a codebook row, as a
    left-associated sum (d ascending) of (v[s*ds+d] - c_d)^2 — the SAME
    fold order the SQL oracle writes out, so both engines produce the
    same double bits and the argmin is tie-free across engines."""
    return reduce(
        add,
        [
            (
                F.get(F.col("embedding"), F.col("s") * ds + d).cast("double")
                - F.col(f"c{d}")
            )
            * (
                F.get(F.col("embedding"), F.col("s") * ds + d).cast("double")
                - F.col(f"c{d}")
            )
            for d in range(ds)
        ],
    )


def pq_encode(
    emb: DataFrame,
    codebook: DataFrame,
    m: int = PQ_M,
    ds: int = PQ_DS,
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, s, code): nearest formula centroid per subspace.

    explode(M) is narrow; the codebook join broadcasts; the argmin is
    ``min(struct(dist, k))`` — map-side combinable, ties to the lowest
    centroid id by struct ordering."""
    sub = emb.select(
        F.col(id_col).alias("vec_id"),
        "embedding",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
    )
    scored = sub.join(F.broadcast(codebook), "s").select(
        "vec_id", "s", _sub_dist(ds).alias("dist"), "k"
    )
    return (
        scored.groupBy("vec_id", "s")
        .agg(F.min(F.struct("dist", "k")).alias("w"))
        .select("vec_id", "s", F.col("w.k").alias("code"))
    )


def train_pq_codebook(
    emb: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    ds: int = PQ_DS,
    iters: int = 4,
    id_col: str = "vec_id",
    train_fraction: float = 1.0,
) -> DataFrame:
    """TRAINED per-subspace codebook (Lloyd k-means), same (s, k,
    c0..c{ds-1}) shape as ``formula_codebook`` so it drops into
    ``pq_encode``/``pq_adc_topk`` unchanged — the deployment path the
    formula codebook stands in for during oracle gating (real centroids
    beat a data-oblivious formula on quantization error, measured in
    tests/test_ann_recall.py).

    Deterministic init, no RNG: centers start from the k corpus vectors
    with the smallest portable md5(id) (the ``ivf_build_deterministic``
    rule). Each Lloyd round is one assignment (the same broadcast-join
    argmin as pq_encode) plus one groupBy mean per (s, code); centroids
    collect driver-side (m·k·ds doubles — tiny) to build the next round's
    broadcast table. Empty clusters keep their previous center. At corpus
    scale train on ``train_fraction`` — centroids converge long before
    10^12 rows are seen."""
    from .dedup import md5_token_hash

    spark = emb.sparkSession
    train = emb if train_fraction >= 1.0 else emb.sample(train_fraction, seed=7)
    h = md5_token_hash(F.col(id_col).cast("string"))
    seeds = (
        train.select(F.col(id_col), F.col("embedding"))
        .orderBy(h.asc(), F.col(id_col).asc())
        .limit(k)
        .collect()
    )
    if len(seeds) < k:
        raise ValueError(
            f"train_pq_codebook needs >= k={k} training vectors, got {len(seeds)}"
        )
    cents = {
        (s, kk): [float(seeds[kk][1][s * ds + d]) for d in range(ds)]
        for s in range(m)
        for kk in range(k)
    }

    def as_df(c):
        return spark.createDataFrame(
            [tuple([s, kk] + c[(s, kk)]) for s in range(m) for kk in range(k)],
            ["s", "k"] + [f"c{d}" for d in range(ds)],
        )

    sub = train.select(
        F.col(id_col).alias("vec_id"),
        "embedding",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
    )
    for _ in range(iters):
        codes = pq_encode(train, as_df(cents), m, ds, id_col)
        means = (
            sub.join(codes, ["vec_id", "s"])
            .groupBy("s", "code")
            .agg(
                *[
                    F.avg(
                        F.get(F.col("embedding"), F.col("s") * ds + d).cast("double")
                    ).alias(f"c{d}")
                    for d in range(ds)
                ]
            )
            .collect()
        )
        for r in means:
            cents[(r["s"], r["code"])] = [float(r[f"c{d}"]) for d in range(ds)]
    return as_df(cents)


def pq_adc_topk(
    emb: DataFrame,
    query_vec_id: int,
    k_out: int = 10,
    m: int = PQ_M,
    ds: int = PQ_DS,
    kc: int = PQ_K,
    id_col: str = "vec_id",
    codebook: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k by ADC against PQ codes.

    The query's M×K distance table is computed ENGINE-SIDE through the
    identical ``_sub_dist`` expression (no driver float math), broadcast,
    and joined to the corpus codes on (s, code); one groupBy sums the M
    lookups. Distances round to 6 decimals for cross-engine hash parity
    (the cosine-score rule); ties break on vec_id. ``codebook`` swaps the
    formula codebook for a trained one (``train_pq_codebook``) — same
    plan shape, the broadcast table just carries different doubles."""
    spark = emb.sparkSession
    cb = codebook if codebook is not None else formula_codebook(spark, m, kc, ds)
    codes = pq_encode(emb, cb, m, ds, id_col)
    qtab = (
        emb.where(F.col(id_col) == query_vec_id)
        .select("embedding", F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"))
        .join(F.broadcast(cb), "s")
        .select("s", F.col("k").alias("code"), _sub_dist(ds).alias("qd"))
    )
    return (
        codes.join(F.broadcast(qtab), ["s", "code"])
        .groupBy("vec_id")
        .agg(F.round(F.sum("qd"), 6).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(k_out)
    )


# ---------------------------------------------------------------------------
# IVF-PQ: coarse inverted lists + residual product quantization — the
# standard composite for 10^12-vector ANN (FAISS IVFADC; Jégou et al. 2011
# §V). The coarse quantizer partitions the corpus into KC inverted lists
# (at scale: the table's physical partitioning — probes prune partitions);
# PQ encodes the RESIDUAL v - coarse[c], which carries far less energy
# than v, so the same code budget quantizes much finer.

IVF_KC = 8       # coarse centroids (inverted lists)
IVF_NPROBE = 2   # lists probed per query

# coarse[c][d] = ((c*131 + d*17 + 7) % 2001)/1000 - 1
_CO_A, _CO_B, _CO_C = 131, 17, 7


def _coarse_val(c: int, d: int) -> float:
    return ((c * _CO_A + d * _CO_B + _CO_C) % _CB_MOD) / 1000.0 - 1.0


def coarse_codebook(spark: SparkSession, kc: int = IVF_KC, dim: int = PQ_M * PQ_DS) -> DataFrame:
    """(c, g0..g{dim-1}) full-width coarse centroids."""
    rows = [tuple([c] + [_coarse_val(c, d) for d in range(dim)]) for c in range(kc)]
    return spark.createDataFrame(rows, ["c"] + [f"g{d}" for d in range(dim)])


def coarse_sub_codebook(
    spark: SparkSession, kc: int = IVF_KC, m: int = PQ_M, ds: int = PQ_DS
) -> DataFrame:
    """(c, s, h0..h{ds-1}) — the same centroids split per subspace, for
    residual encoding joins keyed on (list, subspace)."""
    rows = [
        tuple([c, s] + [_coarse_val(c, s * ds + d) for d in range(ds)])
        for c in range(kc)
        for s in range(m)
    ]
    return spark.createDataFrame(rows, ["c", "s"] + [f"h{d}" for d in range(ds)])


def _full_dist(dim: int):
    """64-term left-associated ||v - g||^2 — a single deterministic
    expression (no groupBy sum), so the coarse argmin is bit-exact and
    tie-free across engines."""
    return reduce(
        add,
        [
            (F.get(F.col("embedding"), d).cast("double") - F.col(f"g{d}"))
            * (F.get(F.col("embedding"), d).cast("double") - F.col(f"g{d}"))
            for d in range(dim)
        ],
    )


def _residual_sub_dist(ds: int):
    """((v[s*ds+d] - h_d) - c_d)^2 summed left-associated: squared L2 of
    the RESIDUAL subvector to a PQ centroid."""
    def term(d):
        r = (
            F.get(F.col("embedding"), F.col("s") * ds + d).cast("double")
            - F.col(f"h{d}")
        )
        return (r - F.col(f"c{d}")) * (r - F.col(f"c{d}"))

    return reduce(add, [term(d) for d in range(ds)])


def ivf_assign(
    emb: DataFrame, coarse: DataFrame, dim: int = PQ_M * PQ_DS, id_col: str = "vec_id"
) -> DataFrame:
    """(vec_id, list_id): nearest coarse centroid — broadcast join against
    KC rows, map-side-combinable argmin, ties to the lowest list id."""
    scored = emb.select(F.col(id_col).alias("vec_id"), "embedding").crossJoin(
        F.broadcast(coarse)
    ).select("vec_id", _full_dist(dim).alias("dist"), "c")
    return (
        scored.groupBy("vec_id")
        .agg(F.min(F.struct("dist", "c")).alias("w"))
        .select("vec_id", F.col("w.c").alias("list_id"))
    )


def ivfpq_encode(
    emb: DataFrame,
    spark: SparkSession | None = None,
    m: int = PQ_M,
    ds: int = PQ_DS,
    kc: int = IVF_KC,
    id_col: str = "vec_id",
    arrow: bool = True,
) -> DataFrame:
    """(vec_id, list_id, s, code): residual PQ codes per inverted list.

    ``arrow=True`` (default) fuses assignment + encoding into one
    zero-shuffle Arrow kernel (``ivfpq_codes_arrow``); the expression
    form below stays as the parity reference and the trained-codebook
    general shape."""
    if arrow:
        return ivfpq_codes_arrow(emb, kc, m, ds, id_col)
    spark = spark or emb.sparkSession
    assign = ivf_assign_arrow(emb, kc, m * ds, id_col=id_col)
    sub = (
        emb.select(F.col(id_col).alias("vec_id"), "embedding")
        .join(assign, "vec_id")
        .select(
            "vec_id",
            "embedding",
            "list_id",
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
        )
    )
    csub = coarse_sub_codebook(spark, kc, m, ds).withColumnRenamed("c", "list_id")
    scored = (
        sub.join(F.broadcast(csub), ["list_id", "s"])
        .join(F.broadcast(formula_codebook(spark, m, PQ_K, ds)), "s")
        .select("vec_id", "list_id", "s", _residual_sub_dist(ds).alias("dist"), "k")
    )
    return (
        scored.groupBy("vec_id", "list_id", "s")
        .agg(F.min(F.struct("dist", "k")).alias("w"))
        .select("vec_id", "list_id", "s", F.col("w.k").alias("code"))
    )


def ivfpq_topk(
    emb: DataFrame,
    query_vec_id: int,
    k_out: int = 10,
    nprobe: int = IVF_NPROBE,
    m: int = PQ_M,
    ds: int = PQ_DS,
    kc: int = IVF_KC,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ search: probe the ``nprobe`` nearest inverted lists, rank
    their members by residual-ADC. At scale the codes table is partitioned
    by list_id, so the probe filter prunes partitions and only the probed
    lists' codes are ever scanned; per candidate the cost is M lookups.

    All distances flow through the same deterministic fold expressions as
    the encode; the final ADC sum rounds to 6 (cosine rule), ties on
    vec_id."""
    spark = emb.sparkSession
    codes = ivfpq_encode(emb, spark, m, ds, kc, id_col)
    q = emb.where(F.col(id_col) == query_vec_id).select("embedding")
    probes = (
        q.crossJoin(F.broadcast(coarse_codebook(spark, kc)))
        .select(_full_dist(m * ds).alias("dist"), "c")
        .orderBy("dist", "c")
        .limit(nprobe)
        .select(F.col("c").alias("list_id"))
    )
    csub = coarse_sub_codebook(spark, kc, m, ds).withColumnRenamed("c", "list_id")
    qtab = (
        q.crossJoin(F.broadcast(probes))
        .select("embedding", "list_id", F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"))
        .join(F.broadcast(csub), ["list_id", "s"])
        .join(F.broadcast(formula_codebook(spark, m, PQ_K, ds)), "s")
        .select("list_id", "s", F.col("k").alias("code"), _residual_sub_dist(ds).alias("qd"))
    )
    return (
        codes.join(F.broadcast(qtab), ["list_id", "s", "code"])
        .groupBy("vec_id")
        .agg(F.round(F.sum("qd"), 6).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(k_out)
    )


def materialize_ivfpq_index(
    emb: DataFrame,
    path: str,
    m: int = PQ_M,
    ds: int = PQ_DS,
    kc: int = IVF_KC,
    id_col: str = "vec_id",
) -> None:
    """Write the residual-PQ codes partitioned by inverted list — the
    index-build step. The float corpus is read ONCE here; afterwards every
    query is a partition-pruned scan of nprobe/KC of a codes table that is
    ~32× smaller than the embeddings (the IVFADC deployment shape).
    ``repartition(list_id)`` keeps file count = #lists, not #lists×#tasks."""
    codes = ivfpq_encode(emb, emb.sparkSession, m, ds, kc, id_col)
    (
        codes.repartition(F.col("list_id"))
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(path)
    )


def ivfpq_topk_prebuilt(
    spark: SparkSession,
    path: str,
    query_df: DataFrame,
    k_out: int = 10,
    nprobe: int = IVF_NPROBE,
    m: int = PQ_M,
    ds: int = PQ_DS,
    kc: int = IVF_KC,
) -> DataFrame:
    """Answer an IVF-PQ query from a prebuilt codes index.

    The nprobe list ids are resolved first (KC-row broadcast argmin — the
    collect is nprobe ints, the same scalar-sized driver hop as the
    similarity thresholds) so the ``list_id IN (...)`` predicate prunes
    index partitions AT THE SCAN — only the probed lists' files are read
    (plan-asserted in tests). Everything else matches ``ivfpq_topk``
    expression-for-expression, so results are identical."""
    q = query_df.select("embedding")
    probe_rows = (
        q.crossJoin(F.broadcast(coarse_codebook(spark, kc)))
        .select(_full_dist(m * ds).alias("dist"), "c")
        .orderBy("dist", "c")
        .limit(nprobe)
        .collect()
    )
    probed = [int(r["c"]) for r in probe_rows]
    codes = spark.read.parquet(path).where(F.col("list_id").isin(probed))
    csub = coarse_sub_codebook(spark, kc, m, ds).withColumnRenamed("c", "list_id")
    qtab = (
        q.crossJoin(
            F.broadcast(
                spark.createDataFrame([(c,) for c in probed], ["list_id"])
            )
        )
        .select(
            "embedding", "list_id",
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
        )
        .join(F.broadcast(csub), ["list_id", "s"])
        .join(F.broadcast(formula_codebook(spark, m, PQ_K, ds)), "s")
        .select("list_id", "s", F.col("k").alias("code"), _residual_sub_dist(ds).alias("qd"))
    )
    return (
        codes.join(F.broadcast(qtab), ["list_id", "s", "code"])
        .groupBy("vec_id")
        .agg(F.round(F.sum("qd"), 6).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(k_out)
    )


def ivf_assign_arrow(
    emb: DataFrame, kc: int = IVF_KC, dim: int = PQ_M * PQ_DS, id_col: str = "vec_id"
) -> DataFrame:
    """(vec_id, list_id) as an Arrow-batched numpy kernel — scan-side
    (no shuffle, no join) where ``ivf_assign`` pays a broadcast join plus
    a groupBy shuffle. A pure-expression form was tried first and
    overflowed janino's 64 KB codegen limit (8 centroids × 64 dims ≈ 1k
    expression nodes → interpreted fallback, 4× slower than the join);
    the kernel accumulates (v[d]-g[d])² in the SAME ascending-d left fold
    as ``_full_dist``, one numpy op per dim vectorized across (rows ×
    centroids), so the distances are bit-identical to the expression/join
    forms (asserted in tests) and np.argmin's first-minimum rule matches
    the (dist, c) struct-min tie break."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import IntegerType

    G = np.array(
        [[_coarse_val(c, d) for d in range(dim)] for c in range(kc)], dtype=np.float64
    )

    def _assign(s: pd.Series) -> pd.Series:
        # null embeddings -> null list_id (never a task failure)
        mask = s.notna().to_numpy()
        out = np.full(len(s), None, dtype=object)
        if mask.any():
            V = np.array([np.asarray(v, dtype=np.float64) for v in s[mask]])
            acc = np.zeros((len(V), kc), dtype=np.float64)
            for d in range(dim):  # left fold: bit-equal to _full_dist
                diff = V[:, d : d + 1] - G[:, d]
                acc += diff * diff
            out[mask] = [int(x) for x in acc.argmin(axis=1)]
        return pd.Series(out, index=s.index, dtype=object)

    _assign.__annotations__ = {"s": pd.Series, "return": pd.Series}
    fn = F.pandas_udf(_assign, IntegerType())
    return emb.select(
        F.col(id_col).alias("vec_id"), fn(F.col("embedding")).alias("list_id")
    )


def ivfpq_codes_arrow(
    emb: DataFrame,
    kc: int = IVF_KC,
    m: int = PQ_M,
    ds: int = PQ_DS,
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, list_id, s, code) with assignment AND residual encoding
    fused into one Arrow kernel — the whole encode becomes a zero-shuffle
    scan (the join form pays a vector re-join plus an argmin groupBy).
    Distances accumulate in the same ascending-d left folds as
    ``_full_dist`` / ``_residual_sub_dist``, so every code is
    bit-identical to the join form (asserted in tests). Null embeddings
    yield null codes rows-for-row, never task failures."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StructField,
        StructType,
    )

    dim = m * ds
    G = np.array(
        [[_coarse_val(c, d) for d in range(dim)] for c in range(kc)], dtype=np.float64
    )
    CB = np.array(
        [
            [
                [
                    ((s * _CB_A + k * _CB_B + d * _CB_C + _CB_D) % _CB_MOD) / 1000.0
                    - 1.0
                    for d in range(ds)
                ]
                for k in range(PQ_K)
            ]
            for s in range(m)
        ]
    )

    schema = StructType(
        [
            StructField("list_id", IntegerType()),
            StructField("codes", ArrayType(IntegerType())),
        ]
    )

    def _k(s_: pd.Series) -> pd.DataFrame:
        mask = s_.notna().to_numpy()
        lid = np.full(len(s_), None, dtype=object)
        codes = np.full(len(s_), None, dtype=object)
        if mask.any():
            V = np.array([np.asarray(v, dtype=np.float64) for v in s_[mask]])
            acc = np.zeros((len(V), kc), dtype=np.float64)
            for d in range(dim):  # left fold: bit-equal to _full_dist
                diff = V[:, d : d + 1] - G[:, d]
                acc += diff * diff
            L = acc.argmin(axis=1)
            R = V - G[L]
            C = np.empty((len(V), m), dtype=np.int32)
            for s in range(m):
                a2 = np.zeros((len(V), CB.shape[1]), dtype=np.float64)
                for d in range(ds):  # left fold: bit-equal to _residual_sub_dist
                    diff = R[:, s * ds + d : s * ds + d + 1] - CB[s][:, d]
                    a2 += diff * diff
                C[:, s] = a2.argmin(axis=1)
            for j, i in enumerate(np.nonzero(mask)[0]):
                lid[i] = int(L[j])
                codes[i] = [int(x) for x in C[j]]
        return pd.DataFrame({"list_id": lid, "codes": codes}, index=s_.index)

    _k.__annotations__ = {"s_": pd.Series, "return": pd.DataFrame}
    fn = F.pandas_udf(_k, schema)
    return (
        emb.select(F.col(id_col).alias("vec_id"), fn(F.col("embedding")).alias("r"))
        .select(
            "vec_id",
            F.col("r.list_id").alias("list_id"),
            F.posexplode(F.col("r.codes")).alias("s", "code"),
        )
    )
