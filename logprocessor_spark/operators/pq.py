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


def pq_adc_topk(
    emb: DataFrame,
    query_vec_id: int,
    k_out: int = 10,
    m: int = PQ_M,
    ds: int = PQ_DS,
    kc: int = PQ_K,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k by ADC against PQ codes.

    The query's M×K distance table is computed ENGINE-SIDE through the
    identical ``_sub_dist`` expression (no driver float math), broadcast,
    and joined to the corpus codes on (s, code); one groupBy sums the M
    lookups. Distances round to 6 decimals for cross-engine hash parity
    (the cosine-score rule); ties break on vec_id."""
    spark = emb.sparkSession
    cb = formula_codebook(spark, m, kc, ds)
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
