"""Hashing-trick linear text classifier (fastText-style) as pure
column expressions.

Web-corpus curation pipelines gate documents with a cheap linear
classifier over hashed token features (fastText quality/toxicity models
in CCNet/RefinedWeb-style stacks). The inference step is just
``score = Σ_t w[h(t) mod D]`` — a dot product between a sparse binary
feature vector and a dense weight table — so it maps onto Spark as one
``transform`` + ``aggregate`` over the token array: fully JVM-side,
codegen-friendly, no UDF, no weight broadcast needed when the weight
table is a formula.

Integer-exact by construction: token hashes are the portable 60-bit
md5 prefix (same hash as the oracle-checkable SimHash configuration,
operators/dedup.py ``md5_token_hash``), and the demo weight table is a
deterministic integer formula over the bucket index, so Spark and the
DuckDB oracle agree bit-for-bit — no float dot-product drift. A real
deployment swaps ``formula_weight`` for an ``element_at`` into a
broadcast literal array of trained weights; the surrounding plan is
unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_DIM = 4096
# LCG-ish integer weight in [-1_000_000, 1_000_000]: j -> (j*K + B) mod M - H
WEIGHT_MULT = 2654435761  # Knuth multiplicative constant
WEIGHT_ADD = 12345
WEIGHT_MOD = 2_000_001
WEIGHT_HALF = 1_000_000


def token_bucket(token: Column, dim: int = DEFAULT_DIM) -> Column:
    """Portable feature bucket: first 15 hex chars of md5 (60-bit, always
    positive in a long) mod ``dim``. DuckDB twin:
    ``('0x' || substr(md5(tok), 1, 15))::BIGINT % dim``."""
    h = F.conv(F.substring(F.md5(F.encode(token, "UTF-8")), 1, 15), 16, 10).cast("long")
    return h % dim


def formula_weight(bucket: Column) -> Column:
    """Deterministic integer weight per bucket, range ±1e6 (stands in for
    a trained weight row; bucket < 2^12 so bucket*MULT < 2^44 — no BIGINT
    overflow in either engine)."""
    return (bucket * WEIGHT_MULT + WEIGHT_ADD) % WEIGHT_MOD - WEIGHT_HALF


def hashed_linear_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = DEFAULT_DIM,
    weights: "list[int] | None" = None,
) -> DataFrame:
    """Per-document linear score: one pass tokenize -> bucket -> weight ->
    sum. Returns (doc_id, feat_sum, n_tokens, label) where ``label`` is
    'keep' iff the mean weight is non-negative (feat_sum >= 0 given
    n_tokens > 0). All integer columns — hash-stable across engines.

    ``weights`` is the TRAINED-model import seam: a dense length-``dim``
    integer weight table (e.g. a quantized fastText linear layer). It
    ships as ONE array literal (``F.lit(list)`` is a single Literal node
    — no 4096-branch when-chain, no janino 64 KB risk) and the lookup is
    ``element_at``; plan shape is identical to the formula default, still
    zero-shuffle. None keeps the deterministic formula weights the SQL
    oracles re-derive.

    Narrow plan: no shuffle at all (per-row map), so at 100 TB this is a
    pure scan-side gate that fuses into whatever pipeline follows it.
    """
    if weights is not None:
        if len(weights) != dim:
            raise ValueError(f"weights must have length dim={dim}, got {len(weights)}")
        wtab = F.lit([int(w) for w in weights])

        def weight_of(bucket):
            return F.element_at(wtab, (bucket + 1).cast("int")).cast("long")

    else:
        weight_of = formula_weight
    tokens = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    weights_col = F.transform(tokens, lambda t: weight_of(token_bucket(t, dim)))
    feat_sum = F.aggregate(
        weights_col, F.lit(0).cast("long"), lambda acc, w: acc + w
    )
    n_tokens = F.size(tokens).cast("long")
    return df.select(
        F.col(id_col).alias("doc_id"),
        feat_sum.alias("feat_sum"),
        n_tokens.alias("n_tokens"),
        F.when(feat_sum >= 0, F.lit("keep")).otherwise(F.lit("drop")).alias("label"),
    )
