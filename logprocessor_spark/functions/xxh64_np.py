"""Vectorized XXH64 lanes (numpy, uint64 wrap-around arithmetic) — the
Arrow fast path for MinHash signatures.

Spark evaluates higher-order functions (``transform``/``aggregate``
lambdas) interpreted — they are excluded from whole-stage codegen — so
the signature fold ``min_i xxhash64(shingle, i)`` costs ~200 ns per hash
eval and dominates the minhash dedup wall. The same arithmetic runs here
as a handful of numpy vector ops over an entire Arrow batch, bit-equal
to Spark's ``xxhash64`` (asserted directly in
tests/test_dedup.py::test_arrow_signature_bit_equals_expression_and_reference
against both the Spark expression path and the scalar reference in
tests/xxh64_ref.py).

Spark's ``xxhash64(col_long, lit_int)`` chains two fixed-width lanes:
``h = hashLong(value, seed=42)`` then ``h = hashInt(i, h)`` — both are
pure 64-bit mults/rotates/xors, which numpy uint64 reproduces exactly
(overflow wraps mod 2^64 like Java longs).
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _avalanche(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    h = h ^ (h >> np.uint64(32))
    return h


def hash_long(values: np.ndarray, seed) -> np.ndarray:
    """XXH64.hashLong over a uint64 array (Spark long-input lane).
    ``seed`` may be a scalar or an array broadcastable to ``values``."""
    h = np.uint64(seed) + _P5 + np.uint64(8) if np.isscalar(seed) else (
        np.asarray(seed, dtype=np.uint64) + _P5 + np.uint64(8)
    )
    k = _rotl(values * _P2, 31) * _P1
    h = h ^ k
    h = _rotl(h, 27) * _P1 + _P4
    return _avalanche(h)


def hash_int(value, seeds) -> np.ndarray:
    """XXH64.hashInt: int32 value(s) under seed(s); either side may be a
    scalar or an array (numpy broadcasting) — the chained-seed direction
    minhash needs AND the varying-value direction plane derivation needs."""
    with np.errstate(over="ignore"):  # uint64 wrap-around is the point
        h = np.asarray(seeds, dtype=np.uint64) + _P5 + np.uint64(4)
        v = np.asarray(value, dtype=np.int64).astype(np.uint64) & np.uint64(0xFFFFFFFF)
        h = h ^ (v * _P1)
        h = _rotl(h, 23) * _P2 + _P3
        return _avalanche(h)


def simhash_pack_batch(hash_lists: "list[np.ndarray]") -> np.ndarray:
    """(n_rows ragged token-hash arrays) -> int64 simhash fingerprints,
    bit-equal to the Spark expression in operators.dedup.simhash: bit b of
    the output is 1 iff sum over tokens of (+1 if bit b of hash else -1)
    is positive. Vectorized: one (N_tokens, 64) bit expansion + a
    segmented sum (``np.add.reduceat``) per batch."""
    lens = np.fromiter((len(h) for h in hash_lists), dtype=np.int64)
    if len(lens) == 0:
        return np.empty(0, dtype=np.int64)
    flat = (
        np.concatenate([np.asarray(h, dtype=np.int64) for h in hash_lists])
        if lens.sum()
        else np.empty(0, dtype=np.int64)
    )
    flat_u = flat.view(np.uint64) if flat.size else flat.astype(np.uint64)
    bits = ((flat_u[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
        np.int64
    )
    votes_flat = 2 * bits - 1  # +1 / -1 per (token, bit)
    offsets = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    # reduceat over an empty segment grabs the neighbor — callers guarantee
    # >= 1 token per row (split always yields >= 1 element; null rows are
    # handled as None before this kernel)
    if (lens == 0).any():
        raise ValueError("empty token set — upstream guarantees >= 1")
    votes = np.add.reduceat(votes_flat, offsets, axis=0)  # (n_rows, 64)
    packed_u = ((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
        axis=1, dtype=np.uint64
    )
    return packed_u.view(np.int64)


def minhash_signatures_batch(
    shingle_lists: "list[np.ndarray]", num_hashes: int = 32
) -> np.ndarray:
    """(n_rows ragged shingle arrays) -> int64 matrix (n_rows, num_hashes)
    where out[r, i] = min over shingles s of xxhash64(s, i), bit-equal to
    the Spark expression. Fully vectorized: one flat hash pass per seed
    plus a segmented min (`np.minimum.reduceat`)."""
    lens = np.fromiter((len(s) for s in shingle_lists), dtype=np.int64)
    if len(lens) == 0:
        return np.empty((0, num_hashes), dtype=np.int64)
    if (lens == 0).any():
        # reduceat on an empty segment would grab the next row's value —
        # fail loudly instead of silently corrupting (upstream shingling
        # guarantees >= 1 shingle per doc)
        raise ValueError("empty shingle set — upstream guarantees >= 1")
    flat = (
        np.concatenate([np.asarray(s, dtype=np.int64) for s in shingle_lists])
        if lens.sum()
        else np.empty(0, dtype=np.int64)
    )
    flat_u = flat.view(np.uint64) if flat.size else flat.astype(np.uint64)
    offsets = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    out = np.empty((len(lens), num_hashes), dtype=np.int64)
    # lane 1 is seed-independent: hash each shingle once under seed 42
    h1 = hash_long(flat_u, 42)
    for i in range(num_hashes):
        h2 = hash_int(i, h1).view(np.int64)
        # signed min matches Spark's least() over longs
        out[:, i] = np.minimum.reduceat(h2, offsets)
    return out
