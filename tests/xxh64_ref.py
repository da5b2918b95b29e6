"""Pure-Python reference implementation of the public XXH64 algorithm
(Yann Collet's xxHash, BSD — spec at github.com/Cyan4973/xxHash), in the
two entry points Spark's ``xxhash64`` expression uses:

* ``xxh64(data, seed)``      — byte-stream hash (Spark: string/binary
  inputs, hashUnsafeBytes)
* ``xxh64_long(value, seed)``— single 8-byte-lane hash (Spark: integral
  inputs, XXH64.hashLong; Spark promotes int to long)

Spark chains multi-argument ``xxhash64(a, b, ...)`` by feeding each
field's hash as the seed of the next, starting from seed 42.

Purpose: an engine-independent oracle for the hash-based operators
(simhash fingerprints, minhash signatures, LSH band keys) that SQL can't
express — tests recompute them from first principles and require
bit-equality with the Spark expressions.
"""

from __future__ import annotations

MASK = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & MASK
    return (_rotl(acc, 31) * P1) & MASK


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * P1 + P4) & MASK


def _avalanche(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & MASK
    h ^= h >> 29
    h = (h * P3) & MASK
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int = 42) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK
        v2 = (seed + P2) & MASK
        v3 = seed & MASK
        v4 = (seed - P1) & MASK
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + P5) & MASK
    h = (h + n) & MASK
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & MASK
        h = (_rotl(h, 23) * P2 + P3) & MASK
        i += 4
    while i < n:
        h ^= (data[i] * P5) & MASK
        h = (_rotl(h, 11) * P1) & MASK
        i += 1
    return _avalanche(h)


def xxh64_long(value: int, seed: int = 42) -> int:
    """XXH64.hashLong — one 8-byte lane (Spark long/bigint inputs)."""
    h = (seed + P5 + 8) & MASK
    h ^= _round(0, value & MASK)
    h = (_rotl(h, 27) * P1 + P4) & MASK
    return _avalanche(h)


def xxh64_int(value: int, seed: int = 42) -> int:
    """XXH64.hashInt — one 4-byte lane (Spark int/short/byte/bool inputs;
    Spark does NOT promote these to long)."""
    h = (seed + P5 + 4) & MASK
    h ^= ((value & 0xFFFFFFFF) * P1) & MASK
    h = (_rotl(h, 23) * P2 + P3) & MASK
    return _avalanche(h)


def to_i64(u: int) -> int:
    """unsigned 64 -> Java signed long (Spark's xxhash64 return type)."""
    return u - (1 << 64) if u >= 1 << 63 else u


class I32(int):
    """Marker: hash this value as a Spark IntegerType (4-byte lane)."""


def spark_xxhash64(*args, seed: int = 42) -> int:
    """Twin of Spark's ``xxhash64(a, b, ...)``: each field hashed with the
    running hash as seed; str -> UTF-8 bytes, ``I32`` -> 4-byte lane,
    other int -> 8-byte lane (LongType)."""
    h = seed
    for a in args:
        if a is None:
            continue
        if isinstance(a, str):
            h = xxh64(a.encode("utf-8"), h)
        elif isinstance(a, I32):
            h = xxh64_int(a, h)
        elif isinstance(a, int):
            h = xxh64_long(a, h)
        else:
            raise TypeError(type(a))
    return to_i64(h)
