"""Count-min sketch: mergeable frequency estimation + heavy hitters.

At 10^12 documents the exact token-frequency table (``vocab_topk``) is a
full groupBy over every token instance; a count-min sketch (Cormode &
Muthukrishnan 2005) answers "which tokens exceed THETA occurrences, and
roughly how many" from a fixed d×w counter grid that merges by cell-wise
addition — the streaming/partitioned-corpus shape: each partition
sketches locally, sketches add, queries never touch raw tokens again.
The one-sided guarantee (est ≥ true; est ≤ true + εN with prob 1-δ)
makes it a SUPERSET filter for heavy hitters — candidates it returns are
verified cheaply, candidates it misses cannot exist. Point queries
(``cms_estimate``) never touch raw tokens; heavy-hitter ENUMERATION
necessarily rescans the token stream for candidates, but scan-side only
— the hot-bucket gate in ``cms_heavy_hitters`` keeps the full vocabulary
out of any exchange (an external candidate list via ``cms_estimate``
remains the zero-rescan path).

Deterministic by construction: the d hash rows use the portable 60-bit
md5 prefix with an integer row-salt (same hash family as the
oracle-checkable SimHash / classifier), so a SQL engine reproduces every
counter and every estimate bit-for-bit — the whole sketch is
hash-gate-checkable, unusual for a probabilistic structure.

Scale shape: the grid build is explode → posexplode(d rows) → one
groupBy of (row, bucket) — map-side combinable into ≤ d·w cells per
task; the grid (d·w rows, ~10 KB here) broadcasts for estimation, so
point queries are scan-side lookups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4      # d independent hash rows
CMS_WIDTH = 512    # w buckets per row


def _salted_bucket(key: Column, salt: str, modulus: int) -> Column:
    """THE portable salted hash bucket both sketch families use:
    md5(salt || key) first 15 hex chars mod ``modulus`` — DuckDB twin:
    ``('0x' || substr(md5(salt || key), 1, 15))::BIGINT % modulus``.
    One definition so a portability tweak cannot desynchronize one
    family's SQL-oracle parity."""
    h = F.conv(
        F.substring(F.md5(F.encode(F.concat(F.lit(salt), key), "UTF-8")), 1, 15),
        16,
        10,
    ).cast("long")
    return h % modulus


def _cms_bucket(token: Column, row: int, width: int) -> Column:
    """CMS row bucket: salt '<row>:'."""
    return _salted_bucket(token, f"{row}:", width)


def cms_build(
    docs: DataFrame,
    text_col: str = "text",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(row, bucket, cnt) counter grid over the corpus token stream.
    Merging two corpora's sketches is a union + groupBy sum on the same
    (row, bucket) key — the mergeability that makes this the partitioned
    /streaming shape."""
    tok = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("token")
    ).where(F.col("token") != "")
    cells = tok.select(
        F.posexplode(
            F.array(*[_cms_bucket(F.col("token"), r, width) for r in range(depth)])
        ).alias("row", "bucket")
    )
    return cells.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(token, est): min over the d rows of the key's counter — the CMS
    point estimate. The sketch is grid-sized, so it broadcasts; per key
    the cost is d lookups."""
    probes = keys.select(
        F.col(key_col).alias("token"),
        F.posexplode(
            F.array(*[_cms_bucket(F.col(key_col), r, width) for r in range(depth)])
        ).alias("row", "bucket"),
    )
    return (
        # LEFT join + coalesce(0): a probe bucket with no cell means no
        # token ever hashed there — the estimate for an unseen key must
        # be 0, not "min over the buckets that happen to exist" (which
        # inflates) or a silently missing output row (inner join).
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def cms_heavy_hitters(
    docs: DataFrame,
    threshold: int,
    text_col: str = "text",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    cache_registry: list | None = None,
) -> DataFrame:
    """(token, est) for every distinct token whose CMS estimate reaches
    ``threshold``, heaviest first (ties lexicographic). est ≥ true count
    always, so no true heavy hitter is ever missed; over-threshold
    false positives are the documented CMS trade (verify exactly against
    the corpus if exactness matters — ``vocab_topk`` is that pass).

    Scale shape (candidate generation WITHOUT a full-vocab shuffle): a
    token's estimate reaches ``threshold`` iff ALL d of its buckets are
    hot (cnt ≥ threshold) — est is the min over rows. Hot cells number at
    most d·N/threshold (and never more than the d·w grid that already
    broadcasts for estimation), so candidates are gated SCAN-SIDE by d
    broadcast semi-joins against the per-row hot-bucket sets; only
    occurrences of qualifying tokens ever reach the dedup exchange (whose
    map-side partial agg bounds shuffle rows at partitions × heavy
    tokens). The output is identical to enumerating the full vocabulary —
    the gate is exact, not a heuristic — but the corpus-wide token
    distinct() that a naive probe needs never happens."""
    # the grid feeds d+1 consumers (hot-bucket gates + estimation), so it
    # persists; long-lived sessions pass cache_registry and unpersist the
    # handle once materialized — same contract as kn_*_probs
    sketch = cms_build(docs, text_col, depth, width).persist()
    if cache_registry is not None:
        cache_registry.append(sketch)
    hot = sketch.where(F.col("cnt") >= threshold)
    occ = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("token")
    ).where(F.col("token") != "")
    for r in range(depth):
        hot_r = hot.where(F.col("row") == r).select(F.col("bucket").alias(f"__hb{r}"))
        occ = occ.join(
            F.broadcast(hot_r),
            _cms_bucket(F.col("token"), r, width) == F.col(f"__hb{r}"),
            "leftsemi",
        )
    keys = occ.distinct()
    est = cms_estimate(sketch, keys, "token", depth, width)
    return est.where(F.col("est") >= threshold).orderBy(
        F.desc("est"), F.asc("token")
    )


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007): mergeable distinct-count sketch.

HLL_M = 64                 # registers (p = 6)
HLL_ALPHA = 0.709          # alpha_64
_HLL_WBITS = 54            # 60-bit hash minus 6 bucket bits


def hll_registers(
    docs: DataFrame, key: Column, m: int = HLL_M, by: tuple[str, ...] = ()
) -> DataFrame:
    """(b, reg): per-bucket max leading-rank over the portable 60-bit md5
    hash — the HLL register table. Merging sketches is a union + groupBy
    max, cell-for-cell, like the CMS grid. Integer-exact: the rank uses
    bit_length via ``bin()`` string length (no float log2, whose rounding
    misorders values just below powers of two), so a SQL engine rebuilds
    every register bit-for-bit.

    ``by`` keeps one sketch PER GROUP (e.g. per lang) — the grouped-report
    composition: output (*by, b, reg), still one map-side-combinable
    groupBy, shuffle rows ≤ groups × m."""
    h = F.conv(F.substring(F.md5(F.encode(key, "UTF-8")), 1, 15), 16, 10).cast("long")
    b = h % m
    # integer shift, NOT `/` (double division loses bits above 2^53)
    p_bits = (m - 1).bit_length()
    assert m == 1 << p_bits, "m must be a power of two"
    w = F.shiftright(h, p_bits)
    # rho = position of the first 1-bit in a fixed 54-bit window, 1-based;
    # all-zero w -> the max rank (WBITS + 1)
    rho = F.when(w == 0, F.lit(_HLL_WBITS + 1)).otherwise(
        _HLL_WBITS + 1 - F.length(F.bin(w))
    )
    return (
        docs.where(key.isNotNull())
        .select(*by, b.alias("b"), rho.alias("rho"))
        .groupBy(*by, "b")
        .agg(F.max("rho").alias("reg"))
    )


def hll_estimate(
    registers: DataFrame, m: int = HLL_M, by: tuple[str, ...] = ()
) -> DataFrame:
    """(*by, n_distinct_est) — one row per group (one row total without
    ``by``): the HLL estimator with the standard small-range
    linear-counting correction. Registers absent from the table count as
    zero (their 2^-0 = 1 term is added analytically), so the estimate
    works straight off the sparse groupBy output. Rounded to 2 decimals —
    the float sum's order noise is ~1 ulp."""
    agg = registers.groupBy(*by).agg(
        # coalesce: F.sum over zero rows is NULL, and an empty register
        # table (empty corpus / all-null keys) must estimate 0, not NULL
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), -F.col("reg"))), F.lit(0.0)
        ).alias("z_present"),
        F.count(F.lit(1)).alias("m_present"),
    )
    z = F.col("z_present") + (F.lit(m) - F.col("m_present"))  # absent -> 2^0
    zeros = F.lit(m) - F.col("m_present")
    raw = F.lit(HLL_ALPHA) * F.lit(float(m * m)) / z
    est = F.when(F.col("m_present") == 0, F.lit(0.0)).when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(*by, F.round(est, 2).alias("n_distinct_est"))


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970): mergeable set-membership sketch — the crawl
# pipeline's "have we already fetched/kept this URL (or shingle)?"
# primitive (Gopher's and Common-Crawl-scale dedup stacks gate recrawls
# with exactly this structure). Same portable salted-md5 hash family as
# the CMS, so every bit position — and therefore every membership answer
# — has an exact SQL twin: a hash-gate-checkable probabilistic filter.

BLOOM_K = 4        # hash functions
BLOOM_M = 4096     # bits


def _bloom_bit(key: Column, row: int, m_bits: int) -> Column:
    """Bloom bit position: salt 'b<row>:' — the 'b' prefix keeps the
    family disjoint from the CMS rows."""
    return _salted_bucket(key, f"b{row}:", m_bits)


def bloom_build(
    keys: DataFrame,
    key_col: str,
    k: int = BLOOM_K,
    m_bits: int = BLOOM_M,
) -> DataFrame:
    """(bit,) — the set bit positions of a Bloom filter over the
    distinct values of ``keys[key_col]`` (NULL keys are ignored — NULL
    is "no key", not a member). ≤ m rows regardless of corpus size, so
    the filter broadcasts; merging two corpora's filters is a plain
    union+distinct on the same positions (bitwise OR in table form).

    Scale shape: one narrow k-way posexplode per key then a distinct on
    ≤ m values — map-side combinable to ≤ m rows per task before any
    exchange."""
    return (
        keys.where(F.col(key_col).isNotNull())
        .select(
            F.explode(
                F.array(*[_bloom_bit(F.col(key_col), r, m_bits) for r in range(k)])
            ).alias("bit")
        )
        .distinct()
    )


def bloom_pack(bloom: DataFrame, m_bits: int = BLOOM_M) -> list[int]:
    """Collect the set-bit relation into the packed m/64-long bitset a
    Bloom filter actually IS (m=4096 -> 64 longs = 512 bytes). Driver-
    side by design: the filter is the compact value you ship to every
    worker; collecting ≤ m rows is the build's final, bounded step.
    Words are signed-64 so they round-trip as Spark longs."""
    if m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    words = [0] * (m_bits // 64)
    for r in bloom.select("bit").collect():
        b = int(r["bit"])
        if not 0 <= b < m_bits:
            raise ValueError(f"bit {b} out of range for m_bits={m_bits}")
        words[b >> 6] |= 1 << (b & 63)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_probe(
    df: DataFrame,
    bloom: "DataFrame | list[int]",
    key_col: str,
    k: int = BLOOM_K,
    m_bits: int = BLOOM_M,
) -> DataFrame:
    """Adds ``maybe_member``: true iff ALL k of the key's bit positions
    are set. No false negatives (a built key always probes true); false
    positives at the standard (1 - e^{-kn/m})^k rate — the caller
    verifies positives exactly if exactness matters, which is the Bloom
    contract (probe-to-skip, never probe-to-assert).

    Scale shape: the packed bitset (``bloom_pack``; a DataFrame is
    packed here) rides along as ONE array literal and each row tests its
    k bits with shift/mask expressions — zero joins, zero shuffle, O(1)
    per probe, fuses into whatever scan follows. Rows with NULL keys
    return maybe_member = false."""
    words = bloom_pack(bloom, m_bits) if isinstance(bloom, DataFrame) else bloom
    if len(words) != m_bits // 64:
        raise ValueError(
            f"packed filter has {len(words)} words, expected {m_bits // 64}"
        )
    wl = F.lit(words)

    def bit_set(bit: Column) -> Column:
        word = F.element_at(wl, (F.call_function("div", bit, F.lit(64)) + 1).cast("int"))
        return (
            F.call_function(
                "shiftrightunsigned", word, F.pmod(bit, F.lit(64)).cast("int")
            ).bitwiseAND(F.lit(1))
            == 1
        )

    tests = [
        bit_set(_bloom_bit(F.col(key_col), r, m_bits)) for r in range(k)
    ]
    member = tests[0]
    for t in tests[1:]:
        member = member & t
    return df.withColumn("maybe_member", F.coalesce(member, F.lit(False)))
