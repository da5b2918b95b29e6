"""Deduplication operators for training-data pipelines.

Five strategies, all shuffle-conscious (the join/groupBy keys are what make
or break these at 10^9+ documents):

* exact            — hash-groupBy on md5(text): shuffle key is 32 bytes,
                     never the document itself.
* minhash_lsh      — word-shingles -> seeded-hash minhash signature ->
                     banded LSH bucket join -> exact Jaccard verify.
                     Candidate generation is equi-join on (band, band_hash):
                     no O(n^2) cross join ever materializes.
* simhash          — 64-bit sign-of-weighted-bit-sums fingerprint computed
                     with higher-order functions (aggregate/transform, no
                     UDF); near-dup candidates via 16-bit chunk banding
                     (Hamming<=3 guarantees >=1 of 4 chunks equal).
* ngram_jaccard    — exact Jaccard on char-n-gram sets for candidate pairs.
* embedding cosine — see similarity.py (near_dup_pairs reuses its LSH).

All functions return DataFrames and compose with the pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per distinct text. Two-step: (1) min-id per
    md5 group — map-side combinable agg; (2) semi-join winners back.
    The md5 collision risk at 10^12 docs is ~2^-50 — acceptable; switch to
    (md5, length) pair key to drive it lower for free."""
    key = F.md5(F.encode(F.col(text_col), "UTF-8")).alias("__k")
    winners = df.select(key, F.col(id_col)).groupBy("__k").agg(
        F.min(id_col).alias(id_col)
    )
    return df.join(winners, on=id_col, how="leftsemi")


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Duplicate clusters: (fingerprint, n_dupes, keeper_id) for groups >1."""
    return (
        df.groupBy(F.md5(F.encode(F.col(text_col), "UTF-8")).alias("fingerprint"))
        .agg(F.count("*").alias("n_dupes"), F.min(id_col).alias("keeper_id"))
        .where(F.col("n_dupes") > 1)
    )


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles as array<string> (native HOFs).

    ANSI-safe for docs shorter than k words: ``try_element_at`` yields NULL
    past the end (``element_at`` would throw under Spark 4's default ANSI
    mode) and ``concat_ws`` skips NULLs, so a short doc contributes one
    shingle made of all its words instead of aborting the job."""
    words = F.split(F.trim(F.lower(text)), r"\s+")
    n = F.size(words)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.try_element_at(words, (i + j).cast("int")) for j in range(k)])
    )
    # NULL text -> NULL shingles (not a degenerate [""] set): null docs
    # must never pair with each other downstream
    return F.when(text.isNotNull(), F.array_distinct(sh))


def char_ngrams(text: Column, n: int = 5) -> Column:
    """Distinct character n-grams as array<string>; NULL text -> NULL."""
    ln = F.length(text)
    idx = F.sequence(F.lit(1), F.greatest(ln - (n - 1), F.lit(1)))
    return F.when(
        text.isNotNull(),
        F.array_distinct(F.transform(idx, lambda i: F.substring(text, i, n))),
    )


def split_words(text: Column) -> Column:
    """Lower-cased whitespace tokenization; NULL text -> NULL array."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def word_shingle_hashes_from(words: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingle hashes (``xxhash64(w1..wk)``) from a
    word-array column, never materializing the shingle string.

    Performance contract: pass a PRE-BOUND attribute (project the split
    into its own column first). Spark evaluates HOF lambdas interpreted,
    re-evaluating every *captured* subexpression per element per reference
    — a split captured here runs 3x per shingle (measured 13.9 s vs 1.1 s
    for the sf0.1 signature stage). Catalyst's CollapseProject leaves the
    two projections separate exactly because the split is non-cheap and
    multiply-referenced, so the binding survives optimization.

    try_element_at: NULL past the end (ANSI-safe for docs with < k words);
    xxhash64 skips NULL inputs, so a short doc yields one well-defined
    hash over the words it has. NULL words -> NULL (an all-NULL tuple
    would hash to the bare seed, colliding every null doc)."""
    n = F.size(words)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.when(
        words.isNotNull(),
        F.array_distinct(
            F.transform(
                idx,
                lambda i: F.xxhash64(
                    *[F.try_element_at(words, (i + j).cast("int")) for j in range(k)]
                ),
            )
        ),
    )


def word_shingle_hashes(text: Column, k: int = 3) -> Column:
    """One-expression convenience form of ``word_shingle_hashes_from``
    (identical values). Hot paths should use the two-projection form —
    see its performance contract."""
    return word_shingle_hashes_from(split_words(text), k)


_LONG_MAX = (1 << 63) - 1


def _spread(df: DataFrame) -> DataFrame:
    """Give the CPU-bound shingle/signature stage enough partitions to use
    every core: a small-SF corpus read is often 1-2 parquet splits, which
    would pin the dominant compute to 1-2 tasks (measured: the sf0.1
    shingle scan ran 2-way on 32 cores, 11.6 s instead of ~1 s). No-op
    when the source already has >= defaultParallelism partitions — always
    true for a multi-split cluster read, so at scale this adds nothing.

    Cost note: ``df.rdd`` forces analysis + physical planning of the
    upstream plan on the driver (no job runs). That is milliseconds for
    these plans and the price of deciding correctly — unconditionally
    repartitioning would put a full shuffle in front of every billion-row
    cluster read, which is far worse than a driver-side planning pass."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: per seed i, min over shingles of xxhash64(s, i).
    Pure expressions — the signature computes inside the scan stage.
    ``shingles`` may be array<string> or (cheaper) array<long> from
    ``word_shingle_hashes``: hashing a long per seed beats re-hashing the
    shingle text num_hashes times.

    ONE ``aggregate`` pass over the shingles (per shingle, ``zip_with``
    folds all seeds' hashes into the running minima) — identical values
    to a seed-by-seed loop (min is order-free) with an expression tree
    O(1) in num_hashes instead of O(num_hashes) separate aggregates,
    which is what plan/codegen compile time scales with. Empty shingle
    arrays (cannot occur: ``split`` yields >= 1 element) would produce
    LONG_MAX entries rather than NULLs."""
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    return F.aggregate(
        shingles,
        F.array_repeat(F.lit(_LONG_MAX).cast("long"), num_hashes),
        lambda acc, s: F.zip_with(
            acc,
            F.transform(seeds, lambda i: F.xxhash64(s, i)),
            lambda a, b: F.least(a, b),
        ),
    )


def minhash_signature_arrow(shingles: Column, num_hashes: int = 32) -> Column:
    """Arrow fast path for ``minhash_signature``: bit-identical values
    (tests assert equality with both the Spark expression and the scalar
    XXH64 reference), computed as numpy vector ops over whole Arrow
    batches instead of Spark's interpreted HOF evaluation — measured ~5x
    on the signature stage, which dominates minhash dedup. This is the
    'Pandas UDFs beat row-at-a-time by 10-100x' lever applied to a custom
    hash kernel; the expression path remains the no-Python fallback."""
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType

    from ..functions.xxh64_np import minhash_signatures_batch

    def _sig(s):
        # NULL text -> NULL shingle array arrives here as None (empty is
        # impossible from shingling but guarded the same way): emit a NULL
        # signature, matching the expression path's NULL propagation — one
        # null doc must degrade to one dropped row, never a task failure.
        valid = [x for x in s if x is not None and len(x) > 0]
        sigs = iter(minhash_signatures_batch(valid, num_hashes)) if valid else iter(())
        return pd.Series(
            [next(sigs) if (x is not None and len(x) > 0) else None for x in s],
            index=s.index,
            dtype=object,
        )

    # annotations set explicitly: `from __future__ import annotations`
    # stringifies inline hints, which pandas_udf can't resolve here
    _sig.__annotations__ = {"s": pd.Series, "return": pd.Series}
    sig = F.pandas_udf(_sig, ArrayType(LongType()))
    return sig(shingles)


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def _band_keys(base: DataFrame, bands: int, r: int) -> DataFrame:
    """(__id, __sig, ...) -> exploded LSH band keys (__id, band, bhash).

    The band hash chains the r signature elements straight through
    xxhash64 — no slice().cast(string) render (that allocated a formatted
    string per row x band; hashing the longs directly is pure arithmetic).
    Output rows are 24 bytes: this is the ONLY relation that crosses the
    candidate-join shuffle."""
    return base.select(
        "__id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.try_element_at(F.col("__sig"), F.lit(b * r + i + 1))
                                for i in range(r)
                            ]
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("__id", "bk.band", "bk.bhash")


def _banded_candidate_pairs(base: DataFrame, bands: int, r: int) -> DataFrame:
    """(__id, __sh, __sig) -> verified candidate pairs (id_a, id_b, sh_a, sh_b).

    Scale design: the banded explode carries ONLY (__id, band, bhash) — 24
    bytes/row — through the candidate self-join shuffle; the heavy shingle
    arrays are joined back afterwards, and only for the (much smaller)
    deduplicated candidate set.

    Materialization is load-bearing, not an optimization nicety: ``base``
    appears on BOTH sides of the self-join plus two shingle join-backs, and
    Catalyst's project-collapsing would otherwise inline the full
    shingle+signature expression into every one of those subtrees (8 band
    slices x 2 sides x 2 join-backs ≈ 18 re-evaluations per row — measured
    95% of round-1's bench wall). ``persist`` pins the tiny
    (__id, __sh, __sig) relation so the signature computes exactly once.
    SQL caches are NOT garbage-collected — long-lived sessions release
    them explicitly (the streaming gate clears per micro-batch; the bench
    clears between timed runs); one-shot queries leave it to session
    teardown. At cluster scale the same role is played by stage-writing
    the base (or just the 24 B/row banded table) to storage between
    candidate generation and verification."""
    # NULL docs (null text -> null shingles -> null signature, on both the
    # expression and Arrow paths) cannot be near-duplicates of anything;
    # dropping them HERE keeps them out of the band join, where a null
    # signature would otherwise hash every band to the seed constant and
    # collide all null docs into one n^2 candidate bucket.
    #
    # ORDER MATTERS: persist FIRST, filter on top of the cache. A filter on
    # __sig below the persist gets pushed through the repartition and the
    # source union, inlining the full signature UDF + shingle expression
    # into the (few-task) scan stage and evaluating it twice per row —
    # measured 8 s of the sf0.1 wall. Above the InMemoryRelation boundary
    # the filter just reads the cached column.
    base = base.persist().where(
        F.col("__sh").isNotNull() & F.col("__sig").isNotNull()
    )
    banded = _band_keys(base, bands, r)

    cand_ids = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bhash") == F.col("b.bhash"),
                F.col("a.__id") < F.col("b.__id"),
            ],
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sh = base.select("__id", "__sh")
    return (
        cand_ids.join(sh.withColumnsRenamed({"__id": "id_a", "__sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"__id": "id_b", "__sh": "sh_b"}), "id_b")
    )


def _minhash_base(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int,
    num_hashes: int,
    arrow_signature: bool,
) -> DataFrame:
    """(id, text, ...) -> (__id, __sh, __sig): the shared front half of
    every minhash path. Two projections: bind the split ONCE per row, then
    shingle from the bound attribute (see word_shingle_hashes_from's
    performance contract)."""
    sig_fn = minhash_signature_arrow if arrow_signature else minhash_signature
    return (
        _spread(df)
        .select(
            F.col(id_col).alias("__id"),
            split_words(F.col(text_col)).alias("__w"),
        )
        .select(
            "__id", word_shingle_hashes_from(F.col("__w"), shingle_k).alias("__sh")
        )
        .withColumn("__sig", sig_fn(F.col("__sh"), num_hashes))
    )


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    arrow_signature: bool = True,
) -> DataFrame:
    """Near-duplicate pairs (id_a, id_b, jaccard_sim) with sim >= threshold.

    rows-per-band r = num_hashes/bands; LSH catch probability at the
    threshold ~ 1-(1-t^r)^b. Candidates come from an equi-join on
    (band_idx, xxhash64 of the band slice); verification is exact Jaccard
    on the hashed shingle sets (collision odds ~2^-64 per shingle pair —
    set semantics are unchanged). Shingles are hashed longs end-to-end:
    no shingle strings are built, and the band join shuffles 24-byte rows."""
    r = num_hashes // bands
    base = _minhash_base(df, text_col, id_col, shingle_k, num_hashes, arrow_signature)
    cand = _banded_candidate_pairs(base, bands, r)
    return (
        cand.withColumn("jaccard_sim", jaccard(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", F.round("jaccard_sim", 4).alias("jaccard_sim"))
    )


def resolve_dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over a near-dup pair set: (doc_id, keeper_id)
    for every doc appearing in ``pairs``, where keeper_id is the minimum
    id of the doc's component — the fuzzy generalization of the
    reference's ``_id`` upsert collapsing identical docs (es.clj:102-103).

    Distributed min-label propagation, no GraphFrames dependency. Each
    round does (1) a neighbor-min pass — every node takes the min label
    over itself and its neighbors (equi-join on the edge list, map-side
    combinable groupBy(min)) — and (2) a pointer-jumping pass
    (label <- label[label]), which halves the depth of any label chain,
    so convergence is O(log diameter) rounds, not O(diameter). Real
    near-dup clusters are near-cliques (diameter 1-2): 2-3 rounds in
    practice. Each round materializes via localCheckpoint so lineage
    (and the convergence-check count) stays O(1) per round; at cluster
    scale the same role is played by checkpointing to storage.

    Shuffle profile per round: edges join labels on a single long key,
    then a groupBy on the same key — both partial-aggregatable; rows are
    16-24 bytes. The doc text never enters the computation."""
    # persist the pair set FIRST: it appears on both sides of the edge
    # union, and without the cache boundary the whole candidate join +
    # Jaccard verify upstream evaluates twice (the captured-subexpression
    # recompute family — see _banded_candidate_pairs)
    pairs = pairs.persist()
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr"))
        )
        stepped = (
            labels.join(nbr_min, labels["id"] == nbr_min["src"], "left")
            .select(
                labels["id"],
                F.least(labels["label"], F.coalesce(F.col("nbr"), labels["label"])).alias("label"),
            )
        )
        # pointer jumping: follow the label's own label one hop
        lab2 = stepped.select(F.col("id").alias("pid"), F.col("label").alias("plabel"))
        jumped = (
            stepped.join(lab2, stepped["label"] == lab2["pid"], "left")
            .select(
                stepped["id"],
                F.least(
                    stepped["label"], F.coalesce(F.col("plabel"), stepped["label"])
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    else:
        # min-label + pointer jumping converges in O(log diameter) rounds;
        # exiting via max_iter means labels are still moving and keeper_ids
        # below would be silently wrong — fail loudly instead
        edges.unpersist()
        pairs.unpersist()
        raise RuntimeError(
            f"resolve_dup_clusters: label propagation did not converge in "
            f"{max_iter} rounds (cluster diameter > ~2^{max_iter}); "
            f"raise max_iter"
        )
    edges.unpersist()
    pairs.unpersist()
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("keeper_id"))


def near_dup_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    **lsh_kwargs,
) -> DataFrame:
    """End-to-end fuzzy dedup: MinHash-LSH pairs -> connected components
    -> keep exactly one doc (the min id) per near-dup cluster. Returns the
    surviving rows of ``df``. The anti-join build side is only the LOSERS
    (docs whose keeper is another doc) — tiny relative to the corpus, so
    the survivors pass is one broadcast-able anti-join over the full data."""
    pairs = minhash_lsh_dedup(
        df, text_col=text_col, id_col=id_col, threshold=threshold, **lsh_kwargs
    )
    resolution = resolve_dup_clusters(pairs)
    losers = resolution.where(F.col("keeper_id") != F.col("doc_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")


def minhash_index_build(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    arrow_signature: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist a MinHash-LSH index of a corpus for INCREMENTAL dedup — the
    continuous-crawl regime: each new batch is deduped against everything
    already ingested without recomputing the corpus's signatures (the
    committed-scope analog of the reference's always-on ``_id`` upsert,
    es.clj:102-104, at fuzzy granularity).

    Layout under ``path``:
    * ``bands/``    — (id, band, bhash): 24 B rows, the candidate-join side.
    * ``shingles/`` — (id, sh array<long>): verification join-back only.
    * ``meta/``     — one row (shingle_k, num_hashes, bands); probes and
      appends validate against it, so an index can never be probed with
      mismatched LSH parameters (silent recall loss otherwise).

    ``mode='append'`` accretes a new batch into the index (run after the
    batch itself was deduped). At cluster scale the bands table would be
    an Iceberg table bucket-partitioned by bhash so a probe co-locates
    without a full shuffle; plain Parquet keeps the same layout here."""
    spark = df.sparkSession
    meta_path = f"{path}/meta"
    if mode == "append":
        m = spark.read.parquet(meta_path).first()
        got = (m["shingle_k"], m["num_hashes"], m["bands"])
        want = (shingle_k, num_hashes, bands)
        if got != want:
            raise ValueError(
                f"minhash index at {path} was built with "
                f"(shingle_k, num_hashes, bands)={got}, append got {want}"
            )
    r = num_hashes // bands
    # keep the handle persist() was called ON: unpersist() on a derived
    # child (e.g. the .where below) matches no cache entry and silently
    # leaks the cached signatures — SQL caches are NOT reclaimed by GC
    cached = _minhash_base(
        df, text_col, id_col, shingle_k, num_hashes, arrow_signature
    ).persist()
    base = cached.where(F.col("__sh").isNotNull() & F.col("__sig").isNotNull())
    _band_keys(base, bands, r).withColumnRenamed("__id", id_col).write.mode(
        mode
    ).parquet(f"{path}/bands")
    base.select(
        F.col("__id").alias(id_col), F.col("__sh").alias("sh")
    ).write.mode(mode).parquet(f"{path}/shingles")
    if mode != "append":
        spark.createDataFrame(
            [(shingle_k, num_hashes, bands)],
            "shingle_k int, num_hashes int, bands int",
        ).write.mode("overwrite").parquet(meta_path)
    cached.unpersist()


def minhash_index_append(df: DataFrame, path: str, **kwargs) -> None:
    """Accrete a (deduped) batch into an existing minhash index."""
    minhash_index_build(df, path, mode="append", **kwargs)


def dedup_against_index(
    new_df: DataFrame,
    path: str,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    arrow_signature: bool = True,
) -> DataFrame:
    """Near-dup pairs (new_id, index_id, jaccard_sim) between a NEW batch
    and a persisted minhash index, sim >= threshold.

    Scale shape: the new batch's band keys (24 B rows, typically ≪ index)
    equi-join the index's bands table — AQE broadcasts the batch side when
    it fits, so the index side never shuffles; candidates dedupe on the id
    pair; exact-Jaccard verification joins shingles back for the candidate
    set only (batch shingles from the persisted base, index shingles as a
    narrow two-column scan). LSH params come from the index's meta table —
    a probe cannot silently run with mismatched banding.

    The persisted base must stay cached while the returned (lazy)
    DataFrame is consumed — an eager unpersist here would force the
    signature to recompute for each of its two uses. SQL caches are NOT
    garbage-collected: long-lived sessions (the streaming gate) must
    release them explicitly, which ``stream_dedup_against_index`` does
    per micro-batch; one-shot queries leave it to session teardown."""
    spark = new_df.sparkSession
    m = spark.read.parquet(f"{path}/meta").first()
    shingle_k, num_hashes, bands = m["shingle_k"], m["num_hashes"], m["bands"]
    r = num_hashes // bands
    base = _minhash_base(
        new_df, text_col, id_col, shingle_k, num_hashes, arrow_signature
    ).persist().where(F.col("__sh").isNotNull() & F.col("__sig").isNotNull())
    new_bands = _band_keys(base, bands, r)
    idx_bands = spark.read.parquet(f"{path}/bands")
    cand = (
        new_bands.alias("n")
        .join(
            idx_bands.alias("i"),
            on=[
                F.col("n.band") == F.col("i.band"),
                F.col("n.bhash") == F.col("i.bhash"),
            ],
        )
        .select(
            F.col("n.__id").alias("new_id"), F.col(f"i.{id_col}").alias("index_id")
        )
        .dropDuplicates(["new_id", "index_id"])
    )
    sh_new = base.select(F.col("__id").alias("new_id"), F.col("__sh").alias("sh_n"))
    sh_idx = spark.read.parquet(f"{path}/shingles").select(
        F.col(id_col).alias("index_id"), F.col("sh").alias("sh_i")
    )
    return (
        cand.join(sh_new, "new_id")
        .join(sh_idx, "index_id")
        .withColumn("jaccard_sim", jaccard(F.col("sh_n"), F.col("sh_i")))
        .where(F.col("jaccard_sim") >= threshold)
        .select("new_id", "index_id", F.round("jaccard_sim", 4).alias("jaccard_sim"))
        # a replayed (at-least-once) append duplicates shingle rows in the
        # index; candidates are already deduped, but the shingle join-back
        # would multiply each verified pair per replay — dedup the OUTPUT
        # (tiny) rather than the wide shingle table
        .dropDuplicates(["new_id", "index_id"])
    )


def minhash_index_compact(
    spark,
    path: str,
    deleted_ids: "DataFrame | list | None" = None,
    id_col: str = "doc_id",
    rows_per_file: int = 2_000_000,
) -> dict:
    """Compact a persisted MinHash-LSH index in place: drop the bands and
    shingle rows of deleted documents, collapse replayed (at-least-once)
    append duplicates, and rewrite both tables into right-sized files so
    an index that accreted many small appends stops paying per-file open
    cost on every probe.

    Without this the index grows forever across crawls (VERDICT r3 #7):
    every ``minhash_index_append`` adds files, and a replayed append adds
    duplicate rows that ``dedup_against_index`` must re-dedup on every
    probe. ``compact(build + append + append-replay) == fresh rebuild`` is
    asserted in tests.

    ``deleted_ids``: DataFrame with ``id_col`` (or a plain list of ids) of
    documents to purge — the retention hook. TTL at cluster scale: keep
    the corpus table partitioned by crawl date, select ids older than the
    cutoff, and pass them here; on Iceberg the same rewrite is
    ``DELETE FROM bands WHERE ...`` + ``rewrite_data_files`` and snapshot
    expiry makes the space reclaim atomic. On the Parquet fallback the
    swap is two directory renames; a crash between them leaves a
    ``bands__old__`` directory to remove manually, never a half-written
    live table (writes go to a ``__compact__`` staging dir first).

    Returns row/file counts before and after for observability.
    """
    import shutil

    bands_p, shingles_p = f"{path}/bands", f"{path}/shingles"
    if deleted_ids is not None and not isinstance(deleted_ids, DataFrame):
        deleted_ids = spark.createDataFrame([(i,) for i in deleted_ids], [id_col])

    def _nfiles(p: str) -> int:
        import os

        return sum(f.endswith(".parquet") for f in os.listdir(p))

    stats: dict = {}
    for name, p, dedup_cols in (
        ("bands", bands_p, [id_col, "band", "bhash"]),
        ("shingles", shingles_p, [id_col]),
    ):
        cur = spark.read.parquet(p)
        stats[f"{name}_rows_before"] = cur.count()
        stats[f"{name}_files_before"] = _nfiles(p)
        # replayed appends write identical rows; shingle rows for one id
        # are identical by construction (same text -> same shingle set),
        # so id-level dropDuplicates is exact, not arbitrary
        out = cur.dropDuplicates(dedup_cols)
        if deleted_ids is not None:
            out = out.join(
                F.broadcast(deleted_ids.select(id_col).distinct()),
                on=id_col,
                how="left_anti",
            )
        rows = out.count()
        # right-size files; bands cluster on bhash so a probe's equi-join
        # (and, on Iceberg, a bucket-pruned scan) touches few of them
        nf = max(1, -(-rows // rows_per_file))
        out = (
            out.repartitionByRange(nf, "bhash")
            if name == "bands"
            else out.repartition(nf, id_col)
        )
        staged = f"{p}__compact__"
        shutil.rmtree(staged, ignore_errors=True)
        out.write.mode("overwrite").parquet(staged)
        old = f"{p}__old__"
        shutil.rmtree(old, ignore_errors=True)
        shutil.move(p, old)
        shutil.move(staged, p)
        shutil.rmtree(old)
        stats[f"{name}_rows_after"] = rows
        stats[f"{name}_files_after"] = _nfiles(p)
    return stats


def simhash_from_hashes(hashes: Column, bits: int = 64) -> Column:
    """SimHash fingerprint as a long from a precomputed token-hash array:
    bit b is 1 iff the sum over tokens of (+1 if bit b of hash else -1) is
    positive.

    One ``aggregate`` pass over the hashes builds all bit-votes at once
    (zip_with against the token hash's bit array via ``bit_get``, which
    accepts column positions); packing uses compile-time int shifts. Stays
    JVM-side, single pass over the data. NULL hash array -> NULL
    fingerprint (otherwise every null doc packs to 0 and all of them pair
    up at hamming distance 0)."""
    positions = F.sequence(F.lit(0), F.lit(bits - 1))
    bit_votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(positions, lambda b: F.bit_get(h, b)),
            lambda a, bit: a + F.when(bit == 1, 1).otherwise(-1),
        ),
    )
    packed = F.lit(0).cast("long")
    for b in range(bits):
        weight = -(1 << 63) if b == 63 else (1 << b)
        packed = packed + F.when(
            F.element_at(bit_votes, b + 1) > 0, F.lit(weight).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return F.when(hashes.isNotNull(), packed)


def simhash(text: Column, bits: int = 64) -> Column:
    """SimHash over xxhash64 token hashes (the fast production hash)."""
    tokens = F.split(F.trim(F.lower(text)), r"\s+")
    return simhash_from_hashes(F.transform(tokens, lambda t: F.xxhash64(t)), bits)


def md5_token_hash(t: Column) -> Column:
    """60-bit token hash both Spark and DuckDB can compute identically:
    the first 15 hex chars of md5(utf8(token)) parsed base-16. Used by the
    oracle-checkable SimHash configuration — Spark's xxhash64 has no DuckDB
    twin, md5 does (DuckDB: ``('0x' || substr(md5(tok),1,15))::BIGINT``).
    15 hex chars = 60 bits < 2^63, so the long cast never overflows."""
    return F.conv(F.substring(F.md5(F.encode(t, "UTF-8")), 1, 15), 16, 10).cast("long")


def simhash_arrow(token_hashes: Column) -> Column:
    """Arrow fast path for ``simhash``: takes the per-token xxhash64 array
    (computed JVM-side, one transform over the split) and does the 64-bit
    vote + pack as numpy segmented ops — bit-equal to the expression path
    (asserted in tests), ~6x on the fingerprint stage, which is a 64-step
    interpreted HOF aggregate otherwise. NULL/empty token arrays -> NULL."""
    import pandas as pd
    from pyspark.sql.types import LongType

    from ..functions.xxh64_np import simhash_pack_batch

    def _sh(s):
        valid = [x for x in s if x is not None and len(x) > 0]
        packed = iter(simhash_pack_batch(valid)) if valid else iter(())
        return pd.Series(
            [int(next(packed)) if (x is not None and len(x) > 0) else None for x in s],
            index=s.index,
            dtype=object,
        )

    _sh.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(_sh, LongType())(token_hashes)


def simhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    arrow_fingerprint: bool = True,
    token_hash: str = "xxh64",
) -> DataFrame:
    """Near-dup pairs by SimHash: band the fingerprint into 4 equal-width
    chunks (pigeonhole: hamming<=3 => >=1 chunk identical), bucket
    join on (chunk_idx, chunk_value), verify exact Hamming distance.

    ``token_hash``: "xxh64" (default — 64-bit fingerprint, Arrow-kernel
    fast path) or "md5" (60-bit fingerprint from ``md5_token_hash`` — same
    banding/verify machinery, but every stage is reproducible in DuckDB so
    the driver's Spark-vs-oracle hash gate can check it end-to-end)."""
    # persist: __sh (a 64-step HOF aggregate) feeds both self-join sides —
    # un-materialized it would be recomputed per side (see
    # _banded_candidate_pairs docstring for the full recompute story)
    if token_hash == "md5":
        bits = 60
        hashes = F.transform(split_words(F.col(text_col)), md5_token_hash)
        fp = simhash_from_hashes(hashes, bits)
    elif arrow_fingerprint:
        # token hashes JVM-side (split is the transform's input — evaluated
        # once), vote+pack vectorized in the Arrow kernel
        bits = 64
        hashes = F.transform(split_words(F.col(text_col)), lambda t: F.xxhash64(t))
        fp = simhash_arrow(hashes)
    else:
        bits = 64
        fp = simhash(F.col(text_col))
    chunk_w = bits // 4
    chunk_mask = (1 << chunk_w) - 1
    base = (
        _spread(df)
        .select(F.col(id_col).alias("__id"), fp.alias("__sh"))
        .persist()
        # null docs pair with nothing; filter ABOVE the cache boundary so
        # pushdown can't inline the 64-bit-vote expression into the scan
        # (see _banded_candidate_pairs ORDER MATTERS note)
        .where(F.col("__sh").isNotNull())
    )
    chunks = base.select(
        "__id",
        "__sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftright(F.col("__sh"), i * chunk_w)
                        .bitwiseAND(F.lit(chunk_mask))
                        .alias("cval"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("ck"),
    ).select("__id", "__sh", "ck.chunk", "ck.cval")
    cand = (
        chunks.alias("a")
        .join(
            chunks.alias("b"),
            on=[
                F.col("a.chunk") == F.col("b.chunk"),
                F.col("a.cval") == F.col("b.cval"),
                F.col("a.__id") < F.col("b.__id"),
            ],
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__sh").alias("sh_a"),
            F.col("b.__sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", hamming).where(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.7,
    prefilter_bands: int = 8,
    arrow_signature: bool = True,
) -> DataFrame:
    """Char-n-gram Jaccard near-dups; candidates via minhash bands over the
    n-gram sets (never all-pairs), verified exactly."""
    sig_fn = minhash_signature_arrow if arrow_signature else minhash_signature
    base = _spread(df).select(
        F.col(id_col).alias("__id"),
        # hash the n-gram strings once into longs; Jaccard over hashed sets
        # is exact up to 2^-64 collisions and far cheaper to intersect
        F.transform(
            char_ngrams(F.col(text_col), n), lambda s: F.xxhash64(s)
        ).alias("__sh"),
    ).withColumn("__sig", sig_fn(F.col("__sh"), prefilter_bands * 4))
    cand = _banded_candidate_pairs(base, prefilter_bands, 4)
    return (
        cand.withColumn("jaccard_sim", jaccard(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", F.round("jaccard_sim", 4).alias("jaccard_sim"))
    )


def dedup_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 10,
) -> DataFrame:
    """CCNet-style paragraph-level exact dedup: split each document into
    fixed-width word chunks ("paragraphs" — crawl text here is
    single-line, so width-``chunk_words`` windows stand in for blank-line
    paragraph boundaries), drop every chunk occurrence after the corpus-
    wide first (ordered by (doc_id, chunk_idx)), and reassemble what is
    left of each document in order.

    This removes repeated boilerplate/quoted passages ACROSS documents
    while ``remove_boilerplate_lines`` (curation.py) removes only lines
    frequent in many docs — CCNet runs the paragraph form over shards.

    Shuffle shape at scale: explode is narrow; the first-occurrence window
    shuffles (hash(chunk), doc_id, idx) — hash-partitioned on near-unique
    md5 keys, so no skew and no document bodies beyond the one chunk; the
    reassembly groupBy shuffles each surviving chunk exactly once (the
    output IS the document — unavoidable, same as boilerplate removal).

    Returns (doc_id, text_dedup, n_kept, n_total); fully-deduped docs come
    back with ``text_dedup = ''`` and ``n_kept = 0``, letting the caller
    gate on emptiness instead of silently losing rows.
    """
    from pyspark.sql.window import Window

    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n_chunks = F.ceil(F.size(words) / F.lit(float(chunk_words))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("idx"),
            F.array_join(
                F.slice(words, i * chunk_words + 1, chunk_words), " "
            ).alias("chunk"),
        ),
    )
    ex = df.select(F.col(id_col).alias("doc_id"), F.explode(chunks).alias("c")).select(
        "doc_id", F.col("c.idx").alias("idx"), F.col("c.chunk").alias("chunk")
    )
    first = Window.partitionBy(F.md5(F.encode(F.col("chunk"), "UTF-8"))).orderBy(
        "doc_id", "idx"
    )
    flagged = ex.withColumn("__rn", F.row_number().over(first))
    kept = F.sort_array(
        F.collect_list(
            F.when(F.col("__rn") == 1, F.struct(F.col("idx"), F.col("chunk")))
        )
    )
    return (
        flagged.groupBy("doc_id")
        .agg(kept.alias("__kept"), F.count(F.lit(1)).alias("n_total"))
        .select(
            "doc_id",
            F.array_join(
                F.transform(F.col("__kept"), lambda s: s["chunk"]), " "
            ).alias("text_dedup"),
            F.size("__kept").cast("long").alias("n_kept"),
            F.col("n_total"),
        )
    )
