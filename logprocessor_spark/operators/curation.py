"""Corpus-curation operators over web-page-shaped inputs: per-host caps,
corpus-frequency boilerplate-line removal, and vocabulary extraction.

These are the "shape the training mix" passes that run after parsing and
before dedup/packing in a web-scale pipeline (the reference's analog is
its per-partition task scoping, utils.clj:73-77 — it never curates, but a
Common-Crawl corpus pipeline must):

* ``host_cap`` — limit documents per registrable host so no single domain
  dominates the mix (C4 kept ≤ a fixed share per domain). Implemented as a
  two-phase salted top-k so one mega-host (crawl skew is Zipfian) cannot
  pin a single reducer.
* ``remove_boilerplate_lines`` — CCNet-style line-level dedup: a line whose
  hash occurs in ≥ ``min_docs`` distinct documents is boilerplate (nav
  bars, cookie banners, footers) and is removed from every document; the
  remainder is reassembled in order.
* ``vocab_topk`` — corpus-wide token frequencies, the first step of
  vocabulary/BPE construction and a cheap corpus health check.

All shuffles carry hashes or short tokens, never full documents, except
the final reassembly groupBy in ``remove_boilerplate_lines`` which is
unavoidable (the output IS the document) and shuffles each line exactly
once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: lower-cased twin of textstats.BPE_ISH_TOKEN_RE — apply after lower()
TOKEN_RE_LOWER = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def host_of(url: F.Column) -> F.Column:
    """Registrable host of a URL — native ``parse_url`` (codegen, JVM)."""
    return F.parse_url(url, F.lit("HOST"))


def host_cap(
    df: DataFrame,
    cap: int,
    host_col: str = "host",
    order_col: str = "doc_id",
    salt_buckets: int = 16,
) -> DataFrame:
    """Keep at most ``cap`` rows per host, chosen by ascending
    ``order_col`` (pass a quality rank for best-first selection).

    Two-phase salted top-k: phase 1 partitions each host's rows across
    ``salt_buckets`` deterministic buckets (xxhash64 of the order key) and
    keeps ``cap`` per (host, bucket); phase 2 re-ranks the ≤ cap·buckets
    survivors per host exactly. The global per-host top-cap is contained
    in the union of per-bucket top-caps, so the result is identical to a
    single window — but a Zipf-head host (one domain with 10^9 pages at
    crawl scale) sorts in ``salt_buckets`` parallel tasks instead of one.
    Phase 2's input is ≤ cap·salt_buckets rows per host: tiny.
    """
    salt = F.pmod(F.xxhash64(F.col(order_col)), F.lit(salt_buckets))
    w1 = Window.partitionBy(host_col, "__salt").orderBy(order_col)
    phase1 = (
        df.withColumn("__salt", salt)
        .withColumn("__rn", F.row_number().over(w1))
        .where(F.col("__rn") <= cap)
        .drop("__rn", "__salt")
    )
    w2 = Window.partitionBy(host_col).orderBy(order_col)
    return (
        phase1.withColumn("__rn", F.row_number().over(w2))
        .where(F.col("__rn") <= cap)
        .drop("__rn")
    )


def boilerplate_lines(
    df: DataFrame,
    min_docs: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The boilerplate line set: (fp, line, n_docs) for every line whose
    md5 occurs in ≥ ``min_docs`` distinct documents. Shuffle key is the
    16-byte fp (dropDuplicates + groupBy partial-aggregate map-side); the
    result is by definition small — boilerplate is what repeats."""
    lines = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    )
    return (
        lines.select(
            F.md5(F.encode(F.col("line"), "UTF-8")).alias("fp"),
            F.col("line"),
            F.col(id_col),
        )
        .dropDuplicates(["fp", id_col])
        .groupBy("fp", "line")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate_lines(
    df: DataFrame,
    min_docs: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove corpus-frequent lines from every document (CCNet line-dedup).

    Returns (id_col, text_col, n_lines_cut) with ``text_col`` rebuilt from
    the surviving lines in original order (empty string if nothing
    survives). The frequent-line set is computed once and broadcast — the
    per-line anti-membership test never shuffles document text; only the
    final reassembly groups lines by document."""
    bp = boilerplate_lines(df, min_docs, id_col, text_col).select("fp").withColumn(
        "__bp", F.lit(1)
    )
    # posexplode_OUTER: a NULL-text doc yields one (NULL pos, NULL line)
    # row instead of vanishing — null docs must survive curation as rows
    # (same contract as the dedup operators' null handling)
    lines = df.select(
        F.col(id_col),
        F.posexplode_outer(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("fp", F.md5(F.encode(F.col("line"), "UTF-8")))
    marked = lines.join(F.broadcast(bp), on="fp", how="left")
    return marked.groupBy(id_col).agg(
        F.when(
            F.max("pos").isNotNull(),  # NULL text stays NULL, not ""
            F.array_join(
                F.transform(
                    F.filter(
                        F.array_sort(F.collect_list(F.struct("pos", "line", "__bp"))),
                        lambda s: s["__bp"].isNull(),
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ),
        ).alias(text_col),
        F.sum(F.when(F.col("__bp").isNotNull(), 1).otherwise(0))
        .cast("int")
        .alias("n_lines_cut"),
    )


def select_token_budget(
    df: DataFrame,
    budget: int,
    by: str = "lang",
    tokens_col: str = "n_tokens",
    quality_col: str = "qscore",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-ranked token-budget selection: per ``by`` group, keep the
    best-quality docs until the running token total reaches ``budget``
    (inclusive of the doc that crosses it — partial docs don't exist).
    Deterministic: ties in quality break by ascending id.

    This is the training-mix construction step ("fill N tokens per
    language with the best documents"). EXACT form: a per-group window
    cumsum, which globally sorts each group — correct and oracle-
    verifiable, but a low-cardinality ``by`` (5 languages) means 5 fat
    sort partitions at 10^12 docs. The scale path with identical output
    is ``select_token_budget_histogram``."""
    w = (
        Window.partitionBy(by)
        .orderBy(F.desc(quality_col), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return df.withColumn("__prior", prior).where(
        F.col("__prior") < budget
    ).drop("__prior")


def select_token_budget_histogram(
    df: DataFrame,
    budget: int,
    by: str = "lang",
    tokens_col: str = "n_tokens",
    quality_col: str = "qscore",
    id_col: str = "doc_id",
    resolution: int = 4,
    validate_resolution: bool = False,
) -> DataFrame:
    """Scale path of ``select_token_budget`` — IDENTICAL output, no
    corpus-wide sort. VALIDATED PRECONDITION: ``quality_col`` must carry
    at most ``resolution`` decimal places (the default 4 matches
    ``quality_score``'s round(_, 4) contract) — a raw double score (e.g. a
    model logit) quantizes into buckets here but not in the exact window
    form, silently changing the selection. Callers with raw scores must
    either raise ``resolution`` to their score's actual grain or pass
    ``validate_resolution=True``, which runs one cheap aggregate over the
    score column and raises on the first violation.

    Exploits that fixed resolution: per (group, quality-bucket) token
    masses form a histogram of ≤ 10^resolution + 1 rows per group
    regardless of corpus size, so the budget-boundary walk is a window
    over a TINY relation.

    * Buckets whose cumulative-from-the-top token mass fits the budget
      keep every doc (a broadcast semi-join — no sort, no shuffle of df).
    * Exactly one bucket per group straddles the budget; only ITS docs
      (one quality value, one group) sort by id to pick the docs whose
      running total still fits — the same tie-break the exact form uses.

    The heavy relation does one partial-aggregatable groupBy and one
    narrow window over the boundary bucket; the 5-fat-partition global
    sort of the exact form never happens. Equality with
    ``select_token_budget`` is asserted in pytest and by the driver's
    oracle gate (the SQL twin is the exact window)."""
    # NULL quality -> INT_MIN sentinel: it sorts below EVERY real score
    # (including negative ones — a -1 sentinel would rank NULL above a
    # centered model's negative scores) in DESC order, exactly where
    # desc() (nulls-last) ranks NULL in the exact window form — a bare
    # NULL key would never equi-join and those docs would silently vanish
    # from this form only
    if validate_resolution:
        bad = (
            df.where(
                F.col(quality_col).isNotNull()
                & (F.round(F.col(quality_col), resolution) != F.col(quality_col))
            )
            .limit(1)
            .count()
        )
        if bad:
            raise ValueError(
                f"select_token_budget_histogram: {quality_col} has more than "
                f"{resolution} decimal places — the bucketed selection would "
                f"silently differ from select_token_budget; raise `resolution`"
            )
    scale = 10**resolution
    qk = F.coalesce(
        F.round(F.col(quality_col) * scale).cast("int"), F.lit(-(2**31))
    )
    hist = (
        df.select(F.col(by), qk.alias("__qk"), F.col(tokens_col))
        .groupBy(by, "__qk")
        .agg(F.sum(tokens_col).alias("__bt"))
    )
    wh = (
        Window.partitionBy(by)
        .orderBy(F.desc("__qk"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # persist the (tiny) histogram: both branches below consume it, and
    # without the cache boundary each would recompute the corpus groupBy
    hist = hist.withColumn(
        "__prior", F.coalesce(F.sum("__bt").over(wh), F.lit(0))
    ).persist()
    # strict < for "whole bucket fits": a bucket whose cumulative total
    # EQUALS the budget goes through the boundary walk instead, so a
    # trailing zero-token doc (prior == budget) is dropped exactly as the
    # window form drops it
    full = hist.where(F.col("__prior") + F.col("__bt") < budget).select(by, "__qk")
    boundary = hist.where(
        (F.col("__prior") < budget) & (F.col("__prior") + F.col("__bt") >= budget)
    ).select(by, "__qk", "__prior")

    keyed = df.withColumn("__qk", qk)
    # NULL-SAFE equality on the group key: the exact window form treats a
    # NULL group as its own partition, so plain equi-joins (NULL never
    # matches NULL) would silently drop every NULL-group doc from this
    # form only. eqNullSafe (<=>) is still an equi-join for planning.
    full_r = full.withColumnsRenamed({by: "__rby", "__qk": "__rqk"})
    kept_full = keyed.join(
        F.broadcast(full_r),
        on=keyed[by].eqNullSafe(full_r["__rby"]) & (keyed["__qk"] == full_r["__rqk"]),
        how="leftsemi",
    )
    bnd_r = boundary.withColumnsRenamed({by: "__rby", "__qk": "__rqk"})
    bdocs = keyed.join(
        F.broadcast(bnd_r),
        on=keyed[by].eqNullSafe(bnd_r["__rby"]) & (keyed["__qk"] == bnd_r["__rqk"]),
    ).drop("__rby", "__rqk")
    wb = (
        Window.partitionBy(by, "__qk")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bkept = (
        bdocs.withColumn(
            "__p", F.col("__prior") + F.coalesce(F.sum(tokens_col).over(wb), F.lit(0))
        )
        .where(F.col("__p") < budget)
        .drop("__prior", "__p")
    )
    # restore the caller's column order so both forms are
    # schema-interchangeable
    return kept_full.unionByName(bkept).select(*df.columns)


#: prime stride for the deterministic keep predicate — coprime with the
#: 1e6 modulus, so (id * PRIME) % 1e6 cycles uniformly over dense ids
MIX_PRIME = 104729


def mix_to_recipe(
    df: DataFrame,
    recipe_ppm: dict[str, int],
    budget: int,
    by: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic down-sampling to a target corpus mix: given a recipe
    of per-group shares in ppm (parts per million, summing to ≤ 1e6) and a
    total document budget, compute each group's keep-rate from its actual
    count and keep a deterministic pseudo-random subset at that rate.

    Two passes: (1) a partial-aggregatable groupBy counts each group —
    the only shuffle, over the tiny group key; (2) the keep predicate
    ``(id * PRIME) % 1e6 < rate_ppm`` evaluates inside the scan (the rate
    joins back via broadcast). Deterministic and engine-portable (no RNG
    state to ship, no xxhash in the oracle path); rate arithmetic is pure
    integer (rate_ppm = share_ppm * budget div group_count, capped at 1e6)
    so the oracle reproduces it exactly. Groups absent from the recipe
    drop entirely. Expected kept per group ≈ share·budget, within the
    ±1-per-ppm-bucket quantization of the modulus."""
    rate_map = F.create_map(
        *[F.lit(x) for kv in recipe_ppm.items() for x in kv]
    )
    counts = df.groupBy(by).agg(F.count(F.lit(1)).alias("__n"))
    rates = (
        counts.withColumn(
            "__share", F.coalesce(F.element_at(rate_map, F.col(by)), F.lit(0))
        )
        .select(
            F.col(by).alias("__rby"),
            F.least(
                F.lit(1_000_000).cast("long"),
                F.expr(f"div(cast({int(budget)} as bigint) * __share, __n)"),
            ).alias("__rate"),
        )
    )
    keyed = df.join(
        F.broadcast(rates), on=df[by].eqNullSafe(rates["__rby"]), how="inner"
    ).drop("__rby")
    kept = keyed.where(
        F.pmod(F.col(id_col) * MIX_PRIME, F.lit(1_000_000)) < F.col("__rate")
    )
    return kept.drop("__rate")


def vocab_topk(df: DataFrame, k: int = 20, text_col: str = "text") -> DataFrame:
    """Top-k corpus tokens by frequency: (token, n), ties broken by token
    so the result set is unique. Tokenization is the lower-cased BPE-ish
    grammar (alpha runs | digit runs | single punctuation). The groupBy
    partial-aggregates map-side (vocab cardinality ≪ token instances), and
    the top-k is a TakeOrderedAndProject — no global sort materializes."""
    toks = df.select(
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(TOKEN_RE_LOWER), F.lit(0)
            )
        ).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(k)
    )
