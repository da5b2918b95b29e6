"""Token inverted index + index-backed search / TF-IDF ranking.

The reference's read path is an Elasticsearch ``query_string`` search —
ES answers it from a token inverted index (db.cljs:15-21, es.clj:17-23).
``query.search`` already matches those semantics with a full text scan;
this module builds the index itself as a first-class table, which is the
shape that survives 100 TB: a search touches only the postings of its
query terms (partition/row-group pruned on ``token``) instead of every
page body.

* ``build_postings`` — (token, doc_id, tf) + per-token document frequency.
  One explode + one groupBy; partial aggregation collapses the explode
  map-side so the shuffle carries (token, doc_id) pairs, not token
  instances. Written out partitioned/sorted by token, a probe scans one
  token's slice only.
* ``postings_search`` — conjunctive (AND) term search by postings
  intersection: filter postings to the query terms (pushed to the scan),
  groupBy doc_id, keep docs matching all terms. Shuffle volume is the
  candidate postings only — independent of corpus body size.
* ``tfidf_topk`` — rank the same candidates by sum(tf · ln(N/df)), the
  classic smooth-free TF-IDF; top-k via TakeOrderedAndProject (no global
  sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokens_of(text_col: str = "text"):
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def build_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(token, doc_id, tf) postings. The explode never shuffles (narrow);
    the single groupBy's partial agg means each map task emits one row per
    distinct (token, doc_id) it saw — the classic combiner shape."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tokens_of(text_col)).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def document_frequency(postings: DataFrame) -> DataFrame:
    """token -> df (number of documents containing it). Input is already
    one row per (token, doc_id), so a plain count per token."""
    return postings.groupBy("token").agg(F.count(F.lit(1)).alias("df"))


def postings_search(
    postings: DataFrame, terms: list[str], limit: int | None = None
) -> DataFrame:
    """Conjunctive search: doc_ids containing ALL ``terms``.

    The ``token IN (...)`` filter sits directly on the postings scan
    (pushed filter / partition pruning when the index table is laid out by
    token); the groupBy then touches only candidate rows. Equivalent to
    ES's AND ``query_string`` resolution over its inverted index."""
    terms = sorted(set(terms))
    hits = (
        postings.where(F.col("token").isin(terms))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_terms"), F.sum("tf").alias("total_tf"))
        .where(F.col("n_terms") == len(terms))
        .select("doc_id", "total_tf")
    )
    if limit is not None:
        # top-k: TakeOrderedAndProject, never a global sort
        return hits.orderBy("doc_id").limit(limit)
    # unlimited: an unordered hit SET — a corpus-wide total sort would add
    # a range-partition exchange for presentation only
    return hits


def tfidf_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k docs by TF-IDF over ``terms`` (disjunctive — any matching
    term scores): score = Σ_t tf(t,d) · ln(N / df(t)), rounded to 6
    decimals for cross-engine hash parity (same rule as cosine scores).

    N and the per-term df are tiny relations (≤ |terms| rows) — both are
    broadcast, so the only shuffle is the postings groupBy itself. Ties
    break on doc_id asc; TakeOrderedAndProject keeps the sort local."""
    terms = sorted(set(terms))
    postings = build_postings(docs, text_col, id_col).where(
        F.col("token").isin(terms)
    )
    df_rel = document_frequency(postings)
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        postings.join(F.broadcast(df_rel), "token")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("tf") * F.log(F.col("n_docs") / F.col("df"))), 6
            ).alias("score"),
            F.count(F.lit(1)).alias("n_terms"),
        )
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k docs by Okapi BM25 over ``terms`` — INTEGER-EXACT, so the
    ranking hash-gates across engines (``tfidf_topk``'s float ln() +
    round(6) works at small magnitudes; BM25's length normalization
    deserves the exact treatment the LM family already uses).

    Rational parameterization: k1 = 6/5, b = 3/4, idf in log2 (a
    constant factor off the traditional ln — ranking-invariant):

        idf_fx16(t) = log2_fx16(2N+2) - log2_fx16(2·df(t)+1)
                      [= log2((N+1)/(df+0.5)) in 16.16 fixed point]
        score(t,d)  = HALF_UP(idf_fx16 · 22·tf·TL,
                              10·tf·TL + 3·TL + 9·dl·N)
        bm25_fx16(d) = Σ_t score(t,d)

    where dl = |d| in tokens, N = corpus docs, TL = corpus tokens (so
    avgdl = TL/N never becomes a float: the k1/b algebra is cleared to
    the common denominator 10·TL). BIGINT headroom: idf_fx16·22·tf·TL
    must stay under 2^63 — holds while tf·TL < ~2e11 (gate SFs are ~1e7;
    a web-scale run emits the raw tf/df/dl relations and scores at query
    time, the same deferred-division contract as the KN tables).

    Scale shape: the term filter is pushed to the postings scan; df and
    the N/TL scalars stay IN-PLAN as a broadcast single-row relation
    (the tfidf_topk pattern — no eager driver collect, no extra corpus
    scan per call, and an empty corpus yields an empty top-k instead of
    a crash); dl is a narrow scan-side projection of the corpus joined
    to candidates on doc_id (AQE broadcasts the candidate side); top-k
    is TakeOrderedAndProject. Ties break on doc_id asc."""
    from .lm_score import log2_fx16
    from .ngram_lm import _half_up

    terms = sorted(set(terms))
    dl_rel = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.filter(tokens_of(text_col), lambda t: t != ""))
        .cast("long")
        .alias("dl"),
    )
    scal = dl_rel.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("tl"),
    )
    postings = build_postings(docs, text_col, id_col).where(
        F.col("token").isin(terms)
    )
    df_rel = document_frequency(postings)
    # idf per token: the ONE fixed-point log2 definition (lm_score) on
    # both terms — idf_fx16 = log2_fx16(2N+2) - log2_fx16(2df+1)
    idf_fx = log2_fx16(
        F.lit(2) * F.col("n") + F.lit(2)
    ) - log2_fx16(F.lit(2) * F.col("df") + F.lit(1))
    scored = (
        postings.join(F.broadcast(df_rel), "token")
        .crossJoin(F.broadcast(scal))
        .withColumn("idf_fx", idf_fx)
        .join(dl_rel, "doc_id")
        .withColumn(
            "term_fx",
            _half_up(
                F.col("idf_fx") * F.lit(22) * F.col("tf") * F.col("tl"),
                F.lit(10) * F.col("tf") * F.col("tl")
                + F.lit(3) * F.col("tl")
                + F.lit(9) * F.col("dl") * F.col("n"),
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("term_fx").cast("long").alias("bm25_fx16"),
            F.count(F.lit(1)).alias("n_terms"),
        )
    )
    return scored.orderBy(F.desc("bm25_fx16"), F.asc("doc_id")).limit(k)
