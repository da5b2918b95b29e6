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
