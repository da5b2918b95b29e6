"""Read path over sink tables (SURVEY §2a S8, §2f O1-O3).

The reference's search UI queries ES directly: full-text ``query_string``
over the raw XML (AND semantics), sorted (timestamp asc, service asc),
limit 120, raw excluded from the projection (db.cljs:15-21); plus a point
lookup ``GET /raw/:id`` via term query on ``_id`` (es.clj:119-125).

Spark-first: both are single DataFrame queries against the routed Parquet
output. Predicate pushdown + column pruning make the point lookup a
metadata-pruned scan; the search is a TakeOrderedAndProject (top-k without
a full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEARCH_LIMIT = 120  # db.cljs:20


def point_lookup(routed: DataFrame, message_id: str) -> DataFrame:
    """GET /raw/:id analog — term query on the id (es.clj:119-125).
    Equality predicate pushes to the Parquet scan (row-group stats prune)."""
    return routed.where(F.col("message_id") == message_id).select(
        "message_id", "url", "text"
    )


def _like_pattern(term: str) -> str:
    """ES wildcard term -> SQL LIKE pattern: ``*`` -> ``%``, ``?`` -> ``_``,
    existing LIKE metachars escaped."""
    return (
        term.replace("\\", "\\\\")
        .replace("%", r"\%")
        .replace("_", r"\_")
        .replace("*", "%")
        .replace("?", "_")
    )


def search(
    routed: DataFrame, query: str, limit: int = SEARCH_LIMIT
) -> DataFrame:
    """Full-text AND search over extracted text (db.cljs:15-21 analog).

    Terms are whitespace-split and ALL must appear (ES default_operator
    AND); ``*``/``?`` wildcards match within a token the way ES analyzes
    ``query_string`` wildcards (db.cljs:15-21). The analyzer equivalence:
    ES analyzed ``raw`` through html_strip + classic tokenizer
    (es.clj:17-23); our ``text`` column IS that stripped form, so a
    token-level conjunction matches the same documents.

    One text pass, not N: the token array is split once and all plain
    terms are checked with a single ``array_intersect`` against a literal
    array (Catalyst does not CSE N separate ``split`` calls — r1 VERDICT);
    each wildcard term adds one ``exists`` over the already-built array.
    Returns top-k by (ts asc, service asc) — TakeOrderedAndProject, no
    global sort at scale.
    """
    terms = [t.lower() for t in query.split()]
    plain = sorted({t for t in terms if "*" not in t and "?" not in t})
    wild = [t for t in terms if "*" in t or "?" in t]
    toks = F.array_distinct(F.split(F.lower(F.col("text")), r"\s+"))
    conds = []
    if plain:
        conds.append(
            F.size(F.array_intersect(toks, F.array(*[F.lit(t) for t in plain])))
            == len(plain)
        )
    def _matches(pattern: str):
        # closure factory: Spark HOF lambdas must be exactly unary
        return lambda x: x.like(pattern)

    for t in wild:
        conds.append(F.exists(toks, _matches(_like_pattern(t))))
    out = routed
    if conds:
        pred = conds[0]
        for c in conds[1:]:
            pred = pred & c
        out = out.where(pred)
    return (
        out.orderBy(F.col("ts").asc(), F.col("service").asc())
        .select(  # _source excludes raw (db.cljs:21) — prune heavy cols
            "message_id", "session_id", "service", "msg_type", "ts", "pcc",
            "sink", "month", "url", "lang",
        )
        .limit(limit)
    )
