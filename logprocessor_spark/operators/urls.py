"""URL canonicalization and canonical-URL dedup for crawl pages.

A Common-Crawl-shaped corpus carries the same page under many URL
spellings — scheme/host case, ``www.`` prefixes, default ports, tracking
query params, param order, fragments, trailing slashes. Canonicalizing
before dedup collapses these families so exact/near dedup and per-host
caps see one key per page. (The reference has no URL surface — its keys
are message-ids, es.clj:99-104; this is the web-corpus analog of its
id-keyed upsert dedup.)

Everything is built-in column expressions (regexp + array HOFs), no
Python in the row path, so canonicalization runs inside whole-stage
codegen and the dedup groupBy shuffles only (url_canon, warc_ts, id) —
never page bodies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Query params that never identify content: pure analytics / click-tracking
# IDs only. Deliberately NOT ``ref``/``ref_src`` — ``ref`` is
# content-identifying on many real sites (git hosting ``?ref=branch``,
# package registries), so dropping it would silently merge distinct pages
# before dedup. Matched case-insensitively ((?i)): hosts are lowercased but
# param names are not, and ``UTM_SOURCE=x`` must collapse with
# ``utm_source=x`` rather than split the canonical key.
TRACKING_PARAM_REGEX = r"(?i)^(utm_[a-z]+|fbclid|gclid|msclkid)="


def canonical_url(
    url: Column, tracking_param_regex: str = TRACKING_PARAM_REGEX
) -> Column:
    """Normalize a URL to its canonical form:

    * scheme and host lowercased; ``www.`` prefix dropped
    * default ports stripped (``:80`` for http, ``:443`` for https)
    * fragment dropped
    * tracking params (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``;
      case-insensitive; override via ``tracking_param_regex`` for
      site-specific lists) dropped; remaining params sorted bytewise so
      param order never splits a key; empty query drops its ``?``
    * trailing slash stripped from non-root paths; empty path -> ``/``

    Pure Catalyst expressions (regexp_extract / array_sort / filter /
    array_join) — codegen-friendly, and every step has a bit-identical
    DuckDB twin (harness oracle ``url_canonicalize``).
    """
    nofrag = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(nofrag, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host = F.regexp_replace(hostport, r"^www\.", "")
    host = F.when(
        (scheme == "https") & host.endswith(":443"),
        F.regexp_replace(host, r":443$", ""),
    ).when(
        (scheme == "http") & host.endswith(":80"),
        F.regexp_replace(host, r":80$", ""),
    ).otherwise(host)
    path = F.regexp_extract(nofrag, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(
        F.when(
            (F.length(path) > 1) & path.endswith("/"),
            F.substr(path, F.lit(1), F.length(path) - 1),
        ).otherwise(path)
    )
    query = F.regexp_extract(nofrag, r"\?([^#]*)", 1)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (p != "") & ~p.rlike(tracking_param_regex),
            )
        ),
        "&",
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)),
    )
    # malformed input (no scheme://host) passes through unchanged — crawl
    # data always has junk rows, and silently rewriting them to '://...'
    # would merge every junk URL into one dedup key
    return F.when((scheme == "") | (host == ""), url).otherwise(canon)


def dedup_by_canonical_url(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
) -> DataFrame:
    """Collapse a crawl to one keeper row per canonical URL: the latest
    ``ts_col`` wins, ties broken by highest ``id_col`` (recrawl-replace
    semantics — same keep-latest rule as the reference's id-keyed monthly
    upsert, es.clj:99-104, keyed by canonical URL instead of message-id).

    One groupBy on the canonical key; ``max_by`` over a (ts, id) struct
    keeps the reduction map-side-combining and the shuffle rows narrow.
    Returns (url_canon, keeper_id, last_ts, n_dupes).
    """
    key = canonical_url(F.col(url_col)).alias("url_canon")
    pick = F.struct(F.col(ts_col).alias("ts"), F.col(id_col).cast("long").alias("id"))
    return (
        pages.select(key, pick.alias("pick"))
        .groupBy("url_canon")
        .agg(
            F.max("pick").alias("w"),
            F.count(F.lit(1)).alias("n_dupes"),
        )
        .select(
            "url_canon",
            F.col("w.id").alias("keeper_id"),
            F.col("w.ts").alias("last_ts"),
            "n_dupes",
        )
    )


def filter_blocked_hosts(
    pages: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    blocked_col: str = "host",
) -> DataFrame:
    """Drop pages whose host appears on a blocklist (the spam/adult/
    malware domain-list gate every web-corpus pipeline runs before
    curation — C4/RefinedWeb both filter on domain lists).

    The blocklist is dimension-sized (10^5-10^7 hosts vs 10^12 pages), so
    it broadcasts and the gate is a map-side LEFT ANTI probe — the corpus
    never shuffles, and Catalyst folds the host extraction + probe into
    the scan stage of whatever plan follows.

    The probe host comes from the CANONICAL URL (case, ``www.``, ports
    normalized) — a blocklist names one canonical host, and a page must
    not dodge it by spelling (``WWW.BAD.COM:443`` vs ``bad.com``).
    """
    from .curation import host_of

    probe = pages.withColumn("__host", host_of(canonical_url(F.col(url_col))))
    out = probe.join(
        F.broadcast(blocklist.select(F.col(blocked_col).alias("__host"))),
        on="__host",
        how="left_anti",
    )
    return out.drop("__host")
