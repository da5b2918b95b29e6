"""Round-4 operators: URL canonicalization/dedup, paragraph dedup,
inverted-index search + TF-IDF, hashing-trick linear classifier."""

import hashlib
import math

from pyspark.sql import functions as F

from logprocessor_spark.functions.classifier import (
    DEFAULT_DIM,
    WEIGHT_ADD,
    WEIGHT_HALF,
    WEIGHT_MOD,
    WEIGHT_MULT,
    hashed_linear_score,
)
from logprocessor_spark.operators.dedup import dedup_paragraphs
from logprocessor_spark.operators.textindex import (
    build_postings,
    postings_search,
    tfidf_topk,
)
from logprocessor_spark.operators.urls import (
    canonical_url,
    dedup_by_canonical_url,
)

# ---------------------------------------------------------------------------
# URL canonicalization


CANON_CASES = [
    # (raw, expected canonical)
    ("https://Example.COM/a", "https://example.com/a"),
    ("HTTPS://WWW.EXAMPLE.COM/a", "https://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),  # non-default kept
    ("https://example.com:80/a", "https://example.com:80/a"),  # wrong default kept
    ("https://example.com/a/", "https://example.com/a"),
    ("https://example.com/", "https://example.com/"),  # root slash survives
    ("https://example.com", "https://example.com/"),  # empty path -> /
    ("https://example.com/a#frag", "https://example.com/a"),
    ("https://example.com/a?b=2&a=1", "https://example.com/a?a=1&b=2"),
    ("https://example.com/a?utm_source=x&a=1", "https://example.com/a?a=1"),
    ("https://example.com/a?utm_source=x", "https://example.com/a"),
    ("https://example.com/a?fbclid=Z&gclid=Y&a=1", "https://example.com/a?a=1"),
    # 'ref' is content-identifying (git hosting ?ref=branch) — kept
    ("https://example.com/a?ref=main&a=1", "https://example.com/a?a=1&ref=main"),
    # tracking-param names match case-insensitively (hosts lowercase, params don't)
    ("https://example.com/a?UTM_SOURCE=x&a=1", "https://example.com/a?a=1"),
    ("https://example.com/a?FbClid=Z", "https://example.com/a"),
    ("https://example.com/a?refresh=1", "https://example.com/a?refresh=1"),  # not 'ref'
    ("https://www.example.com/a?b=2&a=1#f", "https://example.com/a?a=1&b=2"),
    # malformed rows pass through untouched (never merged into one key)
    ("not a url", "not a url"),
    ("example.com/no-scheme", "example.com/no-scheme"),
    ("://empty", "://empty"),
]


def test_canonical_url_rules(spark):
    df = spark.createDataFrame(
        [(raw, want) for raw, want in CANON_CASES], ["raw", "want"]
    )
    rows = df.select("want", canonical_url(F.col("raw")).alias("got")).collect()
    for r in rows:
        assert r["got"] == r["want"], r


def test_canonical_url_idempotent(spark):
    """canonical(canonical(x)) == canonical(x) — a canonical form must be
    a fixed point."""
    df = spark.createDataFrame([(r,) for r, _ in CANON_CASES], ["raw"])
    rows = (
        df.select(canonical_url(F.col("raw")).alias("c1"))
        .select("c1", canonical_url(F.col("c1")).alias("c2"))
        .collect()
    )
    for r in rows:
        assert r["c1"] == r["c2"], r


def test_dedup_by_canonical_url_keep_latest(spark):
    import datetime as dt

    t0 = dt.datetime(2020, 1, 1)
    rows = [
        # one canonical family, three spellings; latest ts wins
        ("https://www.a.com/p?utm_source=x", t0, 1),
        ("https://A.COM/p/", t0 + dt.timedelta(hours=2), 2),
        ("https://a.com:443/p#f", t0 + dt.timedelta(hours=1), 3),
        # ts tie -> higher id wins
        ("https://b.com/q", t0, 10),
        ("https://b.com/q/", t0, 11),
        # singleton
        ("https://c.com/r", t0, 20),
    ]
    df = spark.createDataFrame(rows, ["url", "warc_ts", "doc_id"])
    got = {
        r["url_canon"]: (r["keeper_id"], r["n_dupes"])
        for r in dedup_by_canonical_url(df).collect()
    }
    assert got == {
        "https://a.com/p": (2, 3),
        "https://b.com/q": (11, 2),
        "https://c.com/r": (20, 1),
    }


# ---------------------------------------------------------------------------
# Paragraph dedup


def _brute_para_dedup(texts, cw):
    words = {i: t.split() for i, t in texts}
    seen = set()
    out = {}
    for i in sorted(words):
        wd = words[i]
        nch = max(1, math.ceil(len(wd) / cw))
        kept, total = [], 0
        for c in range(nch):
            chunk = " ".join(wd[c * cw : (c + 1) * cw])
            total += 1
            if chunk not in seen:
                seen.add(chunk)
                kept.append(chunk)
        out[i] = (" ".join(kept), len(kept), total)
    return out


def test_dedup_paragraphs_matches_bruteforce(spark):
    texts = [
        (0, "a b c d e f"),
        (1, "a b c x y z"),  # first chunk dup of doc0's
        (2, "a b c d e f"),  # fully duplicated -> empty
        (3, "x y z q"),  # chunk 'x y z' dup of doc1's second chunk
        (4, "lone words here now"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["text_dedup"], r["n_kept"], r["n_total"])
        for r in dedup_paragraphs(df, chunk_words=3).collect()
    }
    assert got == _brute_para_dedup(texts, 3)
    assert got[2] == ("", 0, 2)  # fully-deduped doc present, empty


def test_dedup_paragraphs_on_testdata_conserves_chunks(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = dedup_paragraphs(df, chunk_words=3)
    agg = out.agg(
        F.sum("n_kept").alias("k"),
        F.sum("n_total").alias("t"),
        F.count(F.lit(1)).alias("rows"),
    ).collect()[0]
    assert agg["rows"] == df.count()  # every doc comes back
    assert 0 < agg["k"] < agg["t"]  # some chunks deduped, not all
    # kept chunks are globally unique
    ex = out.select(F.explode(F.split("text_dedup", " ")).alias("w"))
    assert ex.count() > 0


# ---------------------------------------------------------------------------
# Inverted index + TF-IDF


def test_postings_tf_and_search(spark):
    df = spark.createDataFrame(
        [
            (0, "spark merge window spark"),
            (1, "spark window"),
            (2, "merge window merge"),
            (3, "spark merge window window"),
        ],
        ["doc_id", "text"],
    )
    p = build_postings(df)
    tf = {(r["token"], r["doc_id"]): r["tf"] for r in p.collect()}
    assert tf[("spark", 0)] == 2 and tf[("window", 3)] == 2
    hits = postings_search(p, ["spark", "merge", "window"]).collect()
    assert sorted((r["doc_id"], r["total_tf"]) for r in hits) == [(0, 4), (3, 4)]
    top1 = postings_search(p, ["spark", "merge", "window"], limit=1).collect()
    assert [(r["doc_id"], r["total_tf"]) for r in top1] == [(0, 4)]


def test_postings_search_agrees_with_scan_search(spark):
    """Index path == body-scan path on real testdata (ES analogy: the
    postings answer must equal the query_string AND answer)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    terms = ["merge", "spark", "window"]
    idx_ids = {
        r["doc_id"]
        for r in postings_search(build_postings(docs), terms).collect()
    }
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    cond = (
        F.size(
            F.array_intersect(
                F.array_distinct(toks), F.array(*[F.lit(t) for t in terms])
            )
        )
        == len(terms)
    )
    scan_ids = {r["doc_id"] for r in docs.where(cond).select("doc_id").collect()}
    assert idx_ids == scan_ids and idx_ids


def test_tfidf_topk_matches_numpy(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    terms = ["dup", "spark", "table"]
    got = [
        (r["doc_id"], r["score"]) for r in tfidf_topk(docs, terms, k=10).collect()
    ]
    rows = docs.select("doc_id", "text").collect()
    n = len(rows)
    tfs = {}
    for r in rows:
        toks = r["text"].strip().lower().split()
        for t in terms:
            c = toks.count(t)
            if c:
                tfs.setdefault(t, {})[r["doc_id"]] = c
    scores = {}
    for t, per in tfs.items():
        idf = math.log(n / len(per))
        for d, c in per.items():
            scores[d] = scores.get(d, 0.0) + c * idf
    want = sorted(
        ((d, round(s, 6)) for d, s in scores.items()), key=lambda x: (-x[1], x[0])
    )[:10]
    assert got == want


# ---------------------------------------------------------------------------
# Hashed linear classifier


def _ref_score(text):
    s = 0
    n = 0
    for t in text.strip().lower().split():
        if not t:
            continue
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        j = h % DEFAULT_DIM
        s += (j * WEIGHT_MULT + WEIGHT_ADD) % WEIGHT_MOD - WEIGHT_HALF
        n += 1
    return s, n


def test_hashed_linear_score_matches_python_ref(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    got = {
        r["doc_id"]: (r["feat_sum"], r["n_tokens"], r["label"])
        for r in hashed_linear_score(docs).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        s, n = _ref_score(r["text"])
        assert got[r["doc_id"]] == (s, n, "keep" if s >= 0 else "drop")


def test_hashed_linear_score_empty_doc_and_no_shuffle(spark):
    df = spark.createDataFrame([(0, ""), (1, "   "), (2, "spark")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in hashed_linear_score(df).collect()}
    assert got[0]["n_tokens"] == 0 and got[0]["feat_sum"] == 0
    assert got[0]["label"] == "keep"
    assert got[1]["n_tokens"] == 0
    # scan-side gate: the classifier itself must not introduce a shuffle
    plan = hashed_linear_score(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# Host blocklist filter


def test_filter_blocked_hosts(spark):
    from logprocessor_spark.operators.urls import filter_blocked_hosts

    pages = spark.createDataFrame(
        [
            ("https://bad.example.com/a", 0),
            ("https://good.example.com/b", 1),
            ("https://www.good2.example.com:443/c", 2),
        ],
        ["url", "doc_id"],
    )
    bl = spark.createDataFrame([("bad.example.com",)], ["host"])
    kept = filter_blocked_hosts(pages, bl)
    assert {r["doc_id"] for r in kept.collect()} == {1, 2}
    assert kept.columns == ["url", "doc_id"]  # helper column dropped
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


# ---------------------------------------------------------------------------
# Partitioning invariance: results must not depend on the physical layout


def _canon_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_round4_ops_partitioning_invariant(spark):
    """Same logical result under radically different partitionings — the
    property that makes an operator safe to move from local[4] to 1000
    executors. Exercises the window/groupBy key paths of each r4 op."""
    import logprocessor_spark.harness as H

    sf = "/root/testdata/sf0.001"
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for q in ["dedup_paragraphs", "url_dedup", "quality_classifier",
                  "inverted_search", "host_blocklist_filter", "pq_codes"]:
            spark.conf.set("spark.sql.shuffle.partitions", "2")
            a = _canon_rows(H.QUERIES[q](spark, sf))
            spark.conf.set("spark.sql.shuffle.partitions", "17")
            b = _canon_rows(H.QUERIES[q](spark, sf))
            assert a == b, f"{q} depends on partitioning"
            assert a, f"{q} returned nothing"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)


# ---------------------------------------------------------------------------
# Product quantization


def test_pq_encode_matches_numpy(spark):
    import numpy as np

    from logprocessor_spark.operators.pq import (
        PQ_DS,
        PQ_K,
        PQ_M,
        _CB_A,
        _CB_B,
        _CB_C,
        _CB_D,
        _CB_MOD,
        formula_codebook,
        pq_encode,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(40)
    got = {
        (r["vec_id"], r["s"]): r["code"]
        for r in pq_encode(emb, formula_codebook(spark)).collect()
    }
    cb = np.array(
        [
            [
                [
                    ((s * _CB_A + k * _CB_B + d * _CB_C + _CB_D) % _CB_MOD) / 1000.0
                    - 1.0
                    for d in range(PQ_DS)
                ]
                for k in range(PQ_K)
            ]
            for s in range(PQ_M)
        ]
    )
    for r in emb.collect():
        v = np.asarray(r["embedding"], dtype=np.float64)
        for s in range(PQ_M):
            sub = v[s * PQ_DS : (s + 1) * PQ_DS]
            dists = ((cb[s] - sub) ** 2).sum(axis=1)
            want = int(np.argmin(dists))  # unique-min in practice
            assert got[(r["vec_id"], s)] == want, (r["vec_id"], s)


def test_pq_adc_topk_matches_numpy_and_is_sane(spark):
    import numpy as np

    from logprocessor_spark.operators.pq import (
        PQ_DS,
        PQ_K,
        PQ_M,
        _CB_A,
        _CB_B,
        _CB_C,
        _CB_D,
        _CB_MOD,
        pq_adc_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = [(r["vec_id"], r["adc_dist"]) for r in pq_adc_topk(emb, 7, k_out=10).collect()]
    rows = emb.collect()
    cb = np.array(
        [
            [
                [
                    ((s * _CB_A + k * _CB_B + d * _CB_C + _CB_D) % _CB_MOD) / 1000.0
                    - 1.0
                    for d in range(PQ_DS)
                ]
                for k in range(PQ_K)
            ]
            for s in range(PQ_M)
        ]
    )
    q = np.asarray(next(r["embedding"] for r in rows if r["vec_id"] == 7), np.float64)
    qtab = np.array(
        [((cb[s] - q[s * PQ_DS : (s + 1) * PQ_DS]) ** 2).sum(axis=1) for s in range(PQ_M)]
    )
    scores = {}
    for r in rows:
        v = np.asarray(r["embedding"], np.float64)
        adc = 0.0
        for s in range(PQ_M):
            sub = v[s * PQ_DS : (s + 1) * PQ_DS]
            code = int(((cb[s] - sub) ** 2).sum(axis=1).argmin())
            adc += qtab[s][code]
        scores[r["vec_id"]] = round(adc, 6)
    want = sorted(scores.items(), key=lambda x: (x[1], x[0]))[:10]
    assert got == want
    # sanity: the query vector itself is among the nearest by ADC (its
    # distance is pure quantization error)
    assert 7 in {v for v, _ in got}


# ---------------------------------------------------------------------------
# IVF-PQ


def _np_coarse():
    import numpy as np

    from logprocessor_spark.operators.pq import IVF_KC, PQ_DS, PQ_M, _coarse_val

    dim = PQ_M * PQ_DS
    return np.array([[_coarse_val(c, d) for d in range(dim)] for c in range(IVF_KC)])


def test_ivf_assign_matches_numpy(spark):
    import numpy as np

    from logprocessor_spark.operators.pq import coarse_codebook, ivf_assign

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(60)
    got = {
        r["vec_id"]: r["list_id"]
        for r in ivf_assign(emb, coarse_codebook(spark)).collect()
    }
    co = _np_coarse()
    for r in emb.collect():
        v = np.asarray(r["embedding"], np.float64)
        want = int(((co - v) ** 2).sum(axis=1).argmin())
        assert got[r["vec_id"]] == want


def test_ivfpq_topk_matches_numpy(spark):
    import numpy as np

    from logprocessor_spark.operators.pq import (
        IVF_NPROBE,
        PQ_DS,
        PQ_K,
        PQ_M,
        _CB_A,
        _CB_B,
        _CB_C,
        _CB_D,
        _CB_MOD,
        ivfpq_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = [(r["vec_id"], r["adc_dist"]) for r in ivfpq_topk(emb, 7).collect()]

    co = _np_coarse()
    cb = np.array(
        [
            [
                [
                    ((s * _CB_A + k * _CB_B + d * _CB_C + _CB_D) % _CB_MOD) / 1000.0
                    - 1.0
                    for d in range(PQ_DS)
                ]
                for k in range(PQ_K)
            ]
            for s in range(PQ_M)
        ]
    )
    rows = emb.collect()
    vecs = {r["vec_id"]: np.asarray(r["embedding"], np.float64) for r in rows}

    def assign(v):
        return int(((co - v) ** 2).sum(axis=1).argmin())

    def codes_of(v, lid):
        res = v - co[lid]
        return [
            int(((cb[s] - res[s * PQ_DS : (s + 1) * PQ_DS]) ** 2).sum(axis=1).argmin())
            for s in range(PQ_M)
        ]

    q = vecs[7]
    probes = list(np.argsort(((co - q) ** 2).sum(axis=1), kind="stable")[:IVF_NPROBE])
    scores = {}
    for vid, v in vecs.items():
        lid = assign(v)
        if lid not in probes:
            continue
        qres = q - co[lid]
        qtab = [
            ((cb[s] - qres[s * PQ_DS : (s + 1) * PQ_DS]) ** 2).sum(axis=1)
            for s in range(PQ_M)
        ]
        adc = sum(qtab[s][c] for s, c in enumerate(codes_of(v, lid)))
        scores[vid] = round(float(adc), 6)
    want = sorted(scores.items(), key=lambda x: (x[1], x[0]))[:10]
    assert got == want
    assert 7 in {v for v, _ in got}  # query's own list is always probed


def test_ivfpq_prebuilt_equals_inmemory_and_prunes(spark, tmp_path):
    from logprocessor_spark.operators.pq import (
        ivfpq_topk,
        ivfpq_topk_prebuilt,
        materialize_ivfpq_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivfpq_idx")
    materialize_ivfpq_index(emb, path)
    qdf = emb.where(F.col("vec_id") == 7)
    pre = ivfpq_topk_prebuilt(spark, path, qdf)
    mem = ivfpq_topk(emb, 7)
    assert [tuple(r) for r in pre.collect()] == [tuple(r) for r in mem.collect()]
    # the probe predicate must prune index partitions at the scan
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan.split("PartitionFilters", 1)[1][:200]


def test_ivf_assign_arrow_equals_join_form(spark):
    from logprocessor_spark.operators.pq import (
        coarse_codebook,
        ivf_assign,
        ivf_assign_arrow,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = {r["vec_id"]: r["list_id"] for r in ivf_assign(emb, coarse_codebook(spark)).collect()}
    b = {r["vec_id"]: r["list_id"] for r in ivf_assign_arrow(emb).collect()}
    assert a == b
    # the arrow form is a pure scan-side map: no exchange
    plan = ivf_assign_arrow(emb)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_ivfpq_fused_arrow_encode_equals_join_form(spark):
    from logprocessor_spark.operators.pq import ivfpq_encode

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = sorted(tuple(r) for r in ivfpq_encode(emb, arrow=True).collect())
    b = sorted(tuple(r) for r in ivfpq_encode(emb, arrow=False).collect())
    assert a == b and a
    # fused form: the encode itself introduces no shuffle
    plan = ivfpq_encode(emb, arrow=True)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# Count-min sketch


def test_cms_overestimates_never_under(spark):
    from logprocessor_spark.operators.sketch import cms_build, cms_estimate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token")
    ).where(F.col("token") != "")
    true = {r["token"]: r["c"] for r in toks.groupBy("token").agg(F.count(F.lit(1)).alias("c")).collect()}
    sk = cms_build(docs)
    est = {
        r["token"]: r["est"]
        for r in cms_estimate(sk, toks.distinct()).collect()
    }
    assert set(est) == set(true)
    for t, c in true.items():
        assert est[t] >= c, t  # the one-sided CMS guarantee


def test_cms_heavy_hitters_superset_and_merge(spark):
    from logprocessor_spark.operators.sketch import (
        cms_build,
        cms_estimate,
        cms_heavy_hitters,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    hh = {r["token"] for r in cms_heavy_hitters(docs, threshold=100).collect()}
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token")
    ).where(F.col("token") != "")
    true_hh = {
        r["token"]
        for r in toks.groupBy("token").agg(F.count(F.lit(1)).alias("c")).where(F.col("c") >= 100).collect()
    }
    assert true_hh <= hh  # no true heavy hitter missed

    # mergeability: sketch(A) + sketch(B) == sketch(A ∪ B), cell for cell
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1)
    merged = (
        cms_build(a).unionByName(cms_build(b))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_build(docs)
    assert sorted(tuple(r) for r in merged.collect()) == sorted(
        tuple(r) for r in whole.collect()
    )


def test_cms_heavy_hitters_gate_equals_full_vocab_enumeration(spark):
    """The scan-side hot-bucket gate is EXACT: it returns precisely the
    rows that enumerating every distinct corpus token through
    cms_estimate would (est ≥ θ ⟺ all d buckets hot), while the plan
    gates occurrences with broadcast LeftSemi joins before any exchange
    instead of shuffling the full vocabulary."""
    from logprocessor_spark.operators.sketch import (
        CMS_DEPTH,
        cms_build,
        cms_estimate,
        cms_heavy_hitters,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    hh = cms_heavy_hitters(docs, threshold=100)
    got = sorted(tuple(r) for r in hh.collect())

    sketch = cms_build(docs)
    vocab = (
        docs.select(
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token")
        )
        .where(F.col("token") != "")
        .distinct()
    )
    want = sorted(
        tuple(r)
        for r in cms_estimate(sketch, vocab).where(F.col("est") >= 100).collect()
    )
    assert got == want and len(got) > 0

    # candidate gating is d broadcast LeftSemi probes, scan-side
    plan = hh._sc._jvm.PythonSQLUtils.explainString(
        hh._jdf.queryExecution(), "formatted"
    )
    # formatted output repeats nodes (AQE initial+final plan, tree+detail
    # sections) so count is a multiple of the d joins, never fewer
    assert plan.count("LeftSemi") >= CMS_DEPTH, plan.count("LeftSemi")


# ---------------------------------------------------------------------------
# HyperLogLog


def test_hll_estimate_accuracy_and_merge(spark):
    from logprocessor_spark.operators.sketch import hll_estimate, hll_registers

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = docs.select("text").distinct().count()
    est = hll_estimate(hll_registers(docs, F.col("text"))).collect()[0][
        "n_distinct_est"
    ]
    assert abs(est - exact) / exact < 0.25  # m=64 -> ~13% std error

    # mergeability: registers(A) max registers(B) == registers(A ∪ B)
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1)
    merged = (
        hll_registers(a, F.col("text"))
        .unionByName(hll_registers(b, F.col("text")))
        .groupBy("b")
        .agg(F.max("reg").alias("reg"))
    )
    whole = hll_registers(docs, F.col("text"))
    assert sorted(tuple(r) for r in merged.collect()) == sorted(
        tuple(r) for r in whole.collect()
    )


def test_hll_grouped_estimate_accuracy(spark):
    """Per-group sketches (by=('lang',)) estimate each group's distinct
    count within HLL error, and the grouped register table restricted to
    one group equals that group's standalone sketch (composability)."""
    from logprocessor_spark.operators.sketch import hll_estimate, hll_registers

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    est = {
        r["lang"]: r["n_distinct_est"]
        for r in hll_estimate(
            hll_registers(docs, F.col("text"), by=("lang",)), by=("lang",)
        ).collect()
    }
    exact = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang")
        .agg(F.countDistinct("text").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for lang, n in exact.items():
        assert abs(est[lang] - n) / n < 0.35, (lang, est[lang], n)  # m=64

    one = docs.where(F.col("lang") == sorted(exact)[0])
    grouped_one = sorted(
        (r["b"], r["reg"])
        for r in hll_registers(docs, F.col("text"), by=("lang",))
        .where(F.col("lang") == sorted(exact)[0])
        .select("b", "reg")
        .collect()
    )
    solo = sorted(
        (r["b"], r["reg"]) for r in hll_registers(one, F.col("text")).collect()
    )
    assert grouped_one == solo


def test_hll_estimate_empty_registers_is_zero(spark):
    """An empty register table (empty corpus or all-null keys) estimates
    0.0, not NULL — F.sum over zero rows is NULL and must be coalesced."""
    from logprocessor_spark.operators.sketch import hll_estimate, hll_registers

    empty_docs = spark.createDataFrame([], "text string")
    est = hll_estimate(hll_registers(empty_docs, F.col("text"))).collect()
    assert len(est) == 1 and est[0]["n_distinct_est"] == 0.0

    all_null = spark.createDataFrame([(None,), (None,)], "text string")
    est2 = hll_estimate(hll_registers(all_null, F.col("text"))).collect()
    assert len(est2) == 1 and est2[0]["n_distinct_est"] == 0.0


def test_hll_rank_matches_python_ref(spark):
    import hashlib

    from logprocessor_spark.operators.sketch import HLL_M, hll_registers

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    got = {r["b"]: r["reg"] for r in hll_registers(docs, F.col("text")).collect()}
    regs = {}
    for r in docs.select("text").collect():
        h = int(hashlib.md5(r["text"].encode()).hexdigest()[:15], 16)
        b, w = h % HLL_M, h >> 6
        rho = 55 if w == 0 else 55 - w.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    assert got == regs


def test_cms_unseen_key_estimates_zero_or_collision(spark):
    from logprocessor_spark.operators.sketch import cms_build, cms_estimate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sk = cms_build(docs)
    unseen = spark.createDataFrame(
        [("zzz-not-in-corpus-1",), ("zzz-not-in-corpus-2",)], ["token"]
    )
    est = {r["token"]: r["est"] for r in cms_estimate(sk, unseen).collect()}
    assert set(est) == {"zzz-not-in-corpus-1", "zzz-not-in-corpus-2"}
    # with 4 rows x 512 buckets and ~31 distinct tokens, at least one of
    # an unseen key's buckets is empty with overwhelming probability
    assert all(v == 0 for v in est.values()), est
