"""Golden parser behaviors ported from the reference fixtures
(/root/reference/dev-resources/test/*.xml; semantics in parsers.clj +
utils.clj — see FIXTURES.md §2). Each case pins one reference behavior."""

from datetime import datetime

import pytest

from logprocessor_spark.functions.parse import (
    ERR_INCORRECT_DATE,
    ERR_NO_MESSAGE_ID,
    parse_pages,
    parse_pages_pandas,
)
from logprocessor_spark.functions.textextract import extract_text_col, extract_text_py

from .fixtures import ALL, pages_df

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def parsed(spark):
    df = parse_pages(pages_df(spark)).collect()
    return {r.url.rsplit("/", 1)[-1]: r for r in df}


def test_bogus_z_pst_shift(parsed):
    # parsers.clj:24-32: 2015-11-11T16:16:02Z -> PST wall -> UTC +8h (post-DST)
    r = parsed["rq_retrieve"]
    assert r.ts == datetime(2015, 11, 12, 0, 16, 2)
    assert r.error is None


def test_retrieve_detail_id(parsed):
    # parsers.clj:58-63: UniqueID attr -> detail id
    assert parsed["rq_retrieve"].detail_id == "JIHENT"
    assert parsed["rq_retrieve"].ind is None


def test_et_detail_ind(parsed):
    # parsers.clj:51-56: EndTransaction Ind -> boolean true
    r = parsed["rq_et"]
    assert r.ind is True
    assert r.detail_id is None
    assert r.ts == datetime(2015, 11, 12, 0, 30, 42)


def test_dispatch_miss_header_only(parsed):
    # utils.clj:21-25,50-53: OTA_PingRQ not in dispatch -> no details
    r = parsed["rq_ping"]
    assert r.ind is None and r.detail_id is None
    assert r.message_id == "mid-ping" and r.service == "Ping"


def test_response_utc_passthrough_and_errors(parsed):
    # parsers.clj:45-49 + utils.clj:50-53: no-Z ts unchanged; errors
    # extracted; details suppressed when errors present
    r = parsed["rsp_error"]
    assert r.ts == datetime(2015, 11, 12, 17, 50, 27)
    assert list(r.errors) == ["PREVIOUS ENTRY IN PROGRESS, PLEASE WAIT"]
    assert r.detail_id is None  # suppressed despite data-id being present
    assert r.refto == "mid-retrieve"
    assert r.error is None  # errors != quarantine: reference indexes these


def test_large_clean_response(parsed):
    r = parsed["rsp_retrieve"]
    assert r.error is None and list(r.errors) == []
    assert len(r.text) > 20000  # 32KB-fixture analog


def test_incorrect_date_quarantined(parsed):
    # utils.clj:44-46: missing Timestamp -> "Incorrect date"
    r = parsed["rq_invalid"]
    assert r.error is not None and r.error.startswith(ERR_INCORRECT_DATE)
    assert r.ts is None


def test_junk_quarantined(parsed):
    # broken.zip analog: junk bytes -> parse error, batch survives
    r = parsed["broken"]
    assert r.error == ERR_NO_MESSAGE_ID
    assert r.text == "adssad"


def test_text_byte_identical_three_ways(spark):
    """north_star invariant: byte-identical extracted text per url across
    the python oracle, the native path, and the pandas parity path."""
    df = pages_df(spark)
    native = {
        r.url: r.t
        for r in df.select("url", extract_text_col(F.col("html")).alias("t")).collect()
    }
    pandas_path = {r.url: r.text for r in parse_pages_pandas(df).collect()}
    rows = {r.url: bytes(r.html) for r in df.collect()}
    for url, html in rows.items():
        expected = extract_text_py(html)
        assert native[url] == expected, url
        assert pandas_path[url] == expected, url


def test_entities_and_markup_stripping(spark):
    html = (
        b'<html><head><title>T</title><style>x{}</style>'
        b'<script>var a=1;</script></head>'
        b'<body class="X"><p>A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp;end</p></body></html>'
    )
    assert extract_text_py(html) == "T A & B <tag> \"q\" 's' end"
    df = pages_df(spark).limit(1).select(
        extract_text_col(F.lit(html)).alias("t")
    )
    assert df.collect()[0].t == "T A & B <tag> \"q\" 's' end"


def test_native_pandas_full_parity(spark):
    from logprocessor_spark.synth import gen_pages

    pages = gen_pages(spark, 300, seed=11)
    a = parse_pages(pages).orderBy("url").collect()
    b = parse_pages_pandas(pages).orderBy("url").collect()
    assert len(a) == len(b) == 300
    for ra, rb in zip(a, b):
        assert ra == rb, (ra, rb)
