"""Property-based parity: for ARBITRARY grammar-conforming pages (and
arbitrary junk), the native Catalyst parse, the Arrow pandas parse, and
the pure-Python text extraction must agree byte-for-byte — the fuzzed
generalization of the golden fixtures (BASELINE.json per-row invariant).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from logprocessor_spark.functions.parse import parse_batch_pandas
from logprocessor_spark.functions.textextract import extract_text_py

from .fixtures import page_html

# attribute values: printable ASCII minus the characters the marker
# grammar reserves ('"' closes the attr, '<'/'>' close tags, '&' is an
# entity head handled separately)
_attr = st.text(
    alphabet=st.characters(
        min_codepoint=32, max_codepoint=126, blacklist_characters='"<>&'
    ),
    min_size=0,
    max_size=24,
)
_body = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126, blacklist_characters="<>&"),
    min_size=0,
    max_size=120,
)


def _parse_py_single(html: bytes) -> dict:
    import pandas as pd

    pdf = pd.DataFrame({"url": ["u://h/x"], "lang": ["en"], "html": [html]})
    return parse_batch_pandas(pdf).iloc[0].to_dict()


@settings(max_examples=60, deadline=None)
@given(
    session_id=_attr,
    message_id=_attr.filter(lambda s: s != ""),
    service=_attr,
    pcc=_attr,
    body=_body,
    msg_type=st.sampled_from(
        ["EndTransactionRQ", "TravelItineraryReadRQ", "OTA_PingRQ", "Weird"]
    ),
    errors=st.lists(_body.filter(lambda s: s != ""), max_size=2),
)
def test_pandas_parse_fields_roundtrip(
    session_id, message_id, service, pcc, body, msg_type, errors
):
    html = page_html(
        session_id=session_id,
        message_id=message_id,
        service=service,
        pcc=pcc,
        body=body,
        msg_type=msg_type,
        errors=tuple(errors),
    )
    row = _parse_py_single(html)
    assert row["message_id"] == message_id
    assert row["session_id"] == (session_id or None)
    assert row["msg_type"] == msg_type
    assert row["pcc"] == (pcc or None)
    assert list(row["errors"]) == errors
    # text extraction: markup stripped, entities decoded, ws collapsed
    txt = extract_text_py(html)
    assert "<" not in txt and ">" not in txt
    for e in errors:
        squashed = " ".join(e.split())
        if squashed:
            assert squashed in txt


@settings(max_examples=40, deadline=None)
@given(
    raw=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=200
    )
)
def test_junk_never_crashes_and_text_is_clean(raw):
    html = raw.encode()
    row = _parse_py_single(html)
    # no message-id marker -> quarantine error, never an exception
    if row["message_id"] is None:
        assert row["error"] is not None
    txt = extract_text_py(html)
    assert "  " not in txt and not txt.startswith(" ") and not txt.endswith(" ")


def test_fuzzed_pages_native_equals_pandas(spark):
    """Spark-side twin of the fuzz: a deterministic sample of awkward
    values through BOTH engines, byte-compared."""
    import pandas as pd

    from logprocessor_spark.functions.parse import parse_pages

    cases = []
    awkward = ["", " ", "a  b", "x'y", "t\tz", "=&amp;", "A" * 100, "0"]
    for i, v in enumerate(awkward):
        cases.append(
            page_html(
                session_id=v.replace("&", ""),
                message_id=f"m{i}",
                service=v.replace("&", ""),
                body=v,
                errors=("boom " + v.replace("&", ""),) if i % 2 else (),
            )
        )
    cases.append(b"complete junk \x01 not html")
    pdf = pd.DataFrame(
        {
            "url": [f"u://h/{i}" for i in range(len(cases))],
            "lang": ["en"] * len(cases),
            "html": cases,
            "warc_ts": [None] * len(cases),
            "text": [""] * len(cases),
        }
    )
    src = spark.createDataFrame(pdf)
    native = parse_pages(src).toPandas().sort_values("url").reset_index(drop=True)
    from logprocessor_spark.functions.parse import parse_pages_pandas

    arrow = (
        parse_pages_pandas(src).toPandas().sort_values("url").reset_index(drop=True)
    )
    for col in native.columns:
        a, b = list(native[col]), list(arrow[col])
        norm = lambda x: list(x) if isinstance(x, (list, tuple)) or hasattr(x, "tolist") else x
        assert [norm(x) for x in a] == [norm(x) for x in b], col
