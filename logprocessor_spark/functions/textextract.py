"""HTML -> text extraction, byte-identical across three implementations.

This is the analog of the reference's ES ``html_strip`` char filter +
``classic`` tokenizer analyzer (es.clj:17-23): the only place the raw markup
is turned into searchable text. BASELINE.json's per-row invariant is
*byte-identical extracted text per url*, so the semantics are pinned here
once and implemented three ways that must agree byte-for-byte:

1. ``extract_text_py``        — pure Python (golden oracle, synth generator)
2. ``extract_text_col``       — native Catalyst expressions (JVM, codegen —
                                the production fast path; SURVEY §4
                                "vectorized execution")
3. ``extract_text_pandas_iter`` — Arrow-batched pandas implementation used
                                by the mapInPandas parity path

Rules (deliberately simple and locale-free so no library-version drift):
  a. drop <script>...</script> and <style>...</style> blocks (incl. tags)
  b. replace every remaining tag <...> with a single space
  c. decode the five XML entities + &nbsp; (to a plain space)
  d. collapse runs of ASCII whitespace [ \\t\\n\\r\\f] to one space; trim

Whitespace class is explicit ASCII because Java ``\\s`` and Python ``\\s``
disagree on Unicode whitespace.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java and Python regex dialects agree on all of these patterns.
_RE_SCRIPT = r"(?is)<script\b[^>]*>.*?</script>"
_RE_STYLE = r"(?is)<style\b[^>]*>.*?</style>"
_RE_TAG = r"<[^>]*>"
_RE_WS = r"[ \t\n\r\f]+"

_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last so "&amp;lt;" decodes to "&lt;" not "<"
]

_PY_SCRIPT = re.compile(_RE_SCRIPT)
_PY_STYLE = re.compile(_RE_STYLE)
_PY_TAG = re.compile(_RE_TAG)
_PY_WS = re.compile(_RE_WS)


def extract_text_py(html: bytes | str | None) -> str | None:
    """Reference implementation (pure Python). None-safe."""
    if html is None:
        return None
    s = html.decode("utf-8", errors="replace") if isinstance(html, bytes) else html
    s = _PY_SCRIPT.sub(" ", s)
    s = _PY_STYLE.sub(" ", s)
    s = _PY_TAG.sub(" ", s)
    for ent, rep in _ENTITIES:
        s = s.replace(ent, rep)
    return _PY_WS.sub(" ", s).strip(" ")


def extract_text_col(html: Column) -> Column:
    """Native-expression implementation over a binary/string column.

    Whole-stage-codegen friendly: decode + chained regexp_replace, no
    Python in the loop. Must stay byte-identical to ``extract_text_py``
    (tests/test_parse_golden.py asserts it on every fixture).
    """
    s = F.decode(html, "UTF-8")
    s = F.regexp_replace(s, _RE_SCRIPT, " ")
    s = F.regexp_replace(s, _RE_STYLE, " ")
    s = F.regexp_replace(s, _RE_TAG, " ")
    for ent, rep in _ENTITIES:
        # literal replace via regexp_replace with quoted pattern
        s = F.regexp_replace(s, re.escape(ent), rep.replace("$", r"\$"))
    s = F.regexp_replace(s, _RE_WS, " ")
    # trim only ASCII spaces (F.trim strips unicode space too — avoid)
    s = F.regexp_replace(s, r"^ +| +$", "")
    return s


def extract_text_pandas_iter(series):
    """pandas.Series[bytes|str] -> pandas.Series[str]; vectorized enough for
    the Arrow parity path (regex engine is C, applied per batch not per job).
    """
    return series.map(extract_text_py)
