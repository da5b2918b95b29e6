"""PII redaction — regex scrubbing of emails / IPv4 addresses / phone-like
tokens, the pre-training hygiene pass every web-corpus pipeline runs before
text leaves curation.

All expressions are native ``regexp_replace`` / ``regexp_count`` chains —
JVM-side, whole-stage-codegen, zero Python in the hot path. The patterns
are deliberately written in the common subset of Java regex (Spark) and
RE2 (DuckDB oracle): character classes, bounded repetition and ``\\b``
only — no lookaround, no backreferences — so the oracle twin reproduces
the redaction byte-for-byte.

Order matters and is fixed: emails first (their domain part would
otherwise be visible to no other rule), then IPv4, then phone tokens
(the IPv4 rule must not fire inside an already-redacted email, and the
phone rule's digit runs never overlap IPv4's dotted quads).

Reference anchor: the reference pipeline has no redaction (it indexes
parsed log fields verbatim, es.clj:99-104); this operator is part of the
LLM-training-data surface the brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java-regex and RE2 compatible (no lookaround / backrefs).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b555-\d{4}\b"

EMAIL_TOKEN = "[EMAIL]"
IP_TOKEN = "[IP]"
PHONE_TOKEN = "[PHONE]"


def pii_counts(text: Column) -> Column:
    """Struct of per-kind match counts (before redaction)."""
    return F.struct(
        F.regexp_count(text, F.lit(EMAIL_RE)).alias("n_email"),
        F.regexp_count(text, F.lit(IPV4_RE)).alias("n_ip"),
        F.regexp_count(text, F.lit(PHONE_RE)).alias("n_phone"),
    )


def redact_pii(text: Column) -> Column:
    """Replace every email, IPv4, and phone-like token with its
    placeholder. Fixed order: email -> ip -> phone (see module doc)."""
    out = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, IPV4_RE, IP_TOKEN)
    return F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)
