"""PII detection / redaction column functions for LLM training corpora.

Pure JVM ``regexp_*`` expressions — no Python in the row path. The regexes
deliberately use only constructs with identical semantics in Java regex
(Spark) and RE2 (DuckDB oracle): character classes, ``\\b``, ``\\d``, and
bounded repetition — no lookaround, no backreferences.

Extends the reference's data-quality family (the reject-incomplete-rows
check, airflow/dags/snowflake_data_pipeline.py:164-177) with the
scrub-before-train step every large-scale text pipeline needs; no
reference file implements redaction itself.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

#: Redaction order matters once a category has been replaced (tokens must
#: not create or destroy later matches), so it is fixed and mirrored
#: exactly in any oracle: emails, then phones, then IPv4s.
_REDACTIONS = ((EMAIL_RE, "<EMAIL>"), (PHONE_RE, "<PHONE>"), (IPV4_RE, "<IP>"))


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def email_count(col: Column | str) -> Column:
    return F.size(F.regexp_extract_all(_c(col), F.lit(EMAIL_RE), 0))


def phone_count(col: Column | str) -> Column:
    return F.size(F.regexp_extract_all(_c(col), F.lit(PHONE_RE), 0))


def ipv4_count(col: Column | str) -> Column:
    return F.size(F.regexp_extract_all(_c(col), F.lit(IPV4_RE), 0))


def redact_pii(col: Column | str) -> Column:
    """Text with all email / phone / IPv4 matches replaced by typed
    placeholder tokens, in the fixed ``_REDACTIONS`` order."""
    out = _c(col)
    for pattern, token in _REDACTIONS:
        out = F.regexp_replace(out, pattern, token)
    return out
