"""PII redaction expressions for training-data scrubbing.

Emails, URLs, and phone-like digit runs are replaced with fixed tags —
pure ``regexp_replace`` chains (JVM-side, whole-stage codegen, no UDF).

Pattern dialect note: the patterns deliberately use only the regex
subset that Java's engine (Spark) and RE2 (DuckDB) interpret the same
way — character classes, bounded/unbounded repetition, alternation; no
backreferences or lookaround — so each expression has an exact DuckDB
oracle twin ('g'-flag regexp_replace in registry.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
# 7+ digits allowing separators, optional leading +: conservative on
# purpose — better to miss a weird format than to eat order ids.
PHONE_RE = r"\+?[0-9][0-9()\-\. ]{5,}[0-9]"

EMAIL_TAG = "<EMAIL>"
URL_TAG = "<URL>"
PHONE_TAG = "<PHONE>"


def redact_emails(text: Column) -> Column:
    return F.regexp_replace(text, EMAIL_RE, EMAIL_TAG)


def redact_urls(text: Column) -> Column:
    return F.regexp_replace(text, URL_RE, URL_TAG)


def redact_phones(text: Column) -> Column:
    return F.regexp_replace(text, PHONE_RE, PHONE_TAG)


def redact_pii(text: Column) -> Column:
    """All three scrubbers; URLs first so emails inside URLs don't leave
    a half-redacted stub, then emails, then phone-like digit runs."""
    return redact_phones(redact_emails(redact_urls(text)))
