"""PII detection and redaction for the training-data pipeline.

Before text reaches a training corpus, published pipelines (C4,
RefinedWeb, Dolma) scrub personally identifiable information —
emails, phone numbers, IP addresses — replacing each span with a
typed placeholder token.  This is the standard regex tier (ML-based
NER is a separate, heavier stage); everything here is JVM-side
``regexp_count`` / ``regexp_replace`` column expressions — no UDFs,
whole-stage codegen, scales as a narrow map over the corpus.

Cross-engine regex discipline: every pattern below uses only syntax
shared by Java's regex (Spark) and RE2 (DuckDB) — character classes,
bounded repetition, ``\\b`` word boundaries; no lookaround, no
backreferences — so the DuckDB oracle replays the exact same
redaction byte-for-byte.

Replacement ORDER is load-bearing and fixed (email → IP → phone):
an email's domain can contain digit runs and a phone-ish tail, and an
IPv4 literal is a digit run the phone pattern could clip; replacing
the most-specific patterns first means later patterns scan text whose
earlier PII spans are already collapsed to placeholder tokens (which
contain no digits and cannot re-match).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: local-part@domain.tld — the C4-style pragmatic email shape (not
#: RFC 5322; the corpus-cleaning tier wants recall on the common form)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

#: dotted-quad IPv4.  \b guards keep version strings like 1.2.3.4.5
#: from matching twice mid-run; octet range is NOT validated (0-999
#: matches) — standard recall-over-precision tradeoff for scrubbing.
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

#: international-format phone: leading +, country code, then 2-4
#: separator-delimited digit groups (8-16 digits total).  The
#: mandatory ``+`` anchor is what keeps plain digit runs / quantities
#: / years out (precision); national formats without + are
#: deliberately out of scope for the regex tier.
PHONE_RE = r"\+\d{1,3}(?:[- ]?\d{2,4}){2,4}\b"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"

#: (pattern, placeholder) in the fixed replacement order documented
#: in the module docstring
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (EMAIL_RE, EMAIL_TOKEN),
    (IPV4_RE, IP_TOKEN),
    (PHONE_RE, PHONE_TOKEN),
)


def pii_counts(text: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_ips, n_phones) — match counts on the RAW text
    (each count is independent of the others; counting precedes any
    replacement, so overlap resolution — an IP inside an email's
    domain — follows the raw-text match semantics of each pattern)."""
    return (
        F.regexp_count(text, F.lit(EMAIL_RE)),
        F.regexp_count(text, F.lit(IPV4_RE)),
        F.regexp_count(text, F.lit(PHONE_RE)),
    )


def pii_scrub(text: Column) -> Column:
    """Redacted text: every PII span replaced by its typed placeholder
    in the documented email → IP → phone order."""
    out = text
    for pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts_sql(text_expr: str) -> str:
    """DuckDB twin of :func:`pii_counts` — three count expressions
    (comma-joined) aliased n_emails, n_ips, n_phones."""
    return ", ".join(
        f"CAST(len(regexp_extract_all({text_expr}, '{pat}')) AS INTEGER)"
        f" AS {name}"
        for pat, name in (
            (EMAIL_RE, "n_emails"),
            (IPV4_RE, "n_ips"),
            (PHONE_RE, "n_phones"),
        )
    )


def pii_scrub_sql(text_expr: str) -> str:
    """DuckDB twin of :func:`pii_scrub` (note the 'g' flag — DuckDB's
    regexp_replace is first-match-only by default, Spark's is global)."""
    out = text_expr
    for pat, token in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{token}', 'g')"
    return out
