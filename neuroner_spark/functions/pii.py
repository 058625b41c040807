"""PII detection + redaction for web-corpus preparation (SURVEY.md §2
extension set — the C4/Dolma-style anonymization gate that runs before
a crawl snapshot becomes training data).

All pure ``regexp_replace`` / ``regexp_count`` column expressions —
JVM-side, whole-stage codegen, zero shuffle, zero Python.  At 10^12
pages this is a narrow projection folded into the same scan as the
quality gates.

Pattern portability contract: every regex here is valid AND
semantically identical under Java ``java.util.regex`` (Spark) and RE2
(DuckDB) — no backreferences, no lookaround, only greedy quantifiers
whose leftmost match agrees between backtracking and automaton
engines.  This is what makes the ``pii_redaction`` driver oracle a
byte-level check (md5 of the redacted text) rather than a count-only
one.

Replacement ORDER is part of the semantics: emails first (their local
part may contain digits and dots that the looser patterns would eat),
then IPv4 (dotted quads would otherwise half-match the phone shape),
then phones.  Callers composing their own chains must keep that order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# RFC-ish practical email matcher (the Dolma/CC-pipeline shape, not
# full RFC 5322 — quoted local parts are not worth the false-positive
# surface on web text).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

# Dotted quad.  \b guards keep version strings like 1.2.3.4.5 from
# contributing their prefix; octet range (0-255) is deliberately NOT
# enforced — C4-style pipelines redact the lexical shape because a
# leaked 999.1.1.1 is still a redaction miss if the pattern is strict.
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"

# NANP-style 3-3-4 with required separators (space, dot, or dash).
# Requiring the separators keeps 10-digit ids in URLs/numbers out;
# parenthesized area codes are normalized by the email/IP passes never
# touching parens, so (555) 123-4567 is matched via the optional-paren
# alternation below.
PHONE_RE = r"(?:\(\d{3}\)[ .-]?|\b\d{3}[ .-])\d{3}[ .-]\d{4}\b"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def pii_counts(col: Column) -> list[Column]:
    """Per-category PII hit counts (audit side of the gate).

    Returns [n_email, n_ip, n_phone] LONG columns.  Counts are taken
    on the RAW text, in the same order the redaction chain applies, so
    ``n_*`` is exactly the number of tokens ``redact_pii`` inserts for
    that category (the phone count is taken after the email+IP
    replacement to mirror the chain — an IP that half-looks like a
    phone must not double-count).
    """
    after_email = F.regexp_replace(col, EMAIL_RE, EMAIL_TOKEN)
    after_ip = F.regexp_replace(after_email, IPV4_RE, IP_TOKEN)
    return [
        F.regexp_count(col, F.lit(EMAIL_RE)).cast("long").alias("n_email"),
        F.regexp_count(after_email, F.lit(IPV4_RE)).cast("long").alias("n_ip"),
        F.regexp_count(after_ip, F.lit(PHONE_RE)).cast("long").alias("n_phone"),
    ]


def redact_pii(col: Column) -> Column:
    """Replace emails, IPv4s, then phones with typed placeholder
    tokens.  Chain order is load-bearing — see module docstring."""
    out = F.regexp_replace(col, EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, IPV4_RE, IP_TOKEN)
    return F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)


def pii_sql_exprs(text_expr: str) -> dict[str, str]:
    """DuckDB-SQL twins of the column expressions above, for oracle
    construction.  Keys: redacted, n_email, n_ip, n_phone."""
    esc = lambda p: p.replace("'", "''")
    after_email = f"regexp_replace({text_expr}, '{esc(EMAIL_RE)}', '{EMAIL_TOKEN}', 'g')"
    after_ip = f"regexp_replace({after_email}, '{esc(IPV4_RE)}', '{IP_TOKEN}', 'g')"
    redacted = f"regexp_replace({after_ip}, '{esc(PHONE_RE)}', '{PHONE_TOKEN}', 'g')"
    n = lambda src, p: f"CAST(len(regexp_extract_all({src}, '{esc(p)}')) AS BIGINT)"
    return {
        "redacted": redacted,
        "n_email": n(text_expr, EMAIL_RE),
        "n_ip": n(after_email, IPV4_RE),
        "n_phone": n(after_ip, PHONE_RE),
    }
