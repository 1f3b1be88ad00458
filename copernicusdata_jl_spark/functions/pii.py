"""☆ PII redaction for training corpora (north-rule extension).

Emails, IPv4 addresses, and international phone numbers are replaced with
typed placeholder tokens before text ships to training — the standard
scrub pass (e.g. BigScience ROOTS, Subramani et al. 2023). Everything is
pure Catalyst ``regexp_replace`` / ``regexp_count`` — whole-stage codegen,
no Python on the data path — with a character-identical DuckDB twin (the
patterns below are valid and equivalent in both Java regex and RE2; no
lookarounds, no backreferences).

Order matters and is fixed: emails first (an IP embedded in an email's
domain, e.g. ``a@192.168.0.1.example.com``, is attributed to the email —
though a bare all-numeric domain is no email: the pattern requires an
alphabetic TLD, so ``a@192.168.0.1`` falls through to the IP rule), then
phones, then IPs.

Reference provenance: the reference has no text layer; the expr+SQL twin
structure mirrors functions/url.py (the other crawl-hygiene scalar family).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Patterns restricted to the Java-regex ∩ RE2 common subset.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+\d{1,2}[ -]\d{3}[ -]\d{3}[ -]\d{4}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"

_RULES: list[tuple[str, str, str]] = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("phone", PHONE_RE, "<PHONE>"),
    ("ipv4", IPV4_RE, "<IP>"),
]


def redact_pii_expr(text: Column) -> Column:
    """Text with all PII classes replaced by placeholder tokens."""
    out = text
    for _, pat, tok in _RULES:
        out = F.regexp_replace(out, pat, tok)
    return out


def redact_pii_sql(text_expr: str) -> str:
    out = text_expr
    for _, pat, tok in _RULES:
        out = f"regexp_replace({out}, '{pat}', '{tok}', 'g')"
    return out


def pii_count_expr(text: Column, kind: str) -> Column:
    """Match count for one PII class — counted on the ORIGINAL text, but
    after upstream rules are applied (so an IP inside an email's domain is
    attributed to the email, matching the redaction order)."""
    masked = text
    for name, pat, tok in _RULES:
        if name == kind:
            return F.regexp_count(masked, F.lit(pat))
        masked = F.regexp_replace(masked, pat, tok)
    raise KeyError(kind)


def pii_count_sql(text_expr: str, kind: str) -> str:
    masked = text_expr
    for name, pat, tok in _RULES:
        if name == kind:
            return f"len(regexp_extract_all({masked}, '{pat}'))"
        masked = f"regexp_replace({masked}, '{pat}', '{tok}', 'g')"
    raise KeyError(kind)
