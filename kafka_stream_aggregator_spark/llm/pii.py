"""PII detection and redaction (SURVEY.md §2.B "PII / quality filters").

A regex bank over common identifier shapes; detection emits per-doc
flags/counts (boolean agg friendly), redaction rewrites matches with
typed placeholders. Pure regexp_* expressions — per-row, no shuffles,
codegen'd; the bank is deliberately conservative (high precision) since
at 100 TB a false-positive rate of 0.1% is a million mangled docs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PII_PATTERNS: dict[str, str] = {
    # local-part@domain.tld (conservative: word chars, dots, +, -)
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # international-ish phone: optional +CC, 3 groups, separators
    "phone": r"\+?\d{1,3}[-. ]\d{3}[-. ]\d{3,4}[-. ]?\d{0,4}",
    # US SSN shape
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    # 16-digit card number with optional group separators
    "card": r"\b\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{4}\b",
    # IPv4
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_counts(text: Column) -> Column:
    """struct of per-kind match counts."""
    return F.struct(
        *[
            F.size(F.regexp_extract_all(text, F.lit(pat), 0)).alias(kind)
            for kind, pat in PII_PATTERNS.items()
        ]
    )


def has_pii(text: Column) -> Column:
    out = F.lit(False)
    for pat in PII_PATTERNS.values():
        out = out | (F.size(F.regexp_extract_all(text, F.lit(pat), 0)) > 0)
    return out


def redact(text: Column) -> Column:
    """Replace each PII kind with a typed placeholder, longest/most
    specific patterns first (card before phone so grouped digits don't
    half-match)."""
    out = text
    for kind in ("email", "ssn", "card", "ipv4", "phone"):
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out
