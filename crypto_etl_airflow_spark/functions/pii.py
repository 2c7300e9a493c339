"""PII detection and redaction as pure column expressions.

The scrubbing stage of a pretraining-data pipeline (emails, phone
numbers, SSNs, IPv4 addresses — the categories every public curation
pipeline redacts). Everything here is a Java-regex column expression
(`regexp_count` / `regexp_replace`) so the whole pass stays inside
whole-stage codegen: no Python eval, no UDF, scan-shaped at 100 TB
(one embarrassingly-parallel projection, zero shuffles).

The patterns are deliberately restricted to syntax shared by Java
regex and RE2 (no backreferences, no lookaround) so the DuckDB oracle
in plans/curation.py evaluates the IDENTICAL pattern strings.

Reference scope anchor: the reference pipeline stores no free-text—
this surface exists for the engine's LLM-curation mandate (SURVEY.md
§7.5), not for parity with a specific reference operator.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered dict: redaction applies in this order. The \b anchors make
# the four categories disjoint on any text (a digit run inside an
# SSN/phone/IP never offers a mid-number word boundary), so order
# only matters for byte-identical oracle reproduction, not semantics.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}

PII_TOKENS: dict[str, str] = {
    "email": "<EMAIL>",
    "phone": "<PHONE>",
    "ssn": "<SSN>",
    "ipv4": "<IP>",
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category match counts (long) for one text column."""
    return {
        cat: F.regexp_count(text, F.lit(pat)).cast("long")
        for cat, pat in PII_PATTERNS.items()
    }


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its category token, applying the
    categories in ``PII_PATTERNS`` order (email → phone → ssn → ipv4)."""
    out = text
    for cat, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, PII_TOKENS[cat])
    return out
