"""SodaCL-subset parser: the reference's declarative check grammar.

The reference expresses its quality rules in SodaCL YAML
(reference include/soda/checks.yml:1-9):

    checks for crypto_prices:
      - min(price_usd):
          fail: when < 0
      - freshness(extracted_at):
          warn: when > 2h
          fail: when > 6h

This module parses exactly that subset — ``min``/``max`` thresholds,
``freshness`` with duration literals, plus the inline forms
``row_count > N``, ``missing_count(col) = 0`` and
``duplicate_count(col, ...) = 0`` — into this engine's
:class:`~.checks.Check` objects, so a user can carry their checks
file over unchanged. Hand-rolled indentation parser: the grammar is
line-oriented and tiny; a YAML dependency would be the heavier tool.
"""

from __future__ import annotations

import re

from .checks import (
    Check,
    blocked_content_percent,
    duplicate_percent,
    high_repetition_percent,
    freshness,
    low_quality_percent,
    max_value,
    min_value,
    not_null,
    pii_percent,
    row_count,
    unique_keys,
)

_DUR_UNITS = {"s": "seconds", "m": "minutes", "h": "hours", "d": "days"}

_HEADER = re.compile(r"^checks for\s+(\w+)\s*:\s*$")
_BLOCK = re.compile(
    r"^-\s*(min|max|freshness|duplicate_percent|pii_percent"
    r"|low_quality_percent|blocked_content_percent"
    r"|high_repetition_percent)\((\w+)\)\s*:\s*$"
)
_THRESH = re.compile(r"^(warn|fail)\s*:\s*when\s*([<>])\s*(\S+)\s*$")
_ROWCOUNT = re.compile(r"^-\s*row_count\s*>\s*(\d+)\s*$")
_MISSING = re.compile(r"^-\s*missing_count\((\w+)\)\s*=\s*0\s*$")
_DUPES = re.compile(r"^-\s*duplicate_count\(([\w,\s]+)\)\s*=\s*0\s*$")


def _duration(tok: str) -> str:
    """'2h' → '2 hours' (the checks module's duration format)."""
    m = re.fullmatch(r"(\d+(?:\.\d+)?)([smhd])", tok)
    if not m:
        raise ValueError(f"unsupported duration literal: {tok!r}")
    return f"{m.group(1)} {_DUR_UNITS[m.group(2)]}"


def _build(kind: str, column: str, thresholds: dict[str, tuple[str, str]]) -> Check:
    if kind == "min":
        kw = {}
        for sev, (op, val) in thresholds.items():
            if op != "<":
                raise ValueError(f"min({column}): only '<' thresholds supported")
            kw[f"{sev}_when_lt"] = float(val)
        return min_value(column, **kw)
    if kind == "max":
        kw = {}
        for sev, (op, val) in thresholds.items():
            if op != ">":
                raise ValueError(f"max({column}): only '>' thresholds supported")
            kw[f"{sev}_when_gt"] = float(val)
        return max_value(column, **kw)
    if kind == "freshness":
        kw = {}
        for sev, (op, val) in thresholds.items():
            if op != ">":
                raise ValueError(f"freshness({column}): only '>' supported")
            kw[{"warn": "warn_after", "fail": "fail_after"}[sev]] = _duration(val)
        return freshness(column, **kw)
    if kind in (
        "duplicate_percent",
        "pii_percent",
        "low_quality_percent",
        "blocked_content_percent",
        "high_repetition_percent",
    ):
        # corpus-health gates (Soda's duplicate_percent vocabulary,
        # extended to the curation metrics): percent thresholds 0-100
        kw = {}
        for sev, (op, val) in thresholds.items():
            if op != ">":
                raise ValueError(f"{kind}({column}): only '>' supported")
            kw[f"{sev}_when_gt"] = float(val.rstrip("%"))
        builder = {
            "duplicate_percent": duplicate_percent,
            "pii_percent": pii_percent,
            "low_quality_percent": low_quality_percent,
            "blocked_content_percent": blocked_content_percent,
            "high_repetition_percent": high_repetition_percent,
        }[kind]
        return builder(column, **kw)
    raise ValueError(f"unknown check kind: {kind}")


def parse_checks(text: str) -> tuple[str, list[Check]]:
    """Parse a SodaCL-subset document → (table_name, checks)."""
    table: str | None = None
    checks: list[Check] = []
    pending: tuple[str, str, dict] | None = None  # (kind, col, thresholds)

    def flush() -> None:
        nonlocal pending
        if pending is not None:
            kind, col, thresholds = pending
            if not thresholds:
                raise ValueError(f"{kind}({col}): no thresholds given")
            checks.append(_build(kind, col, thresholds))
            pending = None

    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if m := _HEADER.match(line):
            table = m.group(1)
            continue
        if m := _BLOCK.match(line):
            flush()
            pending = (m.group(1), m.group(2), {})
            continue
        if m := _THRESH.match(line):
            if pending is None:
                raise ValueError(f"threshold outside a check block: {raw!r}")
            pending[2][m.group(1)] = (m.group(2), m.group(3))
            continue
        flush()
        if m := _ROWCOUNT.match(line):
            checks.append(row_count(fail_when_lt=int(m.group(1)) + 1))
        elif m := _MISSING.match(line):
            checks.append(not_null(m.group(1)))
        elif m := _DUPES.match(line):
            keys = [k.strip() for k in m.group(1).split(",")]
            checks.append(unique_keys(keys))
        else:
            raise ValueError(f"unparseable check line: {raw!r}")
    flush()
    if table is None:
        raise ValueError("missing 'checks for <table>:' header")
    return table, checks
