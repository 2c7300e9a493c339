"""Declarative data-quality checks → ONE aggregation job → gate.

Re-expresses the reference's Soda scan (reference
include/soda/checks.yml:1-9 compiled and executed at
dags/crypto-etl-pipeline-psql.py:109-130; SURVEY.md §2.6 Q1-Q4):
a declarative check set is compiled to aggregate measures, evaluated
against thresholds with two severity levels, and a fail-level
violation halts the pipeline.

Design:
- every check contributes one or more Column expressions; **all
  measures run in a single ``df.agg(...)`` job** (one pass over the
  data — at 100 TB you cannot afford one scan per check);
- thresholds are evaluated driver-side on the scalar results;
- ``warn`` logs, ``fail`` raises :class:`QualityGateError` (the
  reference's nonzero-exit → ValueError → DAG halt, :129-130).

The reference's exact rule set is reproduced by::

    checks = [
        min_value("price_usd", fail_when_lt=0),          # checks.yml:3-4
        freshness("extracted_at", warn_after="2 hours",  # checks.yml:7-9
                  fail_after="6 hours"),
    ]
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PASS, WARN, FAIL = "pass", "warn", "fail"


class QualityGateError(RuntimeError):
    """Raised when any fail-level check is violated (gate semantics)."""


@dataclass(frozen=True)
class Check:
    """One declarative rule.

    ``measures`` maps measure-name → Column aggregate expression;
    ``evaluate(values)`` receives the computed scalars and returns
    (outcome, detail).
    """

    name: str
    measures: dict[str, Any]
    evaluate: Any  # Callable[[dict[str, Any]], tuple[str, str]]


@dataclass(frozen=True)
class CheckResult:
    name: str
    outcome: str  # pass | warn | fail
    detail: str
    values: dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class ScanResult:
    results: tuple[CheckResult, ...]

    @property
    def failed(self) -> bool:
        return any(r.outcome == FAIL for r in self.results)

    @property
    def warned(self) -> bool:
        return any(r.outcome == WARN for r in self.results)

    def enforce(self) -> "ScanResult":
        """Gate: raise on fail-level violations (reference :129-130)."""
        if self.failed:
            bad = [r for r in self.results if r.outcome == FAIL]
            raise QualityGateError(
                "Quality gate failed: "
                + "; ".join(f"{r.name}: {r.detail}" for r in bad)
            )
        return self

    def log_text(self) -> str:
        """Audit log (reference :126 scan.get_logs_text())."""
        return "\n".join(
            f"[{r.outcome.upper():4}] {r.name}: {r.detail}" for r in self.results
        )


def _parse_duration(s: str) -> dt.timedelta:
    qty, unit = s.split()
    qty = float(qty)
    unit = unit.rstrip("s")
    return dt.timedelta(
        **{
            {"second": "seconds", "minute": "minutes", "hour": "hours", "day": "days"}[
                unit
            ]: qty
        }
    )


def min_value(
    column: str,
    fail_when_lt: float | None = None,
    warn_when_lt: float | None = None,
) -> Check:
    """``min(column)`` threshold — the reference's non-negative-price
    rule (checks.yml:3-4: ``fail: when < 0``)."""
    m = f"min_{column}"

    def ev(v: dict[str, Any]) -> tuple[str, str]:
        val = v[m]
        if val is None:
            return FAIL, f"min({column}) is NULL (no rows?)"
        if fail_when_lt is not None and val < fail_when_lt:
            return FAIL, f"min({column})={val} < {fail_when_lt}"
        if warn_when_lt is not None and val < warn_when_lt:
            return WARN, f"min({column})={val} < {warn_when_lt}"
        return PASS, f"min({column})={val}"

    return Check(f"min_value({column})", {m: F.min(column)}, ev)


def max_value(
    column: str,
    fail_when_gt: float | None = None,
    warn_when_gt: float | None = None,
) -> Check:
    m = f"max_{column}"

    def ev(v: dict[str, Any]) -> tuple[str, str]:
        val = v[m]
        if val is None:
            return FAIL, f"max({column}) is NULL (no rows?)"
        if fail_when_gt is not None and val > fail_when_gt:
            return FAIL, f"max({column})={val} > {fail_when_gt}"
        if warn_when_gt is not None and val > warn_when_gt:
            return WARN, f"max({column})={val} > {warn_when_gt}"
        return PASS, f"max({column})={val}"

    return Check(f"max_value({column})", {m: F.max(column)}, ev)


def freshness(
    column: str,
    warn_after: str = "2 hours",
    fail_after: str = "6 hours",
    now: dt.datetime | None = None,
) -> Check:
    """``now() - max(column)`` vs duration thresholds — the
    reference's freshness SLO (checks.yml:7-9). ``now`` is injectable
    for deterministic tests; defaults to UTC wall clock."""
    m = f"max_{column}"
    warn_td, fail_td = _parse_duration(warn_after), _parse_duration(fail_after)

    def ev(v: dict[str, Any]) -> tuple[str, str]:
        val = v[m]
        if val is None:
            return FAIL, f"freshness({column}): no rows"
        ref = now or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        age = ref - val
        if age > fail_td:
            return FAIL, f"freshness({column}): age={age} > {fail_after}"
        if age > warn_td:
            return WARN, f"freshness({column}): age={age} > {warn_after}"
        return PASS, f"freshness({column}): age={age}"

    return Check(f"freshness({column})", {m: F.max(column)}, ev)


def row_count(fail_when_lt: int = 1) -> Check:
    """Emptiness guard — the reference's raise-on-empty (:45-46,:76-77)."""

    def ev(v: dict[str, Any]) -> tuple[str, str]:
        n = v["row_count"]
        if n < fail_when_lt:
            return FAIL, f"row_count={n} < {fail_when_lt}"
        return PASS, f"row_count={n}"

    return Check("row_count", {"row_count": F.count(F.lit(1))}, ev)


def not_null(column: str) -> Check:
    m = f"nulls_{column}"

    def ev(v: dict[str, Any]) -> tuple[str, str]:
        n = v[m]
        return (FAIL, f"{n} NULLs in {column}") if n else (PASS, f"no NULLs in {column}")

    return Check(
        f"not_null({column})",
        {m: F.count(F.when(F.col(column).isNull(), 1))},
        ev,
    )


def unique_keys(keys: list[str]) -> Check:
    """Composite-key uniqueness — the reference's PRIMARY KEY
    (crypto_id, extracted_at) as a checked (not enforced) constraint
    (SURVEY.md §2.1 S4)."""
    kname = "_".join(keys)

    def ev(v: dict[str, Any]) -> tuple[str, str]:
        dupes = v["row_count_uq"] - v[f"distinct_{kname}"]
        if dupes:
            return FAIL, f"{dupes} duplicate keys on ({', '.join(keys)})"
        return PASS, f"keys unique on ({', '.join(keys)})"

    return Check(
        f"unique_keys({kname})",
        {
            "row_count_uq": F.count(F.lit(1)),
            f"distinct_{kname}": F.count_distinct(*[F.col(k) for k in keys]),
        },
        ev,
    )


def _percent_check(
    name: str,
    key: str,
    numerator,
    denominator,
    warn_when_gt: float | None,
    fail_when_gt: float | None,
) -> Check:
    """Shared shape of the corpus-health gates: pct = 100·num/den from
    two aggregate measures, warn/fail on '>' thresholds. ``key`` must
    be UNIQUE per (check kind, parameters) — run_scan merges every
    check's measures into one dict, so colliding keys would silently
    evaluate one check against another's scalars (the same reason
    min_value keys on ``min_{column}``)."""
    nk, dk = f"{key}_num", f"{key}_den"

    def ev(v: dict[str, Any]) -> tuple[str, str]:
        den = v[dk]
        num = v[nk] or 0
        pct = 0.0 if not den else 100.0 * num / den
        detail = f"{name}={pct:.3f}%"
        if fail_when_gt is not None and pct > fail_when_gt:
            return FAIL, f"{detail} > {fail_when_gt}"
        if warn_when_gt is not None and pct > warn_when_gt:
            return WARN, f"{detail} > {warn_when_gt}"
        return PASS, detail

    return Check(name, {nk: numerator, dk: denominator}, ev)


def duplicate_percent(
    text_col: str = "text",
    warn_when_gt: float | None = None,
    fail_when_gt: float | None = None,
) -> Check:
    """Percent of NON-NULL rows whose normalized text duplicates
    another row — the corpus-health metric the dedup family acts on,
    here as a GATE (Soda's ``duplicate_percent``). NULL texts are in
    neither numerator nor denominator (a NULL is missing, not a
    duplicate — ``not_null`` is the gate for missing values). One
    count + one count_distinct over the md5 fingerprint inside the
    scan's single aggregation job."""
    from ..functions.text import fingerprint

    fp = fingerprint(F.col(text_col))
    return _percent_check(
        f"duplicate_percent({text_col})",
        f"dup_{text_col}",
        F.count(fp) - F.count_distinct(fp),  # count(fp) skips NULLs
        F.count(fp),
        warn_when_gt,
        fail_when_gt,
    )


def pii_percent(
    text_col: str = "text",
    warn_when_gt: float | None = None,
    fail_when_gt: float | None = None,
) -> Check:
    """Percent of non-null rows containing ANY detectable PII
    (functions/pii.py patterns) — the gate a curation pipeline runs
    AFTER redaction, where the expected value is 0. Pure regexp
    aggregates inside the single scan job."""
    from ..functions.pii import pii_counts

    c = pii_counts(F.col(text_col))
    any_pii = sum(c.values()) > F.lit(0)  # NULL text → NULL → sum skips
    return _percent_check(
        f"pii_percent({text_col})",
        f"pii_{text_col}",
        F.sum(any_pii.cast("int")),
        F.count(F.col(text_col)),
        warn_when_gt,
        fail_when_gt,
    )


def low_quality_percent(
    text_col: str = "text",
    min_score: float = 0.5,
    warn_when_gt: float | None = None,
    fail_when_gt: float | None = None,
) -> Check:
    """Percent of non-null rows scoring below ``min_score`` on the
    composite quality heuristic (functions/text.py::quality_score) —
    the quality-distribution gate of a training-data ingest."""
    from ..functions.text import quality_score

    low = quality_score(F.col(text_col)) < min_score
    score_tag = str(min_score).replace(".", "_")
    return _percent_check(
        f"low_quality_percent({text_col}, <{min_score})",
        f"lq_{text_col}_{score_tag}",
        F.sum(low.cast("int")),
        F.count(F.col(text_col)),
        warn_when_gt,
        fail_when_gt,
    )


def blocked_content_percent(
    text_col: str = "text",
    warn_when_gt: float | None = None,
    fail_when_gt: float | None = None,
) -> Check:
    """Percent of non-null rows containing a blocklisted link domain
    or a blocklisted token (functions/blocklists.py) — the C4-style
    lexical gate a curation pipeline runs AFTER URL/word filtering,
    where the expected value is 0. Pure regex + array expressions
    inside the scan's single aggregation job; per-row flag semantics
    are oracle-certified by `text_blocklist_filter`."""
    from ..functions.blocklists import bad_word_count, blocked_domain_count

    t = F.col(text_col)
    hit = (blocked_domain_count(t) > 0) | (bad_word_count(t) > 0)
    return _percent_check(
        f"blocked_content_percent({text_col})",
        f"blk_{text_col}",
        F.sum(hit.cast("int")),  # NULL text → NULL flag → sum skips
        F.count(t),
        warn_when_gt,
        fail_when_gt,
    )


def high_repetition_percent(
    text_col: str = "text",
    max_dup_line_frac: float = 0.3,
    warn_when_gt: float | None = None,
    fail_when_gt: float | None = None,
) -> Check:
    """Percent of non-null rows whose duplicate-line fraction exceeds
    ``max_dup_line_frac`` (the Gopher repetition threshold family —
    per-row signal semantics oracle-certified by
    `text_repetition_signals`). Shuffle-free array expressions in the
    single scan job."""
    lines = F.split(F.col(text_col), "\n")
    norm = F.transform(lines, lambda x: F.trim(F.lower(x)))
    frac = 1 - F.size(F.array_distinct(norm)) / F.size(lines)
    tag = str(max_dup_line_frac).replace(".", "_")
    return _percent_check(
        f"high_repetition_percent({text_col}, >{max_dup_line_frac})",
        f"rep_{text_col}_{tag}",
        F.sum((frac > max_dup_line_frac).cast("int")),
        F.count(F.col(text_col)),
        warn_when_gt,
        fail_when_gt,
    )


def run_scan(df: DataFrame, checks: list[Check]) -> ScanResult:
    """Compile all measures into one agg job, evaluate all thresholds.

    Exactly one Spark action regardless of the number of checks.
    """
    measures: dict[str, Any] = {}
    for c in checks:
        measures.update(c.measures)
    if not measures:
        return ScanResult(())
    row = df.agg(*[expr.alias(name) for name, expr in measures.items()]).collect()[0]
    values = row.asDict()
    results = []
    for c in checks:
        outcome, detail = c.evaluate(values)
        results.append(
            CheckResult(
                c.name, outcome, detail, {k: values[k] for k in c.measures}
            )
        )
    return ScanResult(tuple(results))
