"""The certification rotation is computed from the driver's own
CORRECTNESS artifacts (VERDICT r7 item 3: a hand-maintained priority
list cannot keep a growing surface fresh within the driver's 50-slot
per-round cap). These tests pin the ordering contract."""

import json

from crypto_etl_airflow_spark.plans.registry import (
    all_specs,
    certification_order,
)


def _write(path, rows):
    path.write_text(json.dumps(rows))


def test_order_new_and_red_first_then_stalest(tmp_path):
    _write(
        tmp_path / "CORRECTNESS_r01.json",
        {
            "a": {"hash_match": True, "rows_match": True},
            "b": {"hash_match": True, "rows_match": True},
        },
    )
    _write(
        tmp_path / "CORRECTNESS_r02.json",
        {
            "b": {"hash_match": True, "rows_match": True},
            # rows-only queries (no oracle) count as green
            "c": {"hash_match": None, "rows_match": True},
            # latest row red -> must re-certify first
            "d": {"hash_match": False, "rows_match": True},
        },
    )
    names = ["a", "b", "c", "d", "e"]  # e: never certified
    got = certification_order(names, root=tmp_path)
    # d/e (red/new, registration order), then a (green r1, stalest),
    # then b/c (green r2, registration order)
    assert got == ["d", "e", "a", "b", "c"]


def test_red_then_green_later_round_counts_as_green(tmp_path):
    _write(
        tmp_path / "CORRECTNESS_r01.json",
        {"a": {"hash_match": False, "rows_match": False}},
    )
    _write(
        tmp_path / "CORRECTNESS_r02.json",
        {"a": {"hash_match": True, "rows_match": True}},
    )
    assert certification_order(["a", "b"], root=tmp_path) == ["b", "a"]


def test_missing_artifacts_fall_back_to_registration_order(tmp_path):
    names = ["x", "y", "z"]
    assert certification_order(names, root=tmp_path) == names


def test_live_registry_puts_uncertified_before_certified():
    """Against the real repo artifacts: every query with no green
    driver row yet must sort before every query with one."""
    from pathlib import Path

    from crypto_etl_airflow_spark.plans.registry import _latest_driver_rows

    root = Path(__file__).resolve().parents[1]
    latest = _latest_driver_rows(root)
    ordered = list(all_specs())
    seen_certified = False
    for n in ordered:
        row = latest.get(n)
        green = row is not None and row[1]
        if green:
            seen_certified = True
        else:
            assert not seen_certified, (
                f"{n} (uncertified) sorted after a certified query"
            )
