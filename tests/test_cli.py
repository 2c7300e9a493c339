"""CLI entry: one pipeline run from files, gate enforced."""

import json

import pytest

from crypto_etl_airflow_spark.__main__ import main
from crypto_etl_airflow_spark.quality.checks import QualityGateError

CHECKS = """
checks for crypto_prices:
  - min(price_usd):
      fail: when < 0
  - row_count > 0
"""


def _write(tmp_path, name, obj):
    p = tmp_path / name
    p.write_text(json.dumps(obj) if not isinstance(obj, str) else obj)
    return str(p)


def test_cli_ingest_and_gate_pass(spark, tmp_path, capsys):
    payload = _write(
        tmp_path, "p.json", {"bitcoin": {"usd": 97000.0}, "solana": {"usd": 210.0}}
    )
    checks = _write(tmp_path, "c.yml", CHECKS)
    rc = main(
        [
            "--warehouse", str(tmp_path / "wh"),
            "--payload-json", payload,
            "--checks", checks,
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "rows_written=2" in out
    assert "[PASS] min_value(price_usd)" in out
    assert spark.read.parquet(str(tmp_path / "wh")).count() == 2


def test_cli_gate_blocks_bad_data(tmp_path):
    payload = _write(tmp_path, "p.json", {"bitcoin": {"usd": -1.0}})
    checks = _write(tmp_path, "c.yml", CHECKS)
    with pytest.raises(QualityGateError):
        main(
            [
                "--warehouse", str(tmp_path / "wh2"),
                "--payload-json", payload,
                "--checks", checks,
            ]
        )
