"""Every registered query with an oracle must match DuckDB exactly at
sf0.01 — the local mirror of the driver's correctness gate."""

import pytest

from crypto_etl_airflow_spark.plans.registry import all_specs

from .conftest import SF_ORACLE
from .oracle import compare

SPECS = [s for s in all_specs().values() if s.oracle is not None]


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_oracle_parity(spark, spec):
    df = spec.builder(spark, SF_ORACLE)
    compare(df, spec.oracle, SF_ORACLE, name=spec.name)
