"""Every bench-flagged query must BUILD (analyze + plan) at sf0.001.

Round-7 post-mortem: a refactor changed an operator signature and the
two call sites in plans/retrieval.py kept the old kwargs — a TypeError
that no test caught, so the driver's bench crashed in its warm-up loop
and the round shipped with NO bench artifact (BENCH_r07.json rc=1).
This smoke test makes that failure mode a red test: building the plan
(builder call + .explain()) catches bad signatures, missing columns,
and unresolvable expressions without paying execution time.

A separate execution smoke covers runtime-only failures (e.g. a UDF
that crashes per-batch) for the bench set, via the SAME noop-sink
action bench.py times (ADVICE r16 item 3: the earlier count() variant
both duplicated a full execution per query and no longer reflected
the timed action — count() prunes the very expressions the bench now
measures).
"""

import pytest

from crypto_etl_airflow_spark.plans.registry import all_specs

from .conftest import SF_SMOKE

BENCH_SPECS = [s for s in all_specs().values() if s.bench]


@pytest.mark.parametrize("spec", BENCH_SPECS, ids=[s.name for s in BENCH_SPECS])
def test_bench_query_builds(spark, spec):
    df = spec.builder(spark, SF_SMOKE)
    # analysis + optimization happen here; raises on any plan error
    df.explain()


@pytest.mark.parametrize("spec", BENCH_SPECS, ids=[s.name for s in BENCH_SPECS])
def test_bench_query_materializes_via_noop_sink(spark, spec):
    # bench.py's timed action since r16: the noop sink computes EVERY
    # output column (count() prunes projection/aggregate values —
    # guide §1.4); this smoke pins that each bench query survives it
    spec.builder(spark, SF_SMOKE).write.format("noop").mode(
        "overwrite"
    ).save()
