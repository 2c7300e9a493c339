"""Per-micro-batch quality gate for streaming sinks.

The reference gates every hourly load with a Soda scan before
downstream consumers see it (reference
dags/crypto-etl-pipeline-psql.py:109-130). Streaming form: wrap the
foreachBatch sink so every micro-batch is scanned (ONE aggregation
job over the batch, quality/checks.py) before it is written —
fail-level violations raise, which fails the micro-batch and stops
the query; the checkpoint guarantees the poisoned batch is NOT
committed and reprocesses on restart.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from ..quality.checks import Check, run_scan


def gated_batch_writer(
    checks: list[Check],
    write: Callable[[DataFrame, int], None],
    on_warn: Callable[[str], None] | None = None,
) -> Callable[[DataFrame, int], None]:
    """Wrap a foreachBatch ``write(batch_df, batch_id)`` with the
    quality gate: scan → enforce → write."""

    def gated(batch_df: DataFrame, batch_id: int) -> None:
        result = run_scan(batch_df, checks)
        if result.warned and on_warn is not None:
            on_warn(result.log_text())
        result.enforce()
        write(batch_df, batch_id)

    return gated
