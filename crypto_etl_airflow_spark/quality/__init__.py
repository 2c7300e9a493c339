from .checks import (
    Check,
    CheckResult,
    QualityGateError,
    ScanResult,
    freshness,
    min_value,
    max_value,
    not_null,
    row_count,
    run_scan,
    unique_keys,
)

__all__ = [
    "Check",
    "CheckResult",
    "QualityGateError",
    "ScanResult",
    "freshness",
    "min_value",
    "max_value",
    "not_null",
    "row_count",
    "run_scan",
    "unique_keys",
]
