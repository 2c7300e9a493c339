"""Input-parallelism guard shared by expression-heavy operators.

A small parquet table scans as fewer partitions than cores (one
modest file → one task), which serializes expensive per-row
expression stages (shingling, 64-dim dot products, bucket hashing)
on a single core while 31 sit idle. ``widen_small_input`` lifts such
inputs to the session's default parallelism — and is deliberately a
no-op at real scale, where input splits already exceed the core
count, so no shuffle is ever added to a big scan.

Cost discipline: the partition-count probe is memoized per DataFrame
object (operators call the guard on several inputs, sometimes the
same one twice), and every classic-only API (``df.rdd``,
``sparkContext``) is behind a try/except with a Spark-Connect-safe
fallback (``df.inputFiles()`` for scan width,
``spark.sql.shuffle.partitions`` for the target), so the guard
degrades instead of failing where the RDD API is unavailable.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

# df -> probed partition count. WeakKeyDictionary so memoization never
# pins a DataFrame (and its plan) in memory past its natural lifetime.
_probed: "weakref.WeakKeyDictionary[DataFrame, int]" = weakref.WeakKeyDictionary()


def _target_parallelism(df: DataFrame) -> int:
    try:
        return df.sparkSession.sparkContext.defaultParallelism
    except Exception:  # Spark Connect: no sparkContext on the client
        try:
            return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        except Exception:
            return 0


def _input_width(df: DataFrame) -> int | None:
    """Best-effort current parallelism of ``df``; None if unknowable."""
    try:
        return _probed[df]
    except (KeyError, TypeError):
        pass
    width: int | None
    try:
        # Scan width proxy, tried FIRST because it is metadata-only
        # (no physical planning): one task per input file is the
        # shape the guard exists to fix (few-file small tables).
        # Large files split into MORE tasks than files, so this
        # underestimates only on big scans — where a widening
        # repartition is cheap relative to the scan and the
        # expression stage it feeds. Measured: ~0.05 s vs ~0.2 s for
        # the df.rdd probe, paid per widened-operator call.
        files = df.inputFiles()
        width = len(files) if files else None
    except Exception:  # non-file sources / Spark Connect quirks
        width = None
    if width is None:
        try:
            # Classic Spark: exact, but forces physical planning + a
            # Java RDD handle — hence the memoization above.
            width = df.rdd.getNumPartitions()
        except Exception:  # Spark Connect: DataFrame.rdd unsupported
            width = None
    if width is not None:
        try:
            _probed[df] = width
        except TypeError:
            pass
    return width


def widen_small_input(df: DataFrame) -> DataFrame:
    target = _target_parallelism(df)
    if target <= 1:
        return df
    width = _input_width(df)
    if width is not None and width >= target:
        return df
    # Known-narrow input — or unknown width (Connect, non-file
    # source), where widening a small input matters more than avoiding
    # one extra narrow exchange and AQE coalesces the shuffle back
    # down if it was already wide.
    return df.repartition(target)
