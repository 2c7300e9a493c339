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

import os
import weakref
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame

# df -> probed partition count. WeakKeyDictionary so memoization never
# pins a DataFrame (and its plan) in memory past its natural lifetime.
_probed: "weakref.WeakKeyDictionary[DataFrame, int]" = weakref.WeakKeyDictionary()

_BYTE_SUFFIX = {
    "": 1, "b": 1,
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40,
}


def _parse_bytes(value: str) -> int:
    """Spark byte-string conf values: "134217728", "134217728b",
    "128MB", ... (the JavaUtils.byteStringAs surface the file-source
    confs accept)."""
    s = value.strip().lower()
    digits = s.rstrip("kmgtb")
    return int(digits) * _BYTE_SUFFIX[s[len(digits):]]


def _target_parallelism(df: DataFrame) -> int:
    try:
        return df.sparkSession.sparkContext.defaultParallelism
    except Exception:  # Spark Connect: no sparkContext on the client
        try:
            return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        except Exception:
            return 0


def _estimated_scan_tasks(df: DataFrame, files: list[str]) -> int | None:
    """Task count the file-source split planner would produce for
    these files — the same arithmetic FilePartition uses: splittable
    files are cut at ``maxSplitBytes = min(maxPartitionBytes,
    max(openCostInBytes, (Σbytes + nfiles·openCost) / parallelism))``.
    A bare ``len(files)`` proxy calls a few LARGE splittable files
    "narrow" and widens them with a corpus-sized shuffle the scan
    never needed; folding sizes in keeps the probe metadata-only
    (os.stat, no physical planning) while agreeing with the planner
    on exactly the case that matters. None when any file is on a
    scheme we cannot stat locally (hdfs://, s3:// from the driver's
    POV) — the caller falls back to the exact rdd probe there."""
    sizes = []
    for u in files:
        parsed = urlparse(u)
        if parsed.scheme not in ("file", ""):
            return None
        try:
            sizes.append(os.stat(unquote(parsed.path) or u).st_size)
        except OSError:
            return None
    conf = df.sparkSession.conf
    try:
        mpb = _parse_bytes(conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
        open_cost = _parse_bytes(conf.get("spark.sql.files.openCostInBytes", "4MB"))
    except Exception:
        mpb, open_cost = 128 << 20, 4 << 20
    parallelism = max(_target_parallelism(df), 1)
    padded_total = sum(sizes) + open_cost * len(sizes)
    max_split = max(1, min(mpb, max(open_cost, padded_total // parallelism)))
    # per-file split count; bin-packing can only merge pieces, so this
    # upper-bounds the real task count — an overestimate skips a widen
    # on an already-wide scan (cheap), never widens a wide one
    return sum(max(1, -(-s // max_split)) for s in sizes)


def _input_width(df: DataFrame) -> int | None:
    """Best-effort current parallelism of ``df``; None if unknowable."""
    try:
        return _probed[df]
    except (KeyError, TypeError):
        pass
    width: int | None
    try:
        # Scan width proxy, tried FIRST because it is metadata-only
        # (no physical planning, ~4× cheaper than the df.rdd probe):
        # file count folded with file SIZES through the planner's own
        # split arithmetic, so few-file-small tables (the shape the
        # guard exists to fix) read as narrow while few-file-LARGE
        # splittable tables read as the many tasks they really scan as.
        files = df.inputFiles()
        width = _estimated_scan_tasks(df, files) if files else None
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
