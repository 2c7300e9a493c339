"""Deterministic splits and samples for training pipelines.

Train/val/test splits over 100 TB must be (a) deterministic — the
same row lands in the same split on every run, every cluster, with
no RNG state — and (b) key-stable, so all rows of one document/user
stay together. Both come from hashing the key into a fixed bucket
space: bucket = first 8 hex digits of md5(key) as an integer mod
10_000. md5 (not xxhash64) so external systems — and the DuckDB
oracle — can reproduce the assignment bit-for-bit.

``sampleBy``/``rand()``-based sampling is the opposite trade
(nondeterministic unless seeded AND partition-stable); hash-split is
what you version a dataset with.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(key: Column | str, buckets: int = BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets): md5-derived, engine- and
    run-independent."""
    h = F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 8), 16, 10)
    return (h.cast("long") % buckets).alias("bucket")


def hash_split(
    df: DataFrame, key: str, fractions: dict[str, float], buckets: int = BUCKETS
) -> DataFrame:
    """Assign every row a split label by key hash.

    ``fractions`` maps split name → fraction (must sum to ≤ 1; the
    remainder is unassigned → label NULL). Contiguous bucket ranges:
    e.g. {"train": .9, "val": .05, "test": .05} gives
    [0, 9000) / [9000, 9500) / [9500, 10000).
    """
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    b = hash_bucket(key, buckets)
    expr = F.lit(None).cast("string")
    hi = buckets
    # build the CASE from the last range backwards
    bounds = []
    lo = 0
    for name, frac in fractions.items():
        width = int(round(frac * buckets))
        bounds.append((name, lo, lo + width))
        lo += width
    for name, lo_, hi_ in reversed(bounds):
        expr = F.when((b >= lo_) & (b < hi_), name).otherwise(expr)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    buckets: int = BUCKETS,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its key
    hash-bucket falls below its stratum's fraction. The corpus-
    rebalancing primitive (e.g. downsample the dominant language while
    keeping rare ones whole) with the same engine-reproducible md5
    bucketing as :func:`hash_split` — no RNG, no partition
    sensitivity, and the SAME rows survive on every run, engine, and
    cluster. Strata missing from ``fractions`` use ``default``.
    """
    b = hash_bucket(key, buckets)
    thr = F.lit(int(round(default * buckets)))
    for name, frac in fractions.items():
        thr = F.when(
            F.col(strata_col) == name, F.lit(int(round(frac * buckets)))
        ).otherwise(thr)
    return df.filter(b < thr)
