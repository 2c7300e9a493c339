"""Interval (time-bounded) joins — batch and stream-stream.

Correlating two event flows within a time window ("errors within 10
minutes before a click, same user") is a range join in batch and a
stream-stream join in streaming. The SAME transformation serves
both: Spark plans the batch case as an equi-join on the key with a
range residual, and the streaming case as a watermarked symmetric
hash join whose state retention is derived from the time bounds
(both sides MUST be watermarked or state grows forever).

Scale posture: the equi-key carries the shuffle; the time bound only
prunes state/matches. A pure time-range join with no equi-key would
be a cross-product per time bucket — always key it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    how: str = "inner",
) -> DataFrame:
    """Join rows with equal ``keys`` whose timestamps satisfy
    ``left_ts - lower <= right_ts <= left_ts + upper`` (interval
    literals, e.g. ``"10 minutes"``; use ``"0 seconds"`` for a
    one-sided bound).

    Columns must be disjoint apart from ``keys`` (alias beforehand).
    """
    cond = None
    for k in keys:
        c = left[k] == right[k]
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (right[right_ts] >= left[left_ts] - F.expr(f"INTERVAL {lower}"))
        & (right[right_ts] <= left[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    joined = left.join(right, cond, how)
    # drop the right side's copy of the equi-keys
    return joined.drop(*[right[k] for k in keys])
