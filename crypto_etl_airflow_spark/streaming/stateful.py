"""Custom stateful streaming operator via ``applyInPandasWithState``.

The UDAF/UDTF-shaped extension point of the streaming surface
(SURVEY.md §2.9): arbitrary per-key state carried across
micro-batches, with Arrow-batched transfer. Here: running per-user
statistics — each micro-batch a user appears in emits that user's
cumulative (count, total, first/last event time) so far.

Scale posture: state is partitioned by the grouping key across
executors and persisted in the state store through the checkpoint;
the Python worker only ever sees one key's rows per call, Arrow
batch at a time — no driver collection, no global state.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

# state rides as a tuple; timestamps as µs longs (Arrow-friendly)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("first_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def user_running_stats(events: DataFrame) -> DataFrame:
    """Cumulative per-user stats, one emission per (user, micro-batch).

    Works on an unbounded ``events``-shaped DataFrame (needs columns
    ``user_id, ts, value``).

    The update function is a closure so cloudpickle serializes it by
    value — a module-level function would pickle by reference to this
    package, which Python workers can't always import.
    """

    def update_user_stats(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total, first_us, last_us = (
            state.get if state.exists else (0, 0.0, None, None)
        )
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            total += float(pdf["value"].sum())
            ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
            lo, hi = int(ts_us.min()), int(ts_us.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        state.update((n, total, first_us, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "first_ts": [pd.Timestamp(first_us, unit="us")],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
