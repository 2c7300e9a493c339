"""One-pass table profiling: per-column stats for pipeline triage.

Data profiling (null rates, cardinalities, ranges) is the first step
of every ingest/quality investigation. All columns' measures compile
into ONE ``df.agg(...)`` — a single scan regardless of column count
(same design as the quality gate) — then the wide result unpivots to
one row per column.

Numeric and string columns profile differently (numeric range/mean
vs lexicographic range); outputs live in typed columns so no value
is ever stringified across engines (cross-engine float formatting is
not stable, typed values are).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.IntegerType, T.LongType, T.DoubleType, T.FloatType, T.ShortType)


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Profile ``cols`` (default: all numeric+string columns).

    Output: one row per column —
    (column, n_rows, n_nulls, n_distinct, num_min, num_max, num_mean,
    str_min, str_max); the num_*/str_* family not applicable to the
    column's type is NULL.
    """
    if cols is None:
        cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (*_NUMERIC, T.StringType))
        ]

    measures = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        is_num = isinstance(df.schema[c].dataType, _NUMERIC)
        measures += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
        ]
        if is_num:
            measures += [
                F.round(F.min(c).cast("double"), 6).alias(f"{c}__nmin"),
                F.round(F.max(c).cast("double"), 6).alias(f"{c}__nmax"),
                F.round(F.avg(F.col(c).cast("double")), 6).alias(f"{c}__nmean"),
            ]
        else:
            measures += [
                F.min(c).alias(f"{c}__smin"),
                F.max(c).alias(f"{c}__smax"),
            ]

    wide = df.agg(*measures)

    rows = []
    for c in cols:
        is_num = isinstance(df.schema[c].dataType, _NUMERIC)
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                (F.col(f"{c}__nmin") if is_num else F.lit(None).cast("double")).alias(
                    "num_min"
                ),
                (F.col(f"{c}__nmax") if is_num else F.lit(None).cast("double")).alias(
                    "num_max"
                ),
                (F.col(f"{c}__nmean") if is_num else F.lit(None).cast("double")).alias(
                    "num_mean"
                ),
                (F.lit(None).cast("string") if is_num else F.col(f"{c}__smin")).alias(
                    "str_min"
                ),
                (F.lit(None).cast("string") if is_num else F.col(f"{c}__smax")).alias(
                    "str_max"
                ),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")
