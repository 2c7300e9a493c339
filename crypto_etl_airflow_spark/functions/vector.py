"""Vector math over ``array<float|double>`` columns — pure Column
expressions (``zip_with`` + ``aggregate``), evaluated JVM-side with
sequential summation.

Sequential order matters: it is bit-identical to a sequential C loop
over the same doubles, which is what lets cosine scores hash-match
the DuckDB oracle exactly (SIMD/tree-reduced sums would differ in
the last ulps).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
