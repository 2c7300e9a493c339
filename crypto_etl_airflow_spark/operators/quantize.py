"""Int8 scalar quantization for embedding columns.

At 100 TB the embedding table's dominant costs are storage and
shuffle width: a 64-dim float32 vector is 256 bytes; its int8 codes
are 64 bytes + two doubles of per-vector range metadata — a ~4×
reduction that applies to every scan, shuffle and broadcast the ANN
operators perform (the LSH/IVF candidate stages carry vectors through
joins by design). Scalar (per-vector min/max range) quantization is
the standard first rung of that ladder (product quantization is the
next; out of scope).

Everything is a pure Column expression with EXACT cross-engine
arithmetic: codes are ``clamp(floor((x − min)/scale + 0.5), 0, 255)``
— ``floor`` instead of a round() builtin because engines disagree on
half-even vs half-up rounding, while floor(+0.5) is identical IEEE
double arithmetic everywhere — which is what lets a DuckDB oracle
recompute codes and reconstruction errors value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LEVELS = 255  # int8 code range 0..255


def _range_scale(mn: Column, mx: Column) -> Column:
    """Quantization step; 1.0 for constant vectors (all codes 0)."""
    return F.when(mx > mn, (mx - mn) / F.lit(float(LEVELS))).otherwise(F.lit(1.0))


def quantize_embeddings_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector int8 codes + range metadata: every input column is
    kept except ``vec_col``, which is replaced by ``q_codes``
    (array<tinyint> — TRUE single-byte codes, level − 128 so the full
    0..255 range fits the signed byte), ``q_min`` and ``q_scale``.
    Reconstruction is ``q_min + (code + 128)·q_scale``
    (:func:`dequantize`)."""
    e = F.col(vec_col).cast("array<double>")
    mn, mx = F.array_min(e), F.array_max(e)
    scale = _range_scale(mn, mx)
    codes = F.transform(
        e,
        lambda x: (
            F.least(
                F.lit(LEVELS),
                F.greatest(F.lit(0), F.floor((x - mn) / scale + F.lit(0.5))),
            )
            - F.lit(128)
        ).cast("tinyint"),
    )
    keep = [c for c in df.columns if c != vec_col]
    return df.select(
        *keep,
        codes.alias("q_codes"),
        mn.alias("q_min"),
        scale.alias("q_scale"),
    )


def dequantize(
    codes: Column | str, q_min: Column | str, q_scale: Column | str
) -> Column:
    """array<double> reconstruction of signed-byte codes."""
    mn = F.col(q_min) if isinstance(q_min, str) else q_min
    sc = F.col(q_scale) if isinstance(q_scale, str) else q_scale
    return F.transform(
        codes, lambda c: mn + (c.cast("double") + F.lit(128.0)) * sc
    )


def quantization_error_by_label(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Reconstruction-error profile per label: ``(label,
    n_components, avg_abs_err, max_abs_err, avg_scale)``. Errors are
    computed per COMPONENT (explode) and averaged with a 6-decimal
    round so cross-engine summation order cannot leak into the
    comparison — the certification surface for the whole
    quantize→dequantize round trip."""
    e = F.col(vec_col).cast("array<double>")
    mn, mx = F.array_min(e), F.array_max(e)
    scale = _range_scale(mn, mx)
    comp = df.select(
        F.col(label_col).alias("label"),
        mn.alias("mn"),
        scale.alias("scale"),
        F.explode(e).alias("x"),
    )
    code = F.least(
        F.lit(LEVELS),
        F.greatest(F.lit(0), F.floor((F.col("x") - F.col("mn")) / F.col("scale") + F.lit(0.5))),
    )
    err = F.abs(F.col("x") - (F.col("mn") + code * F.col("scale")))
    return (
        comp.select("label", "scale", err.alias("err"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_components"),
            F.round(F.avg("err"), 6).alias("avg_abs_err"),
            F.round(F.max("err"), 6).alias("max_abs_err"),
            F.round(F.avg("scale"), 6).alias("avg_scale"),
        )
    )
