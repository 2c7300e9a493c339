"""Distribution-drift detection: Population Stability Index.

The data-quality check that catches a pipeline silently changing its
input distribution (schema-valid but statistically different — fee
spikes, unit changes, upstream resampling). PSI over fixed bin edges:

    psi = Σ_bins (p_b − p_a) · ln(p_b / p_a)

with Laplace-smoothed proportions (count+1)/(total+k) so empty bins
stay finite. Conventional reading: < 0.1 stable, 0.1–0.25 drifting,
> 0.25 shifted.

Scale posture: one grouped count per side (map-side combined), a
6-row full-outer join, and window totals over the bin table — the
100 TB cost is two scans, nothing else. Fixed edges (not quantile-
derived) keep the check deterministic and engine-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def bin_label(value_col, edges: list[float]) -> F.Column:
    """Ordinal bin index for fixed edges: value < edges[0] → 0, …,
    value >= edges[-1] → len(edges)."""
    expr = F.lit(len(edges))
    for i, e in enumerate(reversed(edges)):
        expr = F.when(F.col(value_col) < F.lit(e), len(edges) - 1 - i).otherwise(
            expr
        )
    return expr.cast("int")


def distribution_psi(
    period_a: DataFrame,
    period_b: DataFrame,
    value_col: str,
    edges: list[float],
) -> DataFrame:
    """Per-bin PSI between two slices of the same column. Returns
    (bin, n_a, n_b, psi_term, psi_total) — psi_total repeated on each
    row so a single-row consumer can threshold it."""
    k = len(edges) + 1

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.groupBy(bin_label(value_col, edges).alias("bin"))
            .agg(F.count("*").alias(name))
        )

    joined = (
        counts(period_a, "n_a")
        .join(counts(period_b, "n_b"), "bin", "full_outer")
        .na.fill({"n_a": 0, "n_b": 0})
    )
    whole = W.partitionBy()
    ta = F.sum("n_a").over(whole)
    tb = F.sum("n_b").over(whole)
    pa = (F.col("n_a") + F.lit(1.0)) / (ta + F.lit(float(k)))
    pb = (F.col("n_b") + F.lit(1.0)) / (tb + F.lit(float(k)))
    term = (pb - pa) * F.log(pb / pa)
    with_term = joined.withColumn("__term", term)
    return with_term.select(
        "bin",
        "n_a",
        "n_b",
        F.round("__term", 6).alias("psi_term"),
        F.round(F.sum("__term").over(whole), 6).alias("psi_total"),
    )
