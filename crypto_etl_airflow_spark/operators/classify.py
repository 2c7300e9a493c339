"""Model-based quality filtering (CCNet / DCLM-style): a linear
classifier over hashed bag-of-words features, as pure dataflow.

The heuristic quality gates (functions/text.py::quality_score, the
Gopher filter) are rule-based; production pretraining pipelines
additionally run a LEARNED filter — fastText-style: hash each token
into a bounded feature space, sum the buckets' learned weights, pass
the margin through a sigmoid, keep documents above a score cut
(CCNet, Wenzek et al. 2020; DCLM, Li et al. 2024). The Spark shape
of that inference is what this operator provides:

- tokenize → feature-hash (portable 32-bit md5 family,
  operators/dedup.py::portable_hash32, so the DuckDB oracle
  recomputes buckets bit-for-bit) → per-token weight → one grouped
  avg per document → sigmoid. All JVM expressions; the only shuffle
  is the per-document aggregation, map-side combined.
- weights come either from a ``weights`` table ``(bucket, weight)``
  — the production path: learned weights broadcast-joined onto the
  token stream (kilobytes for any realistic bucket count) — or, when
  omitted, from a deterministic hash-derived PLACEHOLDER formula
  (this repo trains no models; the formula makes the full path
  certifiable value-for-value while the dataflow stays the real
  inference shape).
- placeholder weights are dyadic rationals (k/1024): every partial
  sum is exact in binary floating point, so the grouped avg is
  association-order-independent and the engine comparison cannot
  flake at a rounding boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 4096


def feature_bucket(tok: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Feature-hash bucket: first 32 md5 bits (the cross-engine
    portable hash family) modulo the bucket count."""
    h = F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")
    return h % n_buckets


def placeholder_weight(bucket: Column) -> Column:
    """Deterministic stand-in for learned weights, in [-1, 1]:
    Knuth-multiplicative spread of the bucket id, quantized to
    k/1024 so floating-point sums are exact (see module docstring).
    A real deployment replaces this with a trained ``weights``
    table — the operator's dataflow is identical either way."""
    k = (bucket * F.lit(2654435761)) % F.lit(2049)
    return k / F.lit(1024.0) - F.lit(1.0)


def classifier_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    weights: DataFrame | None = None,
) -> DataFrame:
    """Per-document classifier scores: ``(id, score, kept,
    n_tokens)`` with score = sigmoid(mean token weight), kept =
    margin ≥ 0. Documents with no tokens (empty/null text) surface
    with NULL score, kept = false, n_tokens = 0 — a learned filter
    must not silently drop them.

    ``weights``: optional ``(bucket, weight)`` table of learned
    weights (missing buckets score 0.0 — the out-of-vocabulary
    convention); broadcast-joined, so inference adds no shuffle
    beyond the per-document agg. Omitted → the placeholder formula.
    """
    tok = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    bucketed = tok.select(
        id_col, feature_bucket(F.col("tok"), n_buckets).alias("bucket")
    )
    if weights is not None:
        scored = bucketed.join(F.broadcast(weights), "bucket", "left").select(
            id_col, F.coalesce("weight", F.lit(0.0)).alias("w")
        )
    else:
        scored = bucketed.select(
            id_col, placeholder_weight(F.col("bucket")).alias("w")
        )
    margins = scored.groupBy(id_col).agg(
        F.avg("w").alias("margin"), F.count("*").alias("n_tokens")
    )
    score = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin"))), 6
    )
    return (
        docs.select(id_col)
        .join(margins, id_col, "left")
        .select(
            id_col,
            score.alias("score"),
            F.coalesce(F.col("margin") >= 0, F.lit(False)).alias("kept"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        )
    )


def train_bucket_weights(
    docs: DataFrame,
    label: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """LEARN the weights table from the corpus — smoothed naive-Bayes
    log-odds per feature bucket (the closed-form linear-classifier
    fit fastText reduces to for unigram features):

        w(b) = ln((n_pos(b) + ½) / (N_pos + ½)) −
               ln((n_neg(b) + ½) / (N_neg + ½))

    with token-level counts under ``label`` (a boolean Column over
    the doc row, e.g. ``F.col("lang") == "en"`` — DCLM-style
    "positive = the curated slice"). One explode + one grouped count
    + a broadcast totals attach: training is a single aggregation
    pass over the corpus, and the result is exactly the
    ``(bucket, weight)`` table :func:`classifier_scores` broadcasts —
    fit and inference compose into one certified dataflow the way the
    BPE learner feeds ``apply_bpe_rules``."""
    tok = docs.select(
        label.alias("__pos"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    counts = tok.select(
        feature_bucket(F.col("tok"), n_buckets).alias("bucket"), "__pos"
    ).groupBy("bucket").agg(
        F.sum(F.when(F.col("__pos"), 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(F.col("__pos"), 0).otherwise(1)).alias("n_neg"),
    )
    totals = counts.agg(
        F.sum("n_pos").alias("tot_pos"), F.sum("n_neg").alias("tot_neg")
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("n_pos") + F.lit(0.5)) / (F.col("tot_pos") + F.lit(0.5)))
            - F.log((F.col("n_neg") + F.lit(0.5)) / (F.col("tot_neg") + F.lit(0.5)))
        ).alias("weight"),
    )
