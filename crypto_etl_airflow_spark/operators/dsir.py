"""DSIR-style data selection via importance resampling, as pure
dataflow (Xie et al., 2023, "Data Selection for Language Models via
Importance Resampling" — the hashed-n-gram variant).

The learned quality filter (operators/classify.py) scores documents
against a TRAINED decision boundary; DSIR instead selects raw
documents whose hashed-feature distribution looks like a TARGET
domain: estimate bucket distributions p̂_target and p̂_raw over the
same feature-hash space, weight every raw document by its importance
log-ratio Σ_tokens λ(bucket), λ(b) = ln(p̂_t(b)/p̂_r(b)), then sample
without replacement with probability ∝ exp(log-weight) — the
standard pretraining-data recipe for "more like Wikipedia/books,
less like random crawl" without training a model.

Spark shape — three bounded aggregation passes, no model state:

1. bucket counts for raw and target corpora (one explode + grouped
   count each; the λ table is ≤ n_buckets rows — kilobytes,
   broadcast);
2. per-document Σ λ — the same explode joined against the broadcast
   λ table, one map-side-combined grouped sum;
3. Gumbel-top-k resampling: sampling without replacement ∝ weight is
   exactly "add Gumbel(0,1) noise to the log-weight, take the global
   top-k" (Efraimidis–Spirakis / Gumbel-max), which Spark executes
   as a distributed TakeOrdered — no global sort, no RNG state: the
   noise is derived from the portable 48-bit document hash, so the
   sample is deterministic and engine-recomputable.

Cross-engine exactness: λ values and Gumbel noise are quantized to
dyadic rationals (k/1024 — the operators/classify.py discipline), so
every per-document sum is EXACT in binary floating point and
association-order-independent: the grouped sum cannot flake at a
rounding boundary no matter how partial aggregation orders the adds.
The ~0.001 quantization is selection-irrelevant (weights span units).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .classify import N_BUCKETS, feature_bucket
from .dedup import portable_hash48

# 2^48 + 1: maps the 48-bit hash to u ∈ (0, 1) exclusive — ln(u) and
# ln(-ln(u)) both finite for every hash value
_U_DENOM = 281474976710657.0


def _dyadic(x: Column) -> Column:
    """Quantize to k/1024 — exact-sum floats (module docstring)."""
    return F.round(x * F.lit(1024)) / F.lit(1024)


def _bucketed_tokens(
    docs: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """(id, bucket) per token — the shared explode + portable
    feature-hash stage (operators/classify.py::feature_bucket)."""
    return (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .select(id_col, feature_bucket(F.col("tok"), n_buckets).alias("bucket"))
    )


def dsir_log_weights(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document importance log-weights of ``docs`` (the raw
    corpus) toward ``target`` (the domain to look like):
    ``(id, log_weight, n_tokens)``.

    λ(b) = ln((c_t(b)+α)/(T_t+α·B)) − ln((c_r(b)+α)/(T_r+α·B)),
    dyadic-quantized; log_weight = Σ_tokens λ(bucket), rounded to 6
    decimals at the edge. Documents with no tokens surface with NULL
    log_weight and n_tokens = 0 (a selector must not silently drop
    them); buckets absent from the raw corpus cannot occur in its
    documents, so the λ join is total by construction."""
    raw_tok = _bucketed_tokens(docs, id_col, text_col, n_buckets)
    tgt_tok = _bucketed_tokens(target, id_col, text_col, n_buckets)

    rc = raw_tok.groupBy("bucket").agg(F.count("*").alias("c_r"))
    tc = tgt_tok.groupBy("bucket").agg(F.count("*").alias("c_t"))
    totals = rc.agg(F.sum("c_r").alias("t_r")).crossJoin(
        tc.agg(F.sum("c_t").alias("t_t"))
    )
    a, ab = F.lit(alpha), F.lit(alpha * n_buckets)
    lam = (
        rc.join(tc, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            _dyadic(
                F.log((F.coalesce("c_t", F.lit(0)) + a) / (F.col("t_t") + ab))
                - F.log((F.col("c_r") + a) / (F.col("t_r") + ab))
            ).alias("lam"),
        )
    )
    sums = (
        raw_tok.join(F.broadcast(lam), "bucket")
        .groupBy(id_col)
        .agg(F.sum("lam").alias("lw"), F.count("*").alias("n_tokens"))
    )
    return (
        docs.select(id_col)
        .join(sums, id_col, "left")
        .select(
            id_col,
            F.round("lw", 6).alias("log_weight"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        )
    )


def gumbel_key(log_weight: Column, id_col: Column) -> Column:
    """Deterministic Gumbel-max sampling key: log_weight + g where
    g = −ln(−ln(u)) and u ∈ (0,1) is the document's portable 48-bit
    hash — sampling without replacement ∝ exp(log_weight) when the
    top-k keys are taken. The noise is dyadic-quantized so the sum
    with the (already exact-summed) log-weight stays reproducible."""
    u = (portable_hash48(id_col.cast("string")) + F.lit(1)) / F.lit(_U_DENOM)
    return log_weight + _dyadic(-F.log(-F.log(u)))


def dsir_resample_topk(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "log_weight",
) -> DataFrame:
    """Gumbel-top-k selection over a log-weight table: the k sampled
    documents as ``(id, log_weight, sample_key, rank)``. Documents
    with NULL weight (no tokens) are unsampleable and excluded.

    Scale shape: the global top-k executes as TakeOrdered (per-
    partition heaps + a k-row driver merge) — never a global sort;
    the rank window runs over the k selected rows only."""
    keyed = weights.filter(F.col(weight_col).isNotNull()).select(
        id_col,
        weight_col,
        F.round(gumbel_key(F.col(weight_col), F.col(id_col)), 6).alias(
            "sample_key"
        ),
    )
    top = keyed.orderBy(F.desc("sample_key"), F.asc(id_col)).limit(k)
    w = W.orderBy(F.desc("sample_key"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w))
