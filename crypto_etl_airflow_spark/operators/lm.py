"""Unigram language-model perplexity filtering, as pure dataflow —
the CCNet-shape fluency signal (Wenzek et al. 2020 score documents
with a reference-corpus LM and keep the low-perplexity head; the
production model is KenLM 5-gram, the unigram reduction here keeps
the identical pipeline shape while staying exactly recomputable).

Distinct from the repo's other text-quality signals: the rule gates
(functions/text.py) score surface statistics, the classifier
(operators/classify.py) scores a learned decision boundary, DSIR
(operators/dsir.py) scores distribution similarity over hashed
buckets — perplexity scores per-token NEGATIVE LOG-LIKELIHOOD under
a reference model, the "does this read like the reference corpus"
number pretraining pipelines bucket documents by.

Spark shape:

- ``train_unigram_lm``: one explode + grouped count over the
  reference corpus, then top-``vocab_size`` types by (count DESC,
  token ASC) — the bounded-vocabulary cap that keeps the model table
  broadcastable at 100 TB (the rank sorts the TYPE table, which is
  orders of magnitude smaller than the corpus; everything outside
  the cap shares one OOV probability). Add-α smoothing:
  p(tok) = (c+α)/(T+α(V+1)), p_oov = (T−Σ_top c+α)/(T+α(V+1)) — the
  OOV symbol absorbs the tail mass the vocabulary cap cut off, so
  Σ_top p + p_oov = 1 exactly (a proper distribution; when the whole
  type table fits inside the cap, Σ_top c = T and p_oov degenerates
  to the familiar α/denom).
- ``unigram_logppl``: explode the scored docs, broadcast-join the
  model, per-document mean negative log-prob → perplexity. One
  map-side-combined aggregation; no model state, no Python.

Cross-engine exactness: ln-probabilities are dyadic-quantized
(k/1024, the operators/classify.py discipline), so per-document
grouped sums are association-order-exact; the final exp/round happen
once per document at the edge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _dyadic(x: Column) -> Column:
    return F.round(x * F.lit(1024)) / F.lit(1024)


def _toks(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")


def train_unigram_lm(
    ref_docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 4096,
    alpha: float = 0.5,
) -> tuple[DataFrame, DataFrame]:
    """Fit the smoothed unigram LM on the reference corpus. Returns
    ``(vocab, stats)``: ``vocab`` = (tok, lnp) for the top
    ``vocab_size`` types — kilobytes-to-megabytes, broadcast at
    scoring time; ``stats`` = one row (oov_lnp) shared by every
    out-of-vocabulary token — its probability carries the tail mass
    the cap cut off, (T−Σ_top c+α)/denom, so the model is a proper
    distribution (Σ p = 1 exactly; with the whole type table inside
    the cap this degenerates to the familiar α/denom). Deterministic:
    the vocabulary boundary tiebreaks (count DESC, token ASC)."""
    counts = (
        _toks(ref_docs.select(F.lit(0).alias("__id"), text_col), "__id", text_col)
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    ranked = counts.withColumn(
        "__rn",
        F.row_number().over(W.orderBy(F.desc("c"), F.asc("tok"))),
    )
    totals = ranked.agg(
        F.sum("c").alias("t"),
        F.least(F.count("*"), F.lit(vocab_size)).alias("v"),
        F.sum(
            F.when(F.col("__rn") <= vocab_size, F.col("c")).otherwise(F.lit(0))
        ).alias("tc"),
    )
    top = ranked.filter(F.col("__rn") <= vocab_size).drop("__rn")
    a = F.lit(alpha)
    denom = F.col("t") + a * (F.col("v") + F.lit(1))
    vocab = (
        top.crossJoin(F.broadcast(totals))
        .select("tok", _dyadic(F.log((F.col("c") + a) / denom)).alias("lnp"))
    )
    stats = totals.select(
        _dyadic(F.log((F.col("t") - F.col("tc") + a) / denom)).alias("oov_lnp")
    )
    return vocab, stats


def unigram_logppl(
    docs: DataFrame,
    vocab: DataFrame,
    stats: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document perplexity under the reference LM:
    ``(id, ppl, oov_ratio, n_tokens)`` with
    ppl = exp(−mean ln p(tok)), rounded to 6 decimals at the edge.
    Tokenless documents surface with NULL ppl/oov_ratio and
    n_tokens = 0. ``vocab`` broadcast-joins onto the token stream;
    the only shuffle is the per-document aggregation."""
    tok = _toks(docs, id_col, text_col)
    scored = (
        tok.join(F.broadcast(vocab), "tok", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            F.coalesce("lnp", F.col("oov_lnp")).alias("lnp"),
            F.col("lnp").isNull().cast("int").alias("oov"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.sum("lnp").alias("s"),
        F.sum("oov").alias("n_oov"),
        F.count("*").alias("n_tokens"),
    )
    return (
        docs.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.round(F.exp(-F.col("s") / F.col("n_tokens")), 6).alias("ppl"),
            F.round(F.col("n_oov") / F.col("n_tokens"), 6).alias("oov_ratio"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        )
    )
