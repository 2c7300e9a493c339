"""Unigram-LM perplexity (operators/lm.py): the reference slice
scores fluent (low ppl, low OOV), the vocabulary cap binds
deterministically, tokenless docs surface as NULL."""

import pytest
from pyspark.sql import functions as F

from crypto_etl_airflow_spark.operators.lm import (
    train_unigram_lm,
    unigram_logppl,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def model(spark, docs):
    return train_unigram_lm(docs.filter(F.col("lang") == "en"))


def test_ppl_orders_by_model_likelihood(spark, docs, model):
    """The filter's whole point: a document of the model's most
    frequent tokens scores lower perplexity than one of its rarest
    tokens, which scores lower than pure out-of-vocabulary babble.
    (Planted docs, because the fixture shares ONE small vocabulary
    across languages — cross-language unigram ppl carries no signal
    there.)"""
    vocab, stats = model
    ordered = [r.tok for r in vocab.orderBy(F.desc("lnp"), "tok").collect()]
    common, rare = ordered[:3], ordered[-3:]
    planted = spark.createDataFrame(
        [
            (1, " ".join(common * 3)),
            (2, " ".join(rare * 3)),
            (3, "zzqx9 zzqx8 zzqx7 zzqx6 zzqx5 zzqx4 zzqx3 zzqx2 zzqx1"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.ppl
        for r in unigram_logppl(planted, vocab, stats).collect()
    }
    assert out[1] < out[2] < out[3], out


def test_vocab_cap_binds_deterministically(spark, docs):
    # the en slice holds ~31 types, so a cap of 10 genuinely binds
    vocab, _ = train_unigram_lm(
        docs.filter(F.col("lang") == "en"), vocab_size=10
    )
    rows1 = sorted((r.tok, r.lnp) for r in vocab.collect())
    assert len(rows1) == 10
    vocab2, _ = train_unigram_lm(
        docs.filter(F.col("lang") == "en"), vocab_size=10
    )
    assert rows1 == sorted((r.tok, r.lnp) for r in vocab2.collect())


def test_tokenless_doc_null(spark, docs, model):
    vocab, stats = model
    padded = docs.select("doc_id", "text").unionByName(
        spark.createDataFrame(
            [(999999, "  "), (999998, None)], "doc_id long, text string"
        )
    )
    out = {
        r.doc_id: (r.ppl, r.oov_ratio, r.n_tokens)
        for r in unigram_logppl(padded, vocab, stats)
        .filter(F.col("doc_id") >= 999998)
        .collect()
    }
    assert out == {999999: (None, None, 0), 999998: (None, None, 0)}


def test_oov_only_doc_gets_oov_ppl(spark, docs, model):
    """A document of pure out-of-vocabulary tokens scores
    ppl == exp(−oov_lnp) and oov_ratio 1.0."""
    import math

    vocab, stats = model
    oov_lnp = stats.first().oov_lnp
    one = spark.createDataFrame(
        [(1, "zzqx9 zzqx8 zzqx7")], "doc_id long, text string"
    )
    r = unigram_logppl(one, vocab, stats).first()
    assert r.oov_ratio == 1.0 and r.n_tokens == 3
    assert abs(r.ppl - round(math.exp(-oov_lnp), 6)) < 1e-9


def test_capped_vocab_is_proper_distribution(spark, docs):
    """With a BINDING cap (10 of ~31 en types) the OOV symbol must
    absorb the tail mass: Σ_top p + p_oov = 1 (up to the dyadic
    ln-quantization), i.e. p_oov = (T−Σ_top c+α)/denom, NOT α/denom —
    the improper-distribution defect flagged in round 11."""
    import math

    vocab, stats = train_unigram_lm(
        docs.filter(F.col("lang") == "en"), vocab_size=10
    )
    mass = sum(math.exp(r.lnp) for r in vocab.collect())
    p_oov = math.exp(stats.first().oov_lnp)
    assert abs(mass + p_oov - 1.0) < 2e-3, (mass, p_oov)
    # and the tail genuinely exists, so p_oov is far above alpha/denom
    assert p_oov > 0.01, p_oov


def test_plan_no_python_eval_broadcast_model(spark, docs, model):
    vocab, stats = model
    plan = unigram_logppl(docs, vocab, stats)._jdf.queryExecution().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan
    assert "broadcast" in plan.lower()
