"""Model-based quality filter (operators/classify.py): learned-
weights broadcast path == placeholder-formula path when the table is
built from the formula; empty/null documents surface (NULL score,
kept=false); missing buckets score 0 (OOV convention)."""

from pyspark.sql import functions as F

from crypto_etl_airflow_spark.operators.classify import (
    N_BUCKETS,
    classifier_scores,
    feature_bucket,
    placeholder_weight,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "completely different content about thermal circulation"),
    (3, ""),
    (4, None),
    (5, "one"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_weights_table_path_equals_formula_path(spark):
    """The production path (broadcast (bucket, weight) table) must be
    row-identical to the certified formula path when the table holds
    the formula's own values for every bucket."""
    docs = _docs(spark)
    weights = spark.range(N_BUCKETS).select(
        F.col("id").alias("bucket"),
        placeholder_weight(F.col("id")).alias("weight"),
    )
    a = sorted(classifier_scores(docs).collect())
    b = sorted(classifier_scores(docs, weights=weights).collect())
    assert a == b


def test_empty_and_null_docs_surface_unkept(spark):
    out = {r.doc_id: r for r in classifier_scores(_docs(spark)).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    for d in (3, 4):
        assert out[d].score is None
        assert out[d].kept is False
        assert out[d].n_tokens == 0
    assert out[1].n_tokens == 9 and out[1].score is not None


def test_missing_buckets_score_zero(spark):
    """OOV convention: a weights table that covers NO bucket yields
    margin 0 for every tokenized doc -> score 0.5, kept=True."""
    docs = _docs(spark)
    weights = spark.createDataFrame([], "bucket long, weight double")
    out = {
        r.doc_id: r
        for r in classifier_scores(docs, weights=weights).collect()
    }
    assert out[1].score == 0.5 and out[1].kept is True
    assert out[3].score is None


def test_bucket_is_stable_and_bounded(spark):
    rows = (
        spark.createDataFrame([("hello",), ("world",)], "tok string")
        .select("tok", feature_bucket(F.col("tok")).alias("b"))
        .collect()
    )
    got = {r.tok: r.b for r in rows}
    assert all(0 <= b < N_BUCKETS for b in got.values())
    # portable: first 32 md5 bits mod 4096, reproducible anywhere
    import hashlib

    for t, b in got.items():
        expect = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % N_BUCKETS
        assert b == expect


def test_trained_weights_separate_the_positive_class(spark):
    """The learned log-odds weights must actually discriminate on a
    corpus with a real vocabulary split: positive docs draw from
    vocab A + shared filler, negative from vocab B + shared filler.
    (The sf fixtures' lang labels sit over a mostly-shared token
    pool by construction — language_confusion_matrix covers that
    weak-signal case — so the semantic pin uses its own corpus.)"""
    from crypto_etl_airflow_spark.operators.classify import (
        train_bucket_weights,
    )

    rows = []
    for i in range(40):
        pos = i % 2 == 0
        core = "alpha beta gamma delta" if pos else "uno dos tres cuatro"
        rows.append((i, f"{core} shared{i % 5} filler common word {core}", pos))
    docs = spark.createDataFrame(rows, "doc_id long, text string, pos boolean")
    weights = train_bucket_weights(docs, F.col("pos"))
    out = classifier_scores(docs, weights=weights).join(
        docs.select("doc_id", "pos"), "doc_id"
    )
    rates = {
        r.pos: r.rate
        for r in out.groupBy("pos")
        .agg(F.avg(F.col("kept").cast("double")).alias("rate"))
        .collect()
    }
    assert rates[True] > 0.9, rates
    assert rates[False] < 0.1, rates


def test_planted_eval_reaches_high_accuracy(spark):
    """The eval that can fail (VERDICT r10 item 5): on vocabulary-
    distinct planted labels the trained classifier must score far
    above the ~0.5 majority — at sf0.001 it should be essentially
    perfect. A regression in the fit or inference path (hashing,
    smoothing, margin sign) drops this hard."""
    from crypto_etl_airflow_spark.plans.curation import (
        quality_classifier_eval_planted,
    )

    r = quality_classifier_eval_planted(spark, "/root/testdata/sf0.001").first()
    assert r.n_eval > 0
    assert r.accuracy >= 0.9, r.asDict()
