"""Composed curation pipeline (plans/pipeline_curate.py): the oracle
certifies VALUES; these tests pin that the composition has TEETH —
each stage demonstrably drops documents on the planted corpus — and
that the funnel is internally consistent with the manifest."""

from pyspark.sql import functions as F

from crypto_etl_airflow_spark.plans.pipeline_curate import (
    pipeline_curate_corpus,
    pipeline_curate_funnel,
)

SF = "/root/testdata/sf0.001"


def test_every_stage_fires_and_funnel_matches_manifest(spark):
    funnel = {
        r.stage: (r.n_docs, r.n_tokens)
        for r in pipeline_curate_funnel(spark, SF).collect()
    }
    order = [
        "0_input",
        "1_gate_gopher",
        "2_gate_classifier",
        "3_gate_perplexity",
        "4_dedup_exact",
        "5_dedup_minhash",
        "6_dedup_semantic",
        "7_sampled",
    ]
    docs = [funnel[s][0] for s in order]
    assert docs[0] == 600  # 500 fixture docs + 50 clones + 50 near-dups
    # every stage except the classifier strictly drops documents on
    # the planted corpus (Gopher kills zh + short docs; perplexity
    # cuts the top 20%; exact kills the byte-identical clones;
    # minhash the one-token-tail near-dups; semantic the embedding
    # near-dups; admission enforces the per-language budgets)
    for i, (a, b) in enumerate(zip(docs, docs[1:])):
        if order[i + 1] == "2_gate_classifier":
            # KNOWN near-no-op here: the registered path runs the
            # deterministic placeholder weights, whose population
            # mean is ~0+ε, so per-doc averages of 20+ tokens
            # concentrate just above the margin-0 cut on this
            # fixture. The gate's TEETH are certified separately by
            # quality_classifier_eval_planted (accuracy 1.0 with
            # trained weights on vocabulary-distinct labels).
            assert b <= a
        else:
            assert b < a, (order[i + 1], a, b)
    assert docs[-1] > 0
    # manifest totals == the funnel's final stage
    man = pipeline_curate_corpus(spark, SF)
    tot = man.agg(
        F.sum("n_docs").alias("d"), F.sum("n_tokens").alias("t")
    ).first()
    assert (int(tot.d), int(tot.t)) == funnel["7_sampled"]
    # packing bookkeeping: bins never run backwards across shards
    rows = sorted(
        (r.shard_id, r.first_bin, r.last_bin) for r in man.collect()
    )
    for (s1, f1, l1), (s2, f2, l2) in zip(rows, rows[1:]):
        assert l1 <= f2 + 1 and f2 >= f1  # contiguous global stream
