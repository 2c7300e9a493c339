"""Null-value robustness: real corpora carry null text, null
embeddings, and null measures. Operators must pass them through or
drop them deterministically — never throw. (Round-6 probe of every
text/dedup/similarity/multimodal query with injected nulls found one
crash — multimodal bytes(None) — fixed and pinned here with the
riskiest shapes per family.)"""

import pytest
from pyspark.sql import functions as F

from crypto_etl_airflow_spark.plans.registry import all_specs
from crypto_etl_airflow_spark.sources.tables import TABLES

RISKY = [
    "text_token_stats",
    "text_language_id",
    "dedup_exact_fingerprint",
    "dedup_minhash_lsh",
    "text_winnow_profile",
    "embedding_neardup_pairs",
    "similarity_topk_bruteforce",
    "embedding_quantize_error_by_label",
    "multimodal_features",
    # round-7 curation surface
    "text_pii_redact",
    "text_gopher_filter",
    "dedup_lines_global",
    "sample_token_budget",
    "sample_token_budget_distributed",
    "sequence_packing_manifest",
    "training_shards_manifest",
    "embedding_semdedup_pairs",
    "embedding_semdedup_keep",
    "vocab_bpe_merge_rules",
    "text_bpe_token_counts",
    "text_bigram_logprob",
    "filter_quality_quantile",
    "layout_zorder_values",
    "sample_mixture_weights",
    "text_novelty_score",
    "dedup_cross_source_matrix",
    # round-8 additions
    "dedup_lines_intradoc",
    "text_repetition_signals",
    "similarity_hybrid_rrf_topk",
    "dedup_substring_spans",
    "dedup_substring_removal",
    "text_blocklist_filter",
    "dedup_containment",
    "curation_pipeline_summary",
    # round-9 additions (null text must be skipped by every store's
    # signature stage; null event values by the MAD percentiles)
    "dedup_incremental_fingerprint",
    "dedup_incremental_simhash",
    "dedup_incremental_containment",
    "export_jsonl_roundtrip",
    "anomaly_mad_events",
    "dedup_incremental_semantic",  # null embeddings through frozen assign
    "quality_classifier_scores",   # null text -> NULL score, kept=false
    "similarity_bm25_indexed",     # null text -> dl=0 membership row
    "quality_classifier_trained",  # train + infer over null text
]


@pytest.fixture(scope="module")
def nulls_sf(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("nulls_sf")
    for t in TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        if t == "documents":
            extra = df.limit(3).select(
                (F.col("doc_id") + 900000).alias("doc_id"),
                F.lit(None).cast("string").alias("text"),
                *[c for c in df.columns if c not in ("doc_id", "text")],
            ).select(*df.columns)
            df = df.unionByName(extra)
        if t == "orders":
            # poison the z-order query's input too (null join key)
            extra = df.limit(3).select(
                (F.col("o_orderkey") + 900000).alias("o_orderkey"),
                F.lit(None).cast("long").alias("o_custkey"),
                *[c for c in df.columns if c not in ("o_orderkey", "o_custkey")],
            ).select(*df.columns)
            df = df.unionByName(extra)
        if t == "embeddings":
            extra = df.limit(3).select(
                (F.col("vec_id") + 900000).alias("vec_id"),
                F.lit(None).cast("array<float>").alias("embedding"),
                *[c for c in df.columns if c not in ("vec_id", "embedding")],
            ).select(*df.columns)
            df = df.unionByName(extra)
        if t == "events":
            # null measures must not break the MAD percentiles
            extra = df.limit(3).select(
                (F.col("event_id") + 900000).alias("event_id"),
                *[c for c in df.columns if c not in ("event_id", "value")],
                F.lit(None).cast("double").alias("value"),
            ).select(*df.columns)
            df = df.unionByName(extra)
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    return str(out)


@pytest.mark.parametrize("name", RISKY)
def test_query_survives_null_rows(spark, nulls_sf, name):
    from crypto_etl_airflow_spark.operators.dedup import release_reuse_caches

    spec = all_specs()[name]
    try:
        spec.builder(spark, nulls_sf).count()  # must not raise
    finally:
        release_reuse_caches()
