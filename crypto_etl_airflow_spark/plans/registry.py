"""Declared query surface: one named entry per engine operator.

Every operator the engine claims (SURVEY.md §2) registers here as a
``QuerySpec``: a Spark builder ``(spark, sf_dir) -> DataFrame`` plus,
where the semantics are ANSI-SQL-expressible, an equivalent DuckDB
oracle SQL string. The driver harness compares the two at sf=0.01
(row count + schema + order-insensitive value hash), so:

- every computed column is aliased to the SAME name in both forms;
- double aggregates are rounded in both forms (identical IEEE inputs
  can still sum in different orders across engines);
- ordered-with-LIMIT queries always order by a total key so top-k is
  deterministic in both engines.

Builders take ``sf_dir`` and read parquet directly — no shared session
state, so any subset of queries can run in any order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None = None  # DuckDB SQL; None -> rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[Builder], Builder]:
    """Decorator: register a builder under ``name``."""

    def wrap(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""),
            tags=tags, bench=bench,
        )
        return fn

    return wrap


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from . import (  # noqa: F401
        analytics,
        curation,
        extensions,
        parity,
        relational,
        retrieval,
        streaming_plans,
        tpch_more,
    )


# Certification priority: the external driver verifies queries in the
# order this registry emits them and caps how many it runs per round
# (50 in every round so far), so ordering IS the rotation policy.
# Round-8 rotation (VERDICT r7 items 1 and 3): (a) the two substring
# queries that crashed in r7 (never certified) plus the queries new
# in r8; then (b) every query whose latest green driver row is r5 —
# computed from CORRECTNESS_r0{1..7}.json, 40 after deregistering the
# planes=4 demonstrator. 4 + 40 = 44 ≤ 50, so every broken/new query
# certifies AND every stale row refreshes, with ~6 slots left for r6
# refreshes (registration order).
_PRIORITY = [
    # (a) broken-in-r7 (TypeError, never certified) or new in r8
    "dedup_substring_spans",
    "dedup_substring_removal",
    "quality_curation_metrics",
    "text_bpe_token_counts_scaled",
    "similarity_hybrid_rrf_topk",
    "dedup_lines_intradoc",
    "text_repetition_signals",
    "text_blocklist_filter",
    # (b) latest green driver row is r5 — two full rounds stale
    "agg_approx_percentiles",
    "anomaly_zscore_events",
    "customer_rfm_segments",
    "dedup_clusters",
    "dedup_clusters_star",
    "dedup_decontaminate",
    "dedup_exact_fingerprint",
    "dedup_keep_best",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "embedding_centroids_by_label",
    "embedding_neardup_pairs",
    "join_right_segment_orders",
    "multimodal_audio_windows",
    "multimodal_binary_stats",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_ppm_features",
    "multimodal_wav_features",
    "q13_customer_distribution",
    "q16_supplier_cnt_by_part",
    "q17_small_quantity_revenue",
    "q20_majority_suppliers",
    "q21_sole_late_supplier",
    "q22_dormant_rich_customers",
    "quality_psi_value_drift",
    "sample_stratified_by_lang",
    "similarity_topk_bruteforce",
    "similarity_topk_ivf",
    "similarity_topk_lsh",
    "split_train_val_test",
    "streaming_enrich_segment",
    "text_chunk_windows",
    "text_language_id",
    "text_quality_score",
    "text_repetition_stats",
    "text_tfidf_top_terms",
    "text_token_stats",
    "vocab_top_terms",
]


def all_specs() -> dict[str, QuerySpec]:
    _load_all()
    rank = {name: i for i, name in enumerate(_PRIORITY)}
    ordered = sorted(_REGISTRY, key=lambda n: rank.get(n, len(rank)))
    return {name: _REGISTRY[name] for name in ordered}


def get(name: str) -> QuerySpec:
    _load_all()
    return _REGISTRY[name]


def query_map() -> dict[str, Builder]:
    return {name: spec.builder for name, spec in all_specs().items()}


def oracle_map() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
