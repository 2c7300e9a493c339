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
# Round-7 rotation (VERDICT r6 item 2): (a) the 24 queries new or
# oracle-upgraded this round — no (or rows-only) driver row exists;
# then (b) the 14 queries the round-6 cap missed (still carrying a
# round-2 row); everything else — certified r5/r6 — sorts after in
# registration order and refreshes with whatever slots remain.
# 27 + 14 = 41 ≤ 50, so every new query certifies AND every stale
# row refreshes this round, with 9 slots left for r5/r6 refreshes.
_PRIORITY = [
    # (a) new or oracle-upgraded in round 7 — needs a fresh driver row
    "similarity_bm25_topk",
    "dedup_substring_spans",
    "dedup_substring_removal",
    "dedup_minhash_lsh_xxhash",  # r6 row was rows-only; now oracle-paired
    "multimodal_resize_images",
    "dedup_fuzzy_short_docs",
    "dedup_incremental_minhash",
    "text_pii_redact",
    "text_pii_prevalence",
    "dedup_lines_global",
    "text_gopher_filter",
    "sample_token_budget",
    "embedding_semdedup_pairs",
    "embedding_semdedup_keep",
    "streaming_dedup_exact",
    "streaming_dedup_incremental",
    "text_bigram_logprob",
    "filter_quality_quantile",
    "vocab_bpe_merge_rules",
    "text_bpe_token_counts",
    "training_shards_manifest",
    "sample_token_budget_distributed",
    "sequence_packing_manifest",
    "layout_zorder_values",
    "sample_mixture_weights",
    "text_novelty_score",
    "dedup_cross_source_matrix",
    # (b) last driver-certified in r2 — missed the round-6 cap
    "join_salted_skew",
    "q2_cheapest_supplier",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "q10_returned_customers",
    "q11_important_parts",
    "q12_priority_by_returnflag",
    "q14_promo_share",
    "q15_top_supplier",
    "q18_large_orders",
    "q19_disjunctive_revenue",
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
