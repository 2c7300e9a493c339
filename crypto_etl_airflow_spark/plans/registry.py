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
        extensions,
        parity,
        relational,
        streaming_plans,
        tpch_more,
    )


# Certification priority: the external driver verifies queries in the
# order this registry emits them and caps how many it runs per round
# (50 in every round so far), so ordering IS the rotation policy.
# Round-6 rotation (VERDICT r5 item 3): (a) queries new this round —
# no driver row exists at all; then (b) the 56 queries whose last
# driver-green row is r1/r2 (rounds 4-5 re-certified the identical
# 50-query set, so these went stale in the driver record even though
# the local sweep covers them). The 50-slot cap reaches (a) plus the
# first 47 of (b); the ~9 that miss rotate to the front next round.
# Queries certified in r4/r5 sort last — their rows are fresh.
_PRIORITY = [
    # (a) new in round 6 — no driver row exists yet
    "embedding_neardup_pairs_lsh_scaled",
    "embedding_neardup_pairs_lsh_scaled_planted",
    "dedup_minhash_lsh_xxhash",
    "text_winnow_profile",
    "text_winnow_shared_pairs",
    "embedding_quantize_error_by_label",
    "dedup_fuzzy_levenshtein",
    "dedup_clusters_fuzzy",
    # (b) last driver-certified in r1/r2 — stale rotation backlog
    "language_confusion_matrix",
    "crypto_prices_projection",
    "quality_metrics",
    "dedup_exact_rows",
    "json_quarantine_stats",
    "profile_orders_table",
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_revenue_by_nation",
    "join_left_order_counts",
    "join_semi_active_customers",
    "join_anti_customers_without_orders",
    "join_full_nation_presence",
    "join_cross_region_nation",
    "join_range_size_buckets",
    "agg_distinct_counts",
    "agg_rollup_orders",
    "agg_cube_lineitem",
    "agg_grouping_sets",
    "agg_having",
    "agg_stddev_percentiles",
    "agg_approx_distinct",
    "window_rank_parts",
    "window_ntile_customers",
    "window_running_total",
    "topk_orders",
    "setops_nations",
    "unpivot_part_measures",
    "scalar_string_pack",
    "scalar_date_pack",
    "scalar_math_pack",
    "scalar_conditional_pack",
    "scalar_array_pack",
    "scalar_map_pack",
    "asof_last_error_before_click",
    "asof_with_tolerance",
    "streaming_tumbling_counts",
    "streaming_sliding_avg",
    "session_windows_per_user",
    "streaming_stateful_user_stats",
    "streaming_ingest_idempotent",
    "interval_join_click_errors",
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
