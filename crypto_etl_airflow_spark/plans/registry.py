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
# order this registry emits them and may cap how many it runs per
# round (50 in rounds 1-2), so queries that still need a driver-green
# CORRECTNESS row come first — (a) the 11 registered late in round 2
# that the round-2 cap never reached, then (b) queries whose
# implementation or oracle changed this round, then (c) queries new
# this round. Already-green, unchanged queries sort last (their rows
# stand from earlier rounds).
_PRIORITY = [
    # (a) the round-2 certification tail — never driver-checked
    "q13_customer_distribution",
    "q16_supplier_cnt_by_part",
    "q17_small_quantity_revenue",
    "q20_majority_suppliers",
    "q21_sole_late_supplier",
    "q22_dormant_rich_customers",
    "agg_approx_percentiles",
    "streaming_enrich_segment",
    "quality_psi_value_drift",
    "join_right_segment_orders",
    "embedding_neardup_pairs_lsh",
    # (b) predicate/implementation changed in round 3 — need fresh
    # certification (cosine threshold now compared unrounded in BOTH
    # engines; dedup reuse points now lineage-preserving persist)
    "embedding_neardup_pairs",
    "similarity_topk_bruteforce",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_decontaminate",
    "multimodal_features",
    # (c) new in round 3 — no driver row exists yet (appended by
    # _PRIORITY_R3 below as modules register them)
]

# Names appended here (by the round-3 plan modules) certify after the
# tail above but before the standing-green backlog.
_PRIORITY_R3: list[str] = [
    "multimodal_wav_features",
    "multimodal_ppm_features",
    "dedup_clusters_star",
]
_PRIORITY.extend(_PRIORITY_R3)


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
