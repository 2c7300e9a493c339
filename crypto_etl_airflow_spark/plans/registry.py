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


def all_specs() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


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
