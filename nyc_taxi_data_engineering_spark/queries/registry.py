"""Query registry: every implemented operator exposes a named query
(spark, sf_dir) -> DataFrame plus, when SQL-expressible, a DuckDB
oracle SQL string with IDENTICAL column names/aliases.

This registry is the single source of truth for ``__spark_entry__.py``
(the driver's correctness harness), ``bench.py``, and the local test
suite — one place to add an operator, three consumers.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None (rows-only check)
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, bench: bool = False) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, bench=bench)
        return fn

    return deco


def registry() -> dict[str, QuerySpec]:
    # Import side-effect modules on first use so every @query registers.
    from nyc_taxi_data_engineering_spark.queries import _load_all

    _load_all()
    return dict(_REGISTRY)


def all_queries() -> dict[str, QueryFn]:
    return {k: v.fn for k, v in registry().items()}


def all_oracles() -> dict[str, str]:
    return {k: v.oracle for k, v in registry().items() if v.oracle is not None}


def bench_queries() -> dict[str, QueryFn]:
    return {k: v.fn for k, v in registry().items() if v.bench}
