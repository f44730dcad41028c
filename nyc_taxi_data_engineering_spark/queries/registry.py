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

# Driver-sampling rotation. The correctness harness samples the FIRST ~50
# entries of ``queries()`` in dict order, so registration order decides which
# queries earn a driver CORRECTNESS row each round. This list pins the front
# of that window explicitly instead of leaving it to module-import order:
# names listed here come first (in list order), everything else follows in
# registration order. Round 5 ordering: the 36 queries never sampled in
# r1–r4, then the round's new queries, then the stalest previously-green
# ones (last sampled r1, then r3). Queries pushed past the window keep full
# local coverage via tests/test_oracle_parity.py, which checks ALL of them.
ROTATION: list[str] = [
    # -- never driver-sampled through r4 (36) --
    "semantic_dedup_prune",
    "events_dedup_counts",
    "events_value_by_segment",
    "click_purchase_attribution",
    "parts_returned_both_flags",
    "nation_order_percentiles",
    "customer_order_gaps",
    "asof_customer_versions",
    "events_in_surge_windows",
    "supplier_rolling_revenue_7d",
    "customer_reach_by_nation",
    "order_price_outliers",
    "orders_priority_status_pivot",
    "customer_spend_deciles",
    "orders_status_melt",
    "supplier_revenue_trend",
    "customer_balance_ranks",
    "split_assignment_orders",
    "stratified_sample_docs",
    "corpus_mixture_by_source",
    "split_contamination_docs",
    "weighted_sample_docs",
    "sequence_packing_bins",
    "bm25_search_topk",
    "corpus_curation_funnel",
    "token_budget_selection",
    "events_props_by_type",
    "events_sessions",
    "events_user_stats_salted",
    "events_funnel_signup_purchase",
    "supplier_daily_gapfill",
    "profile_orders",
    "cdc_apply_customers",
    "ngram_contamination_docs",
    "doc_repetition_metrics",
    "scrub_gate_docs",
    # -- new in round 5 --
    "media_decoded_stats",
    "media_thumbnails",
    "delta_merge_upsert_nation",
    "doc_chunks_rag",
    "unigram_lm_scores",
    "orders_grouping_sets_audit",
    "corpus_shuffle_shards",
    "delta_skipping_orders",
    "chunk_dedup_stats",
    "shingle_df_histogram",
    # -- last driver-green in r1 (8) --
    "events_sliding_stats",
    "events_user_sessions",
    "media_payload_stats",
    "media_frame_counts",
    "media_features",
    "orders_rollup_nation_year",
    "top_orders_per_customer",
    "orders_cube_priority_status",
    # -- displaced from the r4 window (last green r3) --
    "ann_ivf_topk",
    "embedding_neardup_pairs",
    "embedding_centroids_by_lang",
    "events_tumbling_stats",
]


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
    ordered = {n: _REGISTRY[n] for n in ROTATION if n in _REGISTRY}
    ordered.update((n, s) for n, s in _REGISTRY.items() if n not in ordered)
    return ordered


def all_queries() -> dict[str, QueryFn]:
    return {k: v.fn for k, v in registry().items()}


def all_oracles() -> dict[str, str]:
    return {k: v.oracle for k, v in registry().items() if v.oracle is not None}


def bench_queries() -> dict[str, QueryFn]:
    return {k: v.fn for k, v in registry().items() if v.bench}
