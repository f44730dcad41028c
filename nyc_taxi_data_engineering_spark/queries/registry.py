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
# registration order. Round 6 ordering: the 8 rotation-tail names that missed
# every prior window (media_features has NEVER earned a driver row; the other
# 7 are stale since r1/r3), then this round's new queries, then the stalest
# previously-green names (r4 vintage) to re-confirm them; the 50 queries the
# driver just checked in r5 drop to the back. Queries pushed past the window
# keep full local coverage via tests/test_oracle_parity.py, which checks ALL
# of them.
ROTATION: list[str] = [
    # -- missed every prior window (media_features) / stale since r1-r3 (7) --
    "media_features",
    "orders_rollup_nation_year",
    "top_orders_per_customer",
    "orders_cube_priority_status",
    "ann_ivf_topk",
    "embedding_neardup_pairs",
    "embedding_centroids_by_lang",
    "events_tumbling_stats",
    # -- new in round 6 --
    "delta_partitioned_orders",
    "events_delta_ingest",
    "oph_minhash_pairs",
    "incremental_dedup_docs",
    "dsir_importance_docs",
    "temperature_mixture_by_source",
    "pq_ann_topk",
    "bpe_merge_candidates",
    "kmv_distinct_tokens",
    "cms_heavy_hitters",
    "histogram_quantiles_orders",
    "jsonl_roundtrip_documents",
    "orc_roundtrip_supplier",
    "containment_neardup_pairs",
    "bloom_semijoin_lineitem",
    "kmeans_embeddings",
    "delta_version_diff_nation",
    "pagerank_trade_graph",
    "lineitem_correlations",
    "split_drift_chi2",
    "supplier_copurchase_pairs",
    "event_transition_matrix",
    "delta_incremental_orders",
    "events_rate_anomaly",
    "orders_benford_audit",
    "daily_vendor_revenue_sql",
    "hll_distinct_tokens",
    "delta_zorder_orders",
    "domain_tags_docs",
    "delta_incremental_rollup_orders",
    "contrastive_negatives_docs",
    "pagerank_weighted_trade",
    # -- last driver-green in r4, stalest first --
    "exact_dedup_docs",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_neardup_pairs",
    "dedup_clusters_docs",
    "neardup_canonical_docs",
    "simhash_docs",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "text_quality_scores",
    "text_token_stats",
    "text_fingerprints",
    "text_langid_confusion",
    "token_length_histogram",
    "corpus_top_tokens",
    "gopher_quality_gates",
    "daily_vendor_revenue",
    "validate_split_metrics",
    "validate_split_quarantine",
    "enrich_lineitem_nations",
    "ri_gate_kept_by_supplier",
    "ri_gate_orphans",
    "fk_null_audit",
    "integrity_scorecard",
    "except_quarantine",
    "conditional_counts_orders",
    "latest_partition_orders",
    "record_hashes_nation",
    "scd2_current_customers",
    "scd2_history_customers",
    "scd2_rollback_current",
    "scd2_verify_ok",
    "mdm_candidate_pairs",
    "mdm_match_scores",
    "mdm_levenshtein_scores",
    "mdm_routing_counts",
    "mdm_golden_records",
    "mdm_scorecard",
    "lifecycle_tally_suppliers",
    "lifecycle_history_suppliers",
    "dq_rule_metrics",
    "governance_gate_decision",
    "freshness_gate_datasets",
    "sql_workflow_checks",
    "csv_roundtrip_nation",
    "delta_time_travel_nation",
    "trade_flows_by_nation",
    "frequent_customers",
    "orders_lineitem_reconciliation",
    "salted_enrich_order_priorities",
    # -- r5-green names follow in registration order --
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
