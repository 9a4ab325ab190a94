"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator family from SURVEY.md §2
(relational core, events/time-series, terraform tables, LLM-pipeline
extensions), each a (spark, sf_dir) → DataFrame callable.
``oracle_sql()`` — the DuckDB-runnable ANSI SQL equivalent per query
(terraform queries use golden VALUES derived from the fixture corpus;
approx-distinct and the k-means IVF entries are rows-only by design —
HLL sketches and iterative clustering are engine-specific; simhash and
hyperplane-LSH oracles replay their full md5-deterministic pipelines).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from steampipe_plugin_terraform_spark.catalog import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


# ROTATION POLICY (standing, from round 6; see round-6 comment in git
# history for the full rationale). The driver's correctness gate checks
# the first 50 queries() entries in dict order; the catalog holds 200, so
# the horizon is ceil(200/50) = 4 rounds. Invariant: EVERY entry gets a
# driver-green row within the horizon; window priority each round:
#   1. entries changed or added this round (a stale green row proves
#      nothing about them);
#   2. entries that have NEVER had a driver row (the r6 wave);
#   3. entries whose last driver row is oldest.
# Entries past the window are value-checked locally every round by
# tests/test_oracle_parity.py (all oracled entries) at sf0.001, and by
# the sf0.01 sweep (`make parity-sf001 parity-sf01`).
#
# Round-10 window (executes the r9 verdict's arithmetically-forced
# rotation): positions 1-8 are the eight entries promoted from the r9
# staging area (tf_module_pinning_audit, tf_plan_state_drift,
# emb_ivf_incremental_topk, q_logsketch_merge, q_events_type_quantiles,
# stream_quantile_logsketch, tf_unused_variables,
# docs_benchmark_contamination) — never driver-checked, so rule 2 puts
# them first; positions 9-50 are ALL 42 remaining entries whose last
# driver row is r06 (the catalog is 200 after promotion, horizon
# ceil(200/50) = 4, so r06 rows fall outside it at r10 — the exact list
# tests/test_rotation.py::test_horizon_holds red-flagged the moment
# CORRECTNESS_r09 landed). After the window: the 50 r07-green rows (due
# r11 — front-load them there alongside the <=5 r11 promotions), then
# r08-green, then the r09 window (newest rows last).
_VALIDATE_FIRST = [
    # -- r10 window: the eight entries promoted from the r9 staging area
    # (never driver-checked; rotation rule 2 puts them first) --
    "tf_module_pinning_audit",
    "tf_plan_state_drift",
    "emb_ivf_incremental_topk",
    "q_logsketch_merge",
    "q_events_type_quantiles",
    "stream_quantile_logsketch",
    "tf_unused_variables",
    "docs_benchmark_contamination",
    # -- r10 window: ALL 42 remaining entries whose last driver row is
    # r06 (the 4-round horizon forces them this round: floor = r07 —
    # exactly the list test_horizon_holds red-flagged the moment
    # CORRECTNESS_r09 landed) --
    "docs_redact_pii",
    "dedup_minhash_lsh",
    "docs_curation_pipeline",
    "emb_ivf_topk",
    "emb_ivf_recall",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q_top3_orders_per_segment",
    "q_rollup_revenue",
    "q_cube_revenue",
    "q_distinct_nations_per_segment",
    "q_big_spenders_semi",
    "q_value_percentiles",
    "q_returns_exists",
    "q_promo_revenue_ratio",
    "q_small_quantity_revenue",
    "q_customers_without_orders",
    "q_custkeys_set_difference",
    "q_brand_revenue",
    "q_orders_running_total",
    "q_grouping_sets",
    "q_custkeys_intersect",
    "q7_volume_shipping",
    "q10_returned_items",
    "q_pivot_priority_by_segment",
    "docs_pack_sequences",
    "docs_repetition",
    "docs_span_dedup",
    "docs_unigram_logprob",
    "docs_source_mix",
    "emb_quantize_int8",
    "docs_winnow_fingerprint",
    "dedup_clusters",
    "emb_cosine_topk",
    "emb_lsh_topk",
    "emb_lang_centroids",
    "tf_resource_count_by_type",
    "tf_resources",
    "tf_outputs",
    "media_metadata",
    "media_frame_sample",
    # ---- 50-entry window boundary ----
    # -- last driver row r07 (oldest first; after r10 the catalog is 200
    # -> horizon ceil(200/50) = 4, so these come due in r11 — front-load
    # them there alongside the <=5 r11 promotions) --
    "docs_bm25_topk",
    "q_events_theil_sen",
    "q_approx_distinct",
    "emb_cluster_balanced_sample",
    "emb_curation_pipeline",
    "q_events_funnel",
    "q_events_retention_cohorts",
    "docs_epoch_shuffle",
    "docs_length_buckets",
    "dedup_tfidf_cosine_pairs",
    "emb_hard_negatives",
    "emb_pq_topk",
    "docs_quality_quantile_filter",
    "q_zorder_pruned_scan",
    "stream_hourly_append_closed",
    "q_salted_skew_join",
    "q_events_trailing_30min",
    "stream_foreachbatch_sink",
    "emb_ivf_pq_topk",
    "q_customer_supplier_pagerank",
    "q_events_hourly_gapfill",
    "q_unpivot_priority_counts",
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q_events_ohlc",
    "q_events_anomaly",
    "emb_rp_reduce",
    "docs_weighted_sample",
    "q_events_ewma",
    "q_orders_price_histogram",
    "docs_train_val_test_split",
    "q_events_countmin",
    "q_customer_pareto",
    "q_events_trend",
    "q_events_transitions",
    "stream_countmin_sketch",
    "q_kmv_distinct",
    "stream_hopping_counts",
    "q_quantile_bottomk_sketch",
    "q_customer_skyline",
    "q_orders_open_interval_sweep",
    "q_events_cusum",
    "q_events_time_weighted_value",
    "q_partition_pruned_join",
    "dedup_edit_distance_pairs",
    "q_kmv_set_ops",
    "q_events_mad_outliers",
    "q_user_scd2_segments",
    "q_events_sliding_distinct_users",
    "stream_click_error_left_join",
    # -- last driver row r08 --
    "q_events_top_paths",
    "q_weighted_median_price",
    "q_orders_equidepth_histogram",
    "q_basket_brand_lift",
    "docs_bigram_logprob",
    "dedup_linkage_clusters",
    "q_events_ab_significance",
    "dedup_lsh_recall",
    "emb_dim_stats",
    "q_events_cep_pattern",
    "q_dq_audit",
    "q_bloom_semi_join",
    "q_orders_interval_merge",
    "q_events_autocorr24",
    "q_user_entropy",
    "q_customer_gini",
    "q_customer_rfm",
    "q_nation_share_of_region",
    "q_events_lateness_profile",
    "media_ahash_pairs",
    "q_fulfillment_latency",
    "q_events_duplicate_payments",
    "q_customer_activity_reconciliation",
    "docs_chunk_overlap",
    "q_part_triangles",
    "stream_click_error_full_join",
    "q_session_incident_overlap",
    "q_orders_checksum",
    "q_part_kcore",
    "emb_nearest_centroid_label",
    "tf_resource_provider_join",
    "docs_k_anonymity",
    "stream_record_highs",
    "q_events_seasonal_anomaly",
    "docs_novelty",
    "q_join_size_cms_estimate",
    "dedup_golden_record",
    "docs_leakage_safe_split",
    "q_user_segment_asof_snapshot",
    "q_orders_cohort_ltv",
    "q_events_stickiness",
    "emb_intra_class_outliers",
    "docs_lang_confusion",
    "tf_untagged_resources",
    "q_events_moving_avg",
    "q_stats_by_returnflag",
    "q_ntile_acctbal_deciles",
    "q4_priority_late_ship",
    "q6_forecast_revenue",
    "q8_market_share",
    # -- last driver row r09 (newest rows; recheck last) --
    "emb_two_level_topk",
    "tf_config_state_drift",
    "q_user_scd2_merge",
    "q_quantile_logsketch",
    "q9_profit_by_nation",
    "q13_order_count_distribution",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q21_waiting_suppliers",
    "q22_idle_rich_customers",
    "q_incident_click_range_join",
    "q12_priority_lines",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q20_excess_quantity_suppliers",
    "q_events_hourly",
    "q_events_sessions",
    "q_events_json_props",
    "q_events_last_order_asof",
    "dedup_first_event",
    "docs_stratified_sample",
    "docs_temperature_sample",
    "docs_contamination_screen",
    "docs_fingerprint",
    "docs_token_stats",
    "docs_quality",
    "docs_lang_id",
    "dedup_jaccard_pairs",
    "dedup_simhash",
    "stream_events_hourly",
    "stream_segment_enriched",
    "stream_sessions_per_user",
    "stream_user_running_totals",
    "stream_deduped_events",
    "stream_click_error_join",
    "tf_modules",
    "tf_variables",
    "tf_locals",
    "tf_providers",
    "tf_data_sources",
    "media_resize",
    "media_byte_histogram",
    "docs_semantic_dedup",
    "emb_ivf_store_topk",
    "q_events_daily_rollup",
    "q_bucketed_cokey_join",
    "docs_zscore_by_lang",
    "emb_near_dup_pairs",
    "docs_bpe_tokens",
    "docs_top_bigrams",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so entries without a green driver row come first (the driver
    checks a bounded prefix); see ``_VALIDATE_FIRST``.
    """
    missing = [k for k in _VALIDATE_FIRST if k not in QUERIES]
    assert not missing, f"_VALIDATE_FIRST names unknown entries: {missing}"
    # a duplicate would dedupe in the ordered dict and silently pull a
    # later entry into the driver's 50-slot window, breaking the rotation
    assert len(set(_VALIDATE_FIRST)) == len(_VALIDATE_FIRST), "duplicate in _VALIDATE_FIRST"
    ordered = {k: QUERIES[k] for k in _VALIDATE_FIRST}
    ordered.update({k: v for k, v in QUERIES.items() if k not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omissions get the rows-only check."""
    return dict(ORACLES)
