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


# The driver's correctness gate checks the first 50 queries() entries in
# dict order; entries past the window are still value-checked locally by
# tests/test_oracle_parity.py (all entries, order-independent).  Round-5
# rotation: changed-this-round entries first (streaming ts fix, new tf
# tables, emb_ivf_store_topk's new oracle), then the 28 entries that fell
# out of round 4's window (last driver-checked r03).
_VALIDATE_FIRST = [
    # changed in r05: chunked pair emission (dedup.py) + simhash oracle cap
    "dedup_jaccard_pairs",
    "dedup_simhash",
    # changed in r05: streaming reader ts-unit fix (3 were wrong in r04;
    # the other 2 re-check the fix's blast radius)
    "stream_events_hourly",
    "stream_sessions_per_user",
    "stream_click_error_join",
    "stream_deduped_events",
    "stream_user_running_totals",
    # new in r05: stream-static dimension enrichment
    "stream_segment_enriched",
    # new in r05: remaining five terraform tables, each golden-oracled
    "tf_modules",
    "tf_variables",
    "tf_locals",
    "tf_providers",
    "tf_data_sources",
    # oracle added in r05 (was rows-only through r04)
    "emb_ivf_store_topk",
    # new in r05: SemDeDup-shaped semantic dedup (full Lloyd+prune oracle)
    "docs_semantic_dedup",
    # new in r05: cluster-balanced downsampling (data-mixture shaping)
    "emb_cluster_balanced_sample",
    # new in r05: multimodal feature-extract + resize stages
    "media_byte_histogram",
    "media_resize",
    # new in r05: embedding curation composition (dedup -> balanced sample)
    "emb_curation_pipeline",
    # new in r05: remaining numbered TPC-H shapes (q12/q15/q16/q20,
    # adapted to this corpus's columns — no shipmode/partsupp)
    "q12_priority_lines",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q20_excess_quantity_suppliers",
    # new in r05: bucketed co-located fact join (write-time shuffle)
    "q_bucketed_cokey_join",
    # new in r05: pure range join (bucketized interval x point)
    "q_incident_click_range_join",
    # new in r05: hypertable-style rollup (daily derived from hourly)
    "q_events_daily_rollup",
    # new in r05: temperature (power) sampling for data mixing
    "docs_temperature_sample",
    # out of round 4's 50-entry window; last driver-checked r03 (the list
    # is 55 long, so the final names here fall just past the window — they
    # are unchanged, r03-green, and covered by tests/test_oracle_parity.py)
    "q_events_moving_avg",
    "q_stats_by_returnflag",
    "q_ntile_acctbal_deciles",
    "q4_priority_late_ship",
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_profit_by_nation",
    "q13_order_count_distribution",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q21_waiting_suppliers",
    "q22_idle_rich_customers",
    "q_events_hourly",
    "q_events_sessions",
    "q_events_json_props",
    "q_events_last_order_asof",
    "dedup_first_event",
    "docs_stratified_sample",
    "docs_contamination_screen",
    "docs_fingerprint",
    "docs_token_stats",
    "docs_quality",
    "docs_lang_id",
    "docs_zscore_by_lang",
    "emb_near_dup_pairs",
    "docs_bpe_tokens",
    "docs_top_bigrams",
    "docs_redact_pii",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so entries without a green driver row come first (the driver
    checks a bounded prefix); see ``_VALIDATE_FIRST``.
    """
    missing = [k for k in _VALIDATE_FIRST if k not in QUERIES]
    assert not missing, f"_VALIDATE_FIRST names unknown entries: {missing}"
    ordered = {k: QUERIES[k] for k in _VALIDATE_FIRST}
    ordered.update({k: v for k, v in QUERIES.items() if k not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omissions get the rows-only check."""
    return dict(ORACLES)
