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
# dict order.  Round 3 registered 78 entries but the 28 extension entries
# past position 49 (dedup/similarity/streaming/media, catalog.py:1551+)
# never produced a driver row.  Front-load exactly those so CORRECTNESS_r04
# validates them; the relational entries that are three-rounds-green take
# the back seats (they remain in queries() and still smoke-run locally via
# tests/test_oracle_parity.py, which checks all entries regardless of order).
_VALIDATE_FIRST = [
    # never driver-checked in any round
    "docs_repetition",
    "docs_span_dedup",
    "docs_unigram_logprob",
    "docs_source_mix",
    "emb_lang_centroids",
    "emb_ivf_store_topk",
    "stream_deduped_events",
    "stream_click_error_join",
    "media_frame_sample",
    # oracle/output changed in r03, never re-checked by the driver
    "dedup_simhash",
    "emb_lsh_topk",
    "emb_ivf_topk",
    "emb_ivf_recall",
    "emb_quantize_int8",
    # extension entries last driver-checked in r02 (out of window r03)
    "docs_pack_sequences",
    "docs_winnow_fingerprint",
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "docs_curation_pipeline",
    "emb_cosine_topk",
    "stream_events_hourly",
    "stream_sessions_per_user",
    "stream_user_running_totals",
    "tf_resource_count_by_type",
    "tf_resources",
    "tf_outputs",
    "media_metadata",
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
