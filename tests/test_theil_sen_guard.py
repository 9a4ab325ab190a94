"""Pair-explosion guard for q_events_theil_sen: past _THEIL_SEN_MAX_HOURS
hourly points per type, the estimator runs on the md5-rank-smallest S hours
(deterministic sampled Theil–Sen). The guard is a no-op at every tested SF
(≤720 hours/type vs S=2048); these tests force it to bind by shrinking the
module constant and check (a) the sampled result still matches a mirrored
small-S oracle bit-for-bit and (b) the pair count is bounded by S(S-1)/2.
"""

import pytest

from steampipe_plugin_terraform_spark import catalog

from .parity import compare, duckdb_con

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture
def small_s(monkeypatch):
    monkeypatch.setattr(catalog, "_THEIL_SEN_MAX_HOURS", 8)
    return 8


def test_default_threshold_is_noop_at_tested_sfs(spark):
    """At S=2048 the sample includes every hour (≤720/type at any tested
    SF), so the driver-checked path is the exact all-pairs estimator."""
    from pyspark.sql import functions as F

    hc = (
        catalog._t(spark, SF_DIR, "events")
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.count("*").alias("cnt"))
        .groupBy("event_type")
        .agg(F.count("*").alias("h"))
    )
    assert hc.agg(F.max("h")).first()[0] < catalog._THEIL_SEN_MAX_HOURS


def test_sampled_path_matches_mirrored_oracle(spark, small_s):
    con = duckdb_con(SF_DIR)
    df = catalog.QUERIES["q_events_theil_sen"](spark, SF_DIR)
    ok, msg = compare(df, con, catalog._theil_sen_sql(small_s))
    assert ok, msg


def test_sampled_path_bounds_pairs(spark, small_s):
    """n_pairs per type can never exceed S(S-1)/2 once the guard binds."""
    rows = catalog.QUERIES["q_events_theil_sen"](spark, SF_DIR).collect()
    assert rows, "estimator returned no types"
    cap = small_s * (small_s - 1) // 2
    for r in rows:
        assert r.n_pairs <= cap, f"{r.event_type}: {r.n_pairs} > {cap}"


def test_sampled_differs_from_exact_oracle(spark, small_s):
    """Sanity that the guard actually bound at S=8: the sampled pair count
    differs from the exact all-pairs count (181 hours → 16k pairs)."""
    con = duckdb_con(SF_DIR)
    exact = {
        r[0]: r[1]
        for r in con.execute(
            catalog._theil_sen_sql(10**9)
        ).fetchall()
    }
    sampled = {r.event_type: r.n_pairs for r in
               catalog.QUERIES["q_events_theil_sen"](spark, SF_DIR).collect()}
    assert any(sampled[t] != exact[t] for t in sampled)
