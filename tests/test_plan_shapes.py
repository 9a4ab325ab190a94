"""Physical-plan shape assertions for the scale-critical operators.

These pin the plans SCALE.md claims: narrow ops must not shuffle, ratio/
dim joins must broadcast (never shuffle the fact side), and top-k must be
TakeOrdered rather than a global sort.
"""

import pytest

from steampipe_plugin_terraform_spark.catalog import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", ["docs_redact_pii", "emb_quantize_int8", "media_frame_sample", "media_metadata"])
def test_narrow_ops_have_no_exchange(spark, name):
    # pure per-row transforms: any KEY shuffle is a regression. The single
    # round-robin exchange from catalog._par_floor is permitted — the sf*
    # fixtures are single-row-group files, and the floor is what gives the
    # per-row work cluster parallelism there (gated off for real inputs).
    assert "Exchange hashpartitioning" not in _plan(QUERIES[name](spark, SF_DIR))


def test_narrow_ops_stay_narrow_on_parallel_input(spark):
    # operator-level guarantee: with an already-parallel source the per-row
    # operators add NO exchange of any kind
    from steampipe_plugin_terraform_spark.operators import similarity, text

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(8)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").repartition(8)
    for df in (text.fingerprint(docs), similarity.quantize_int8(emb)):
        plan = _plan(df)
        assert plan.count("Exchange") == 1  # only the explicit repartition above
        assert "Exchange hashpartitioning" not in plan


def test_top_ngrams_uses_take_ordered(spark):
    plan = _plan(QUERIES["docs_top_bigrams"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort stage


@pytest.mark.parametrize(
    "name", ["q_promo_revenue_ratio", "q_small_quantity_revenue", "q5_region_revenue"]
)
def test_dim_joins_are_broadcast(spark, name):
    plan = _plan(QUERIES[name](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pack_sequences_single_grouping_shuffle(spark):
    # exactly one hashpartitioning exchange (the grouped-map UDF's), keyed
    # on (group, shard); the shuffled projection carries the computed
    # weight, not the text column (text is projected away before the
    # exchange — its only appearance is inside the scan/project subtree)
    plan = _plan(QUERIES["docs_pack_sequences"](spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1
    head = plan.split("Exchange hashpartitioning", 1)[1].splitlines()[0]
    assert "lang" in head and "shard" in head and "text" not in head


def test_q1_filter_pushed_to_scan(spark):
    plan = _plan(QUERIES["q1_pricing_summary"](spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "PushedFilters: [*IsNotNull(l_shipdate)" in plan
