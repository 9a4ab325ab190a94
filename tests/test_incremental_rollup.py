"""Maintenance-identity hardening for the r11-staged analytics entries
(the same several-horizons discipline tests/test_scd2_merge.py applies
to the SCD2 CDC merge):

- `q_orders_incremental_rollup`: merge-of-partial-state ≡ from-scratch
  rollup at MULTIPLE batch splits, not just the entry's ``% 7`` slice —
  including the empty-batch and everything-is-batch edges.
- `emb_matryoshka_prefix_recall`: prefix of ALL dimensions reproduces
  the exact ranking (recall 10000 for every query) — the full-probe ≡
  exact identity the IVF and two-level entries also pin.
"""

import pytest
from pyspark.sql import functions as F

from steampipe_plugin_terraform_spark.catalog import (
    _incremental_rollup_frame,
    _mrl_prefix_recall_frame,
    _t,
)

SF = "/root/testdata/sf0.001"


def _direct_rollup(orders):
    return orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month")
    ).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
        ).cast("long").alias("revenue_cents"),
        F.countDistinct("o_custkey").cast("long").alias("n_customers"),
    )


@pytest.mark.parametrize(
    "pred",
    [
        lambda: F.col("o_orderkey") % 2 == 0,
        lambda: F.col("o_orderkey") % 13 == 0,
        # split correlated with the distinct key
        lambda: F.col("o_custkey") % 3 == 0,
        lambda: F.lit(False),  # empty batch
        lambda: F.lit(True),  # everything is the batch
    ],
    ids=["mod2", "mod13", "custkey-correlated", "empty-batch", "all-batch"],
)
def test_incremental_rollup_identity_at_any_split(spark, pred):
    orders = _t(spark, SF, "orders")
    merged = {
        r["order_month"]: (r["n_orders"], r["revenue_cents"], r["n_customers"])
        for r in _incremental_rollup_frame(orders, pred()).collect()
    }
    direct = {
        r["order_month"]: (r["n_orders"], r["revenue_cents"], r["n_customers"])
        for r in _direct_rollup(orders).collect()
    }
    assert merged == direct


def test_mrl_full_prefix_is_exact(spark):
    emb = _t(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    c = emb.filter(F.col("vec_id") >= 10)
    rows = _mrl_prefix_recall_frame(q, c, prefix_dims=64).collect()
    assert len(rows) == 10
    assert all(r["n_overlap"] == 10 and r["recall_x1e4"] == 10000 for r in rows)
