"""Pins for operators/sketch — the integer-exact log-scale quantile
sketch: bucket invariants (hypothesis, engine-free reference), the
relative-error guarantee against exact quantiles on real data, and the
mergeability law the 100 TB story rests on."""

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from steampipe_plugin_terraform_spark.operators import sketch

SF = "/root/testdata/sf0.001"
M = 5


def _lb_ref(v: int, m: int = M) -> int:
    """Pure-Python reference: keep the top m+1 significant bits."""
    if v < (1 << m):
        return v
    s = v.bit_length() - 1 - m
    return (v >> s) << s


@given(st.integers(min_value=1, max_value=2**62), st.integers(min_value=1, max_value=8))
@settings(max_examples=300, deadline=None)
def test_bucket_invariants(v, m):
    lb = _lb_ref(v, m)
    # containment and the relative-error width that quantile answers inherit
    assert lb <= v
    width = 1 if v < (1 << m) else 1 << (v.bit_length() - 1 - m)
    assert v < lb + width
    assert (v - lb) / v < 2 ** -m or v < (1 << m)
    # small values are exact
    if v < (1 << m):
        assert lb == v


@given(st.lists(st.integers(min_value=1, max_value=2**61), min_size=1, max_size=40))
@settings(max_examples=100, deadline=None)
def test_sql_expr_matches_reference(vals):
    # the SAME expression text the Spark side and the oracle both embed,
    # executed here in DuckDB against the pure-Python reference
    rows = ", ".join(f"(CAST({v} AS BIGINT))" for v in vals)
    got = duckdb.connect().execute(
        f"SELECT {sketch.logbucket_expr('v', M)} FROM (VALUES {rows}) t(v)"
    ).fetchall()
    assert [r[0] for r in got] == [_lb_ref(v) for v in vals]


def test_spark_expr_matches_reference(spark):
    vals = [1, 31, 32, 33, 999, 12345, 2**40 + 12345, 2**61 - 1]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    from pyspark.sql import functions as F

    got = [r[0] for r in df.select(F.expr(sketch.logbucket_expr("v", M))).collect()]
    assert got == [_lb_ref(v) for v in vals]


def test_merge_law(spark):
    """Sketch(A ∪ B) == merge(Sketch(A), Sketch(B)) where merge is
    groupBy(lb).sum(cnt) — the associative/commutative law that makes
    per-partition build + single exchange correct at any parallelism."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        F.expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").alias("v"),
        "l_orderkey",
    )
    a = li.filter("l_orderkey % 2 = 0")
    b = li.filter("l_orderkey % 2 = 1")
    whole = {(r.lb, r.cnt) for r in sketch.logsketch(li, "v").collect()}
    merged = {
        (r.lb, r.cnt)
        for r in sketch.logsketch(a, "v")
        .unionByName(sketch.logsketch(b, "v"))
        .groupBy("lb")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .collect()
    }
    assert merged == whole


def test_quantile_relative_error_bound(spark):
    """est <= exact < est·(1 + 2^-m): the estimate is the lower bound of
    the bucket CONTAINING the exact rank-selected value (same ceil-rank
    selection on both paths), so the error bound is structural, not
    statistical — pinned here against the true sorted quantiles."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        F.expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").alias("v")
    )
    vals = sorted(r.v for r in li.collect())
    n = len(vals)
    sk = sketch.logsketch(li, "v", m=M)
    est = {
        r.q_pct: r.est
        for r in sketch.logsketch_quantiles(sk, [50, 90, 99]).collect()
    }
    for q in (50, 90, 99):
        exact = vals[-(-q * n // 100) - 1]  # ceil(q·n/100)-th smallest
        assert est[q] == _lb_ref(exact), f"p{q}: not the containing bucket"
        assert est[q] <= exact < est[q] * (1 + 2 ** -M)


def test_grouped_quantile_relative_error_bound(spark):
    """Per-group estimates inherit the same structural bound: for every
    event_type, est is the containing bucket of the exact ceil-rank
    value — so grouping changed the partitioning of the pass, never the
    math."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_type",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("v"),
    )
    by_type = defaultdict(list)
    for r in ev.collect():
        by_type[r.event_type].append(r.v)
    sk = sketch.logsketch_by(ev, "v", ["event_type"], m=M)
    est = {
        (r.event_type, r.q_pct): r.est
        for r in sketch.logsketch_quantiles_by(
            sk, ["event_type"], [50, 90, 99]
        ).collect()
    }
    assert len(by_type) >= 3
    for etype, vals in by_type.items():
        vals.sort()
        n = len(vals)
        for q in (50, 90, 99):
            exact = vals[-(-q * n // 100) - 1]
            e = est[(etype, q)]
            assert e == _lb_ref(exact), f"{etype} p{q}: not the containing bucket"
            assert e <= exact < e * (1 + 2 ** -M)
