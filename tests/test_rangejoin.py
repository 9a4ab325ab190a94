"""Range join operator: correctness vs a naive predicate join on
constructed cases (boundary inclusivity, multi-bucket spans, empty
intervals) and the no-cartesian plan property."""

from datetime import datetime

from pyspark.sql import functions as F

from steampipe_plugin_terraform_spark.operators.rangejoin import (
    range_join_point_in_interval,
)


def _ts(s):
    return datetime.fromisoformat(s)


def test_range_join_matches_naive_and_boundaries(spark):
    intervals = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 00:10:00")),
            # spans 3 day-buckets at bucket_seconds=3600 (long interval)
            (2, _ts("2024-01-01 01:30:00"), _ts("2024-01-01 04:30:00")),
            # empty interval matches nothing
            (3, _ts("2024-01-02 00:00:00"), _ts("2024-01-02 00:00:00")),
        ],
        "iid long, s timestamp, e timestamp",
    )
    points = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 00:00:00")),  # == start: IN (half-open)
            (11, _ts("2024-01-01 00:10:00")),  # == end: OUT
            (12, _ts("2024-01-01 03:59:59")),
            (13, _ts("2024-01-02 00:00:00")),
            (14, _ts("2024-01-01 02:00:00")),
        ],
        "pid long, ts timestamp",
    )
    got = {
        (r.iid, r.pid)
        for r in range_join_point_in_interval(
            intervals, points, "s", "e", "ts", bucket_seconds=3600
        ).collect()
    }
    naive = {
        (r.iid, r.pid)
        for r in intervals.join(
            points, (F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e"))
        ).collect()
    }
    assert got == naive == {(1, 10), (2, 12), (2, 14)}


def test_range_join_plans_hash_join_not_cartesian(spark):
    intervals = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:00:00"))],
        "iid long, s timestamp, e timestamp",
    )
    points = spark.createDataFrame([(1, _ts("2024-01-01 00:30:00"))], "pid long, ts timestamp")
    plan = (
        range_join_point_in_interval(intervals, points, "s", "e", "ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_property_random_cases(spark):
    """Property check vs the naive predicate join on a pseudo-random corpus
    (deterministic seed): all interval lengths vs several bucket widths,
    including intervals shorter and much longer than the bucket."""
    import random

    rng = random.Random(42)
    base = 1_700_000_000  # epoch seconds
    intervals = [
        (i, base + rng.randrange(0, 50_000), rng.randrange(0, 7_000))
        for i in range(60)
    ]
    rows_i = [
        (i, datetime.fromtimestamp(s, tz=None), datetime.fromtimestamp(s + d, tz=None))
        for i, s, d in intervals
    ]
    rows_p = [
        (j, datetime.fromtimestamp(base + rng.randrange(0, 60_000), tz=None))
        for j in range(300)
    ]
    idf = spark.createDataFrame(rows_i, "iid long, s timestamp, e timestamp")
    pdf = spark.createDataFrame(rows_p, "pid long, ts timestamp")
    naive = {
        (r.iid, r.pid)
        for r in idf.join(
            pdf, (F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e"))
        ).collect()
    }
    for bucket in (60, 3600, 86_400):
        got = {
            (r.iid, r.pid)
            for r in range_join_point_in_interval(
                idf, pdf, "s", "e", "ts", bucket_seconds=bucket
            ).collect()
        }
        assert got == naive, f"bucket={bucket}"


def test_interval_overlap_matches_naive_across_buckets(spark):
    """Overlap join ≡ naive predicate join (half-open semantics) for
    several bucket widths — incl. pairs sharing MANY buckets (the
    free-filter dedup must keep exactly one copy), touching intervals
    (end == start → NO overlap), and containment."""
    import random

    from steampipe_plugin_terraform_spark.operators.rangejoin import (
        range_join_interval_overlap,
    )

    rng = random.Random(7)
    base = _ts("2024-01-01 00:00:00").timestamp()
    lrows = []
    for i in range(40):
        s = base + rng.randrange(0, 72 * 3600)
        lrows.append((i, datetime.fromtimestamp(s), datetime.fromtimestamp(s + rng.randrange(0, 8 * 3600))))
    rrows = []
    for j in range(40):
        s = base + rng.randrange(0, 72 * 3600)
        rrows.append((j, datetime.fromtimestamp(s), datetime.fromtimestamp(s + rng.randrange(1, 3 * 3600))))
    # hand-built edge cases: touching (no overlap), containment, identical
    lrows += [
        (100, _ts("2024-01-05 00:00:00"), _ts("2024-01-05 01:00:00")),
        (101, _ts("2024-01-06 00:00:00"), _ts("2024-01-06 10:00:00")),
    ]
    rrows += [
        (100, _ts("2024-01-05 01:00:00"), _ts("2024-01-05 02:00:00")),  # touches 100
        (101, _ts("2024-01-06 02:00:00"), _ts("2024-01-06 03:00:00")),  # inside 101
    ]
    ldf = spark.createDataFrame(lrows, "lid long, ls timestamp, le timestamp")
    rdf = spark.createDataFrame(rrows, "rid long, rs timestamp, re timestamp")
    naive = {
        (r.lid, r.rid)
        for r in ldf.join(
            rdf, (F.col("ls") < F.col("re")) & (F.col("rs") < F.col("le"))
        ).collect()
    }
    assert (100, 100) not in naive and (101, 101) in naive
    for bucket in (600, 3600, 86_400):
        got = [
            (r.lid, r.rid)
            for r in range_join_interval_overlap(
                ldf, rdf, "ls", "le", "rs", "re", bucket_seconds=bucket
            ).collect()
        ]
        assert len(got) == len(set(got)), f"duplicate pairs at bucket={bucket}"
        assert set(got) == naive, f"bucket={bucket}"
