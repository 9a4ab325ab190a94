"""Range join (interval × point) — a join Spark has no native operator for.

A naive ``l.start <= r.ts AND r.ts < l.end`` join with no equi-key plans a
BroadcastNestedLoopJoin / cartesian — quadratic, fatal at scale. The
Spark-first decomposition: discretize time into coarse integer buckets
(epoch-microseconds div bucket width), explode each interval into the
buckets it overlaps, tag each point with its bucket, equi-join on the
bucket, then apply the exact range predicate. The cartesian becomes a
hash join whose blowup is bounded by ``interval_length / bucket`` copies
per interval row (pick the bucket near the median interval length: 1-2
copies typical).

This is the batch analog of the stream-stream interval join's state
bucketing; at 100 TB both sides shuffle once on the long bucket key and
AQE splits any hot bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_point_in_interval(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    ts_col: str,
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """Inner-join every point row to every interval row with
    ``start <= ts < end``, without a cartesian plan.

    Returns all columns of both inputs (callers project/aggregate after).
    Intervals are half-open; empty intervals (start >= end) match nothing.
    """
    for side, cols in (("intervals", intervals.columns), ("points", points.columns)):
        if "__bkt" in cols:
            raise ValueError(f"{side} input already has a __bkt column")
    bw = int(bucket_seconds) * 1_000_000  # epoch-µs bucket width

    # cast through TIMESTAMP so NTZ columns work too: the session-tz offset
    # shifts interval and point buckets identically, and the exact range
    # predicate below compares the ORIGINAL columns — bucket assignment is
    # only a prefilter, so correctness is timezone-independent
    def us(col: str) -> str:
        return f"unix_micros(cast({col} AS timestamp))"

    b = intervals.filter(F.expr(f"{start_col} < {end_col}")).withColumn(
        "__bkt",
        F.explode(
            F.expr(f"sequence({us(start_col)} div {bw}, ({us(end_col)} - 1) div {bw})")
        ),
    )
    p = points.withColumn("__bkt", F.expr(f"{us(ts_col)} div {bw}"))
    return (
        b.join(p, "__bkt")
        .filter((F.col(start_col) <= F.col(ts_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("__bkt")
    )
