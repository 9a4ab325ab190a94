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


def range_join_interval_overlap(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval × interval overlap join: every (left, right) pair of
    half-open intervals with ``l_start < r_end AND r_start < l_end`` —
    the both-sides-are-ranges generalization of
    ``range_join_point_in_interval`` (sessions × incident windows,
    maintenance windows × order lifetimes, …), which Spark would
    otherwise plan as a BroadcastNestedLoopJoin.

    Both sides explode into the coarse buckets they cover and equi-join
    on the bucket; the exact overlap predicate then filters. An
    overlapping pair can share MANY buckets — instead of a global
    DISTINCT (a second shuffle over the pair set), each pair is kept
    only in the bucket containing the overlap's START
    (``greatest(l_start, r_start)``): exactly one bucket qualifies, so
    the dedup is a free per-row filter.

    Returns all columns of both inputs. Empty intervals match nothing.
    """
    for side, cols in (("left", left.columns), ("right", right.columns)):
        if "__bkt" in cols:
            raise ValueError(f"{side} input already has a __bkt column")
    bw = int(bucket_seconds) * 1_000_000

    def us(col: str) -> str:
        return f"unix_micros(cast({col} AS timestamp))"

    def burst(df: DataFrame, start: str, end: str) -> DataFrame:
        return df.filter(F.expr(f"{start} < {end}")).withColumn(
            "__bkt",
            F.explode(
                F.expr(f"sequence({us(start)} div {bw}, ({us(end)} - 1) div {bw})")
            ),
        )

    lb = burst(left, l_start, l_end)
    rb = burst(right, r_start, r_end).withColumnRenamed("__bkt", "__bkt_r")
    return (
        lb.join(rb, F.expr("__bkt = __bkt_r"))
        .filter(
            F.expr(
                f"{l_start} < {r_end} AND {r_start} < {l_end} "
                f"AND __bkt = greatest({us(l_start)}, {us(r_start)}) div {bw}"
            )
        )
        .drop("__bkt", "__bkt_r")
    )
