"""As-of join: for each left row, the latest right row at-or-before its
timestamp — an operator Spark lacks natively (SURVEY custom-operator rule:
compose existing DataFrame ops when semantics allow).

Implementation is the scalable union-merge-scan, NOT a theta join:

1. tag right rows (is_right=1) and left rows (0), union by key/time
2. one shuffle: window over (key) ordered by (time, is_right DESC) — right
   rows sort before left rows at equal timestamps, giving <= semantics
3. ``last(payload, ignorenulls=True)`` carries the newest right payload
   forward; filter back to left rows

Cost: one hash shuffle on the key + a per-key sort — O(n log n) per
partition, vs O(|L|·|R|) for the naive range-join formulation. Skewed keys
are ordinary window skew (AQE does not split windows; pre-salt hot keys if
one key dominates at extreme scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
) -> DataFrame:
    """Left as-of join: every left row + the payload of the newest right row
    with the same key and ``right_time <= left_time`` (NULLs when none).

    The right side should be unique per (key, time) for determinism — pre-
    aggregate it otherwise.
    """
    payload = F.struct(*[F.col(c) for c in payload_cols]).alias("__p")
    r = right.select(
        F.col(right_on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(1).alias("__is_right"),
        payload,
    )
    l_cols = left.columns
    l = left.select(
        F.col(left_on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        *l_cols,
    )
    u = r.select("__k", "__t", "__is_right", "__p", *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in l_cols]).unionByName(l)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("__last", F.last("__p", ignorenulls=True).over(w))
    out = carried.filter(F.col("__is_right") == 0).select(
        *l_cols, *[F.col(f"__last.{c}").alias(c) for c in payload_cols]
    )
    return out
