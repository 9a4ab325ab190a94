"""Mergeable log-scale quantile sketch over positive integers — the
DDSketch idea (relative-error-bounded log-spaced buckets, counts merge by
addition) restated in EXACT integer arithmetic so two engines agree
bucket-for-bucket:

A positive integer ``v`` maps to the bucket whose lower bound keeps v's
top ``m+1`` significant bits and zeroes the rest::

    e  = floor(log2 v)          -- exact: length(bin(v)) - 1
    lb = v                       if v < 2^m
       = (v >> (e-m)) << (e-m)   otherwise

``lb`` IS the bucket key (distinct lbs ↔ distinct buckets — no separate
index arithmetic), every bucket satisfies ``lb <= v < lb + 2^(e-m)``, so
any value quantile answered from bucket lower bounds has relative error
< 2^-m (m=5 → 3.125 %), and values below 2^m are EXACT. No logarithms,
no floats: ``bin()``/shifts are bit-identical in Spark and DuckDB, which
is what makes the sketch oracle-replayable — a true t-digest's centroids
are FP-accumulation-order-dependent and engine-opaque (the same reason
``q_approx_distinct`` is rows-only; this is the checkable alternative,
playing the role KMV plays beside HLL).

Mergeability is the point at scale: the sketch is a (lb, count) frame,
and merging ANY number of sub-sketches is ``groupBy(lb).sum(count)`` —
associative and commutative, so Spark's map-side partial aggregation
already builds one sketch per partition and the single exchange carries
only ≤ (64-m)·2^m + 2^m bucket rows per partition (≈ 1.9k for m=5),
regardless of row count. Everything after the first partial aggregate is
sketch-sized: the cumulative-rank window runs over ≤ 1.9k rows, never
the data. Contrast the exact-quantile path (a global sort): this trades
a bounded 3 % value error for shuffle bytes independent of N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def logbucket_expr(col: str, m: int = 5) -> str:
    """Spark-SQL expression for the bucket lower bound of positive
    integer column ``col`` (exact; see module docstring). The SAME text
    is valid DuckDB SQL — the oracle embeds it verbatim."""
    e = f"(length(bin({col})) - 1)"
    return (
        f"CASE WHEN {col} < {1 << m} THEN {col} "
        f"ELSE ({col} >> ({e} - {m})) << ({e} - {m}) END"
    )


def logsketch(df: DataFrame, col: str, m: int = 5) -> DataFrame:
    """Build the sketch: (lb, cnt) bucket counts for positive-integer
    ``col``. One map-side-combined aggregation; output ≤ ~(64-m)·2^m
    rows. Merge sketches by unioning and re-running this groupBy.
    The grouped form with no keys — one bucket-build implementation to
    keep in lockstep with the oracle SQL, not two."""
    return logsketch_by(df, col, [], m)


def logsketch_merge(sketches: list[DataFrame]) -> DataFrame:
    """Merge any number of (lb, cnt) sketches: union + re-sum. Because
    bucket counts are additive and the bucket key is the value-determined
    lower bound (no per-sketch state), the merge of sketches over
    disjoint slices is EXACTLY the sketch of the union of the slices —
    the mergeability property that lets per-partition / per-day / per-
    shard sketches roll up without revisiting data. Output stays
    sketch-sized (≤ ~(64-m)·2^m rows)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("lb").agg(F.sum("cnt").cast("long").alias("cnt"))


def logsketch_by(df: DataFrame, col: str, keys: list[str], m: int = 5) -> DataFrame:
    """Per-group sketches in ONE map-side-combined aggregation:
    (keys..., lb, cnt) rows, ≤ ~(64-m)·2^m buckets per group. The
    grouped twin of ``logsketch`` — same bucket key, so per-group
    sketches still merge by re-summing."""
    return (
        df.select(*keys, F.expr(logbucket_expr(col, m)).alias("lb"))
        .groupBy(*keys, "lb")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def logsketch_quantiles_by(
    sketch: DataFrame, keys: list[str], q_pcts: list[int]
) -> DataFrame:
    """Per-group quantiles from a grouped sketch: same integer rank test
    as ``logsketch_quantiles``, but the windows PARTITION BY the group
    keys — each window sees one group's sketch (≤ ~1.9k rows), so the
    pass stays keyed and parallel at any group count. Returns
    (keys..., q_pct, est) rows."""
    from pyspark.sql.window import Window

    spark = sketch.sparkSession
    wcum = Window.partitionBy(*keys).orderBy("lb").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy(*keys).orderBy("lb").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = sketch.withColumn("cum", F.sum("cnt").over(wcum)).withColumn(
        "n", F.sum("cnt").over(wall)
    )
    spec = spark.createDataFrame([(q,) for q in q_pcts], "q_pct int")
    return (
        cum.crossJoin(F.broadcast(spec))
        .filter(F.col("cum") * 100 >= F.col("q_pct") * F.col("n"))
        .groupBy(*keys, "q_pct")
        .agg(F.min("lb").alias("est"))
    )


def logsketch_quantiles(sketch: DataFrame, q_pcts: list[int]) -> DataFrame:
    """Answer integer-percent quantiles from a (lb, cnt) sketch: for each
    q the estimate is the lower bound of the bucket holding rank
    ceil(q·N/100) — selected by the integer test ``100·cum >= q·N`` (no
    division; ``100·cum`` stays in int64 to N ≈ 2^63/100 ≈ 9.2e16 rows).
    Returns (q_pct, est) rows.

    The running and total counts come from ONE pass of two window frames
    over the bucket frame (a deliberate single-partition window — the
    sketch is ≤ ~1.9k rows by construction, so "no global windows" does
    not apply), which keeps the input sketch referenced once: no second
    aggregation branch re-expanding the build lineage into a second
    scan. The grouped form with no keys (``Window.partitionBy()`` with
    zero columns IS the global window) — one rank-test implementation
    to keep in lockstep with the oracle SQL, not two."""
    return logsketch_quantiles_by(sketch, [], q_pcts)


def bitmap_distinct(
    df: DataFrame, keys: list[str], id_col: str, word_bits: int = 62
) -> DataFrame:
    """Exact MERGEABLE COUNT(DISTINCT id) per key via bitmap words — the
    roaring-bitmap device (ClickHouse groupBitmap / Druid / Kylin):
    pack ids into ``word_bits``-bit words (``word_idx = id DIV
    word_bits``, default 62 keeps every shift strictly below the BIGINT
    sign bit on any engine), bit_or the words with a map-side combine,
    then count bits. The post-partial exchange carries at most
    #keys × ceil(max_id/word_bits) 8-byte words regardless of input
    row count, and partials merge by OR — sketch-shaped state, exact
    answer. Requires dense NON-NEGATIVE integer ids (a negative id
    would flip DIV truncation away from floor and shift out of range);
    sparse id spaces swap the word for a roaring container, same
    algebra. NULL ids follow COUNT(DISTINCT) semantics exactly: a
    NULL id contributes nothing (its shift is NULL, so its word stays
    NULL and ``count(word)``/``coalesce(sum(...), 0)`` skip it), while
    the KEY GROUP itself survives — a key whose ids are all NULL
    reports (0, 0), not a missing row (a pre-filter would drop the
    group entirely). Returns (keys…, n_distinct, n_words)."""
    words = df.groupBy(
        *keys, F.expr(f"{id_col} DIV {word_bits}").alias("word_idx")
    ).agg(
        F.expr(
            f"bit_or(shiftleft(CAST(1 AS BIGINT),"
            f" CAST({id_col} % {word_bits} AS INT)))"
        ).alias("word")
    )
    return words.groupBy(*keys).agg(
        F.expr("CAST(coalesce(sum(bit_count(word)), 0) AS BIGINT)").alias(
            "n_distinct"
        ),
        F.count("word").cast("long").alias("n_words"),
    )
