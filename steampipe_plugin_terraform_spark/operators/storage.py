"""Bucketed-table storage: the co-located fact↔fact join path.

At 100 TB the dominant shuffle is fact⋈fact on a shared key (orders ⋈
lineitem on orderkey). Writing both sides bucketed AND sorted by that key
moves the exchange from query time to write time — every subsequent join
on the key plans a SortMergeJoin directly over the bucketed scans with
ZERO Exchange nodes (pinned by tests/test_plan_shapes.py). This is the
"repartition/bucketing for co-located joins" leg of the scale design
(SCALE.md); broadcast covers dims, bucketing covers repeated fact joins.

Spark requires a catalog table for bucket metadata (`saveAsTable`, not
`save`), so callers provide a database; `ensure_database` puts it at an
explicit location to keep warehouses out of the CWD.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def ensure_database(spark: SparkSession, name: str, location: str) -> None:
    """CREATE DATABASE IF NOT EXISTS at an explicit filesystem location.

    Idempotent; an existing database keeps its original location (Spark
    semantics) — callers overwrite tables, not databases.
    """
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name} LOCATION '{location}'")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int = 8,
) -> None:
    """Persist ``df`` bucketed AND sorted by ``key``.

    Sorting within buckets lets the join skip its sort stage too
    (bucketed scan → SMJ directly). Bucket counts must match across the
    tables that will join; pick a count that divides your target
    parallelism (at 100 TB: hundreds to thousands).
    """
    (
        df.write.bucketBy(num_buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .saveAsTable(table)
    )


def zorder_key(
    xcol: str,
    ycol: str,
    xrange: tuple[int, int],
    yrange: tuple[int, int],
    bits_per_dim: int = 8,
):
    """Morton (Z-order) interleave of two integer columns as a pure JVM
    expression (shiftright/shiftleft/&/| — whole-stage codegen).

    Each dimension is first min-max scaled to ``bits_per_dim`` bits —
    WITHOUT this normalization, a wide dimension's high bits dominate the
    key and the interleave silently degenerates to a single-column sort
    for the narrow dimension (measured: an 8-bit partkey × 3-bit suppkey
    raw interleave left suppkey stats useless in every file). Delta's
    Z-ORDER solves the same problem with per-column range ids; min-max
    scaling is the deterministic, expression-only equivalent.

    Interleaving puts bit i of scaled-x at position 2i and scaled-y at
    2i+1, so points close in BOTH dimensions are close in the 1-D z key;
    sorting by z bounds every file/row-group's (x, y) min/max box tightly
    and a 2-D range predicate prunes most row groups from footer stats
    alone, where a single-column sort only prunes its own column.
    """
    from pyspark.sql import functions as F

    top = (1 << bits_per_dim) - 1

    def scaled(col: str, lo: int, hi: int) -> str:
        span = max(hi - lo, 1)
        return (
            f"CAST(((CAST({col} AS BIGINT) - {lo}) * {top}) DIV {span} AS BIGINT)"
        )

    xs, ys = scaled(xcol, *xrange), scaled(ycol, *yrange)
    terms = []
    for i in range(bits_per_dim):
        terms.append(f"shiftleft(shiftright({xs}, {i}) & 1, {2 * i})")
        terms.append(f"shiftleft(shiftright({ys}, {i}) & 1, {2 * i + 1})")
    return F.expr(" | ".join(terms))


def write_zordered(
    df: DataFrame,
    path: str,
    xcol: str,
    ycol: str,
    num_files: int = 16,
    bits_per_dim: int = 8,
) -> None:
    """Persist ``df`` as parquet clustered by the Z-order of (xcol, ycol):
    range-partitioned into ``num_files`` z-ranges, sorted by z within each,
    so parquet footer min/max stats on BOTH columns become selective.

    Per-column min/max for the bit normalization come from one bounded
    aggregate (4 longs of driver state — the same bounded-collect class as
    IVF centroids). The write is one range shuffle (same one-time cost as
    ``write_bucketed``); every subsequent 2-D range scan pays only the row
    groups whose (x, y) box intersects the predicate. At 100 TB, num_files
    scales with the data (thousands of files); pruning effectiveness is
    independent of file count because it acts per row group.
    """
    from pyspark.sql import functions as F

    r = df.agg(
        F.min(xcol).alias("xlo"),
        F.max(xcol).alias("xhi"),
        F.min(ycol).alias("ylo"),
        F.max(ycol).alias("yhi"),
    ).collect()[0]
    z = zorder_key(
        xcol, ycol, (r.xlo, r.xhi), (r.ylo, r.yhi), bits_per_dim=bits_per_dim
    )
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_partitioned(df: DataFrame, path: str, part_col: str) -> None:
    """Persist ``df`` as Hive-style partitioned parquet (one directory per
    ``part_col`` value) — the layout that makes BOTH static partition
    pruning (literal predicates on the partition column never open
    non-matching directories) and DYNAMIC partition pruning work: when the
    partition column is a join key and the dim side carries a selective
    filter, Spark injects the dim's surviving keys into the fact scan's
    PartitionFilters at runtime (``dynamicpruning`` subquery), so a
    star-schema join reads only the partitions the dim admits — at 100 TB
    the difference between scanning three months and scanning ten years.

    Partition-column cardinality should stay in the thousands (directory
    explosion hurts listing and small-files); pick a coarse derived key
    (month, not day, for multi-year facts) and rely on row-group stats
    inside each partition for finer pruning.
    """
    df.write.partitionBy(part_col).mode("overwrite").parquet(path)
