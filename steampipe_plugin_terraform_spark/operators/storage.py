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
