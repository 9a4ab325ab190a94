"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator family from SURVEY.md §2
(relational core, events/time-series, terraform tables, LLM-pipeline
extensions), each a (spark, sf_dir) → DataFrame callable.
``oracle_sql()`` — the DuckDB-runnable ANSI SQL equivalent per query
(terraform queries use golden VALUES derived from the fixture corpus;
approx-distinct and the k-means IVF entries are rows-only by design —
HLL sketches and iterative clustering are engine-specific; simhash and
hyperplane-LSH oracles replay their full md5-deterministic pipelines).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from steampipe_plugin_terraform_spark.catalog import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omissions get the rows-only check."""
    return dict(ORACLES)
