"""salted_join: result parity with the plain join + actual salt spread."""

import pytest
from pyspark.sql import functions as F

from steampipe_plugin_terraform_spark.operators.skew import SALT_COL, salted_join


@pytest.fixture()
def skewed_fact(spark):
    # 2000 rows on the hot key, a handful elsewhere
    hot = spark.range(2000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(10).select((F.col("id") + 2).alias("k"), F.col("id").alias("v"))
    return hot.unionByName(cold)


@pytest.fixture()
def dim(spark):
    return spark.range(8).select((F.col("id") + 1).alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name"))


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_matches_plain_join(spark, skewed_fact, dim, how):
    plain = skewed_fact.join(dim, "k", how)
    salted = salted_join(skewed_fact, dim, "k", salt=8, how=how)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salt_actually_spreads_hot_key(spark, skewed_fact):
    salted = skewed_fact.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(8)).cast("int")
    )
    per_salt = (
        salted.filter(F.col("k") == 1).groupBy(SALT_COL).count().collect()
    )
    assert len(per_salt) == 8  # every salt bucket gets a share
    counts = [r["count"] for r in per_salt]
    assert max(counts) < 2000  # no single bucket holds the hot key

def test_unsupported_how_raises(spark, skewed_fact, dim):
    with pytest.raises(ValueError):
        salted_join(skewed_fact, dim, "k", how="full_outer")


def test_salt_column_collision_raises(spark, skewed_fact, dim):
    # an input already carrying __salt would silently join on the wrong
    # column; must fail loudly instead
    with pytest.raises(ValueError, match="__salt"):
        salted_join(skewed_fact.withColumn(SALT_COL, F.lit(0)), dim, on="k")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(skewed_fact, dim.withColumn(SALT_COL, F.lit(0)), on="k")
