"""salted_join: identical results to the plain join on pathologically
skewed keys, for every supported join type."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_quickstart_iac_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 9000 rows on ONE key + a sprinkle of others, incl. a key absent
    # from the small side (exercises left/anti behavior)
    big = spark.range(10000).select(
        F.when(F.col("id") < 9000, 1).otherwise((F.col("id") % 7).cast("long")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(1, "hot"), (2, "a"), (3, "b"), (4, "c")], "k long, label string"
    )
    return big, small


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_matches_plain_join(spark, skewed, how):
    big, small = skewed
    got = salted_join(big, small, "k", salt=8, how=how)
    want = big.join(small, "k", how)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_join_rejects_right_outer(spark, skewed):
    big, small = skewed
    with pytest.raises(ValueError):
        salted_join(big, small, "k", how="right")


def test_salt_spreads_the_hot_key(spark, skewed):
    """The hot key's rows must land in >1 salt bucket — the whole point."""
    big, _ = skewed
    n = (
        big.filter(F.col("k") == 1)
        .select(F.pmod(F.xxhash64(*big.columns), F.lit(8)).alias("s"))
        .distinct()
        .count()
    )
    assert n > 1
