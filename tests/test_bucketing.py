"""Co-located bucketed join tests (SURVEY §4 shuffle control, §7 hard part 3).

The load-bearing assertion: a join between two tables bucketed on the join
key with the same bucket count plans ZERO shuffle Exchanges, while the same
join over plain parquet shuffles both sides. This is the layout contract
that makes repeated fact-dim and fact-fact joins viable at 100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_quickstart_iac_spark.datasets import load_table
from iceberg_quickstart_iac_spark.operators.bucketing import (
    bucketed_join,
    join_exchange_count,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    write_bucketed(orders, "b_orders", "o_custkey", 8, sort_col="o_custkey")
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer",
        "o_custkey",
        8,
        sort_col="o_custkey",
    )
    yield "b_orders", "b_customer"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_cobucketed_join_plans_no_exchange(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    # disable AQE broadcast demotion for a deterministic plan shape: force
    # the sort-merge path where bucketing matters
    with_conf = [
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
        ("spark.sql.adaptive.enabled", "false"),
    ]
    saved = {k: spark.conf.get(k) for k, _ in with_conf}
    try:
        for k, v in with_conf:
            spark.conf.set(k, v)
        joined = bucketed_join(spark, lt, rt, "o_custkey")
        assert join_exchange_count(joined) == 0

        # control: the identical join over the raw parquet shuffles BOTH sides
        orders = load_table(spark, sf_dir, "orders")
        customer = load_table(spark, sf_dir, "customer").withColumnRenamed(
            "c_custkey", "o_custkey"
        )
        plain = orders.join(customer, "o_custkey")
        assert join_exchange_count(plain) == 2
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_cobucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    joined = bucketed_join(spark, lt, rt, "o_custkey")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(customer, "o_custkey")
    assert joined.count() == plain.count()
    a = joined.groupBy("o_custkey").count().orderBy("o_custkey").collect()
    b = plain.groupBy("o_custkey").count().orderBy("o_custkey").collect()
    assert a == b


def test_bucketed_aggregation_reuses_layout(spark, bucketed_tables):
    lt, _ = bucketed_tables
    saved = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        agg = spark.table(lt).groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
        # the hash aggregate consumes the bucket distribution directly
        assert join_exchange_count(agg) == 0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", saved)
