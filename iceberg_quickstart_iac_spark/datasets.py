"""Loaders for the driver-materialized synthetic tables (TESTDATA.md).

These are plain parquet scans — Catalyst gets full predicate pushdown /
column pruning — with one normalization: ``events.ts`` is written as
parquet TIMESTAMP(NANOS), which Spark's vectorized reader rejects by
default. We read it as raw int64 nanos (``nanosAsLong``) and convert to a
microsecond timestamp JVM-side (``timestamp_micros``), matching what the
production table would store (Iceberg timestamps are microsecond
precision; see reference type mapping at
``dagster/lakehouse/utils/table_loader.py:52-68``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table; normalize nanosecond timestamps to µs."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every synthetic table as a temp view (for spark.sql use)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
