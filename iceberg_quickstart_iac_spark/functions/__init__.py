"""Scalar functions: Iceberg partition-transform analogs (SURVEY §2.8 F2-F4)."""

from iceberg_quickstart_iac_spark.functions.transforms import (
    iceberg_bucket,
    iceberg_truncate,
    transform_column,
)

__all__ = ["iceberg_bucket", "iceberg_truncate", "transform_column"]
