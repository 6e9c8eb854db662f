"""Declarative source ingest (SURVEY §2.1 S1-S5, §2.2 P2)."""

from iceberg_quickstart_iac_spark.sources.readers import (
    ALLOWED_SCHEMES,
    project_to_schema,
    read_source,
    validate_source_path,
)

__all__ = ["ALLOWED_SCHEMES", "project_to_schema", "read_source", "validate_source_path"]
