"""Query catalog: the engine's analytics surface (driver contract)."""

from iceberg_quickstart_iac_spark.plans.queries import oracle_sql, queries, query

__all__ = ["queries", "oracle_sql", "query"]
