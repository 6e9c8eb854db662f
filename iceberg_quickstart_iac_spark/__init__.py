"""iceberg_quickstart_iac_spark — a PySpark-native lakehouse analytics engine.

A brand-new engine with the query and data-processing capabilities of the
``Baselyne-Systems/iceberg-quickstart-iac`` reference (an Iceberg lakehouse
IaC + Dagster-orchestration template), re-expressed idiomatically on Spark:

- YAML table templates -> ``StructType`` + Iceberg DDL   (templates/)
- declarative source ingest (parquet/csv/json)           (sources/)
- snapshot-log tables: time-travel, expiration           (tables/)
- quality checks, SCD2 merge, as-of joins, dedup,
  similarity search, text analysis                       (operators/)
- Iceberg partition-transform scalar functions           (functions/)
- column-level access + audit events + schema drift      (governance/)
- the analytics query catalog (driver contract)          (plans/)
- incremental ingest + windowed streaming analytics      (streaming/)

Everything is DataFrame/SQL-first so Catalyst handles pushdown, pruning,
join selection, and AQE; Python touches data only through Arrow-batched
pandas UDFs where built-in operators genuinely cannot express the op.
"""

__version__ = "0.1.0"
