"""Table layer: snapshot-log tables + catalog-level versioning + real-
Iceberg catalog configuration (SURVEY §2.1 S6-S10, §2.10 M1-M3)."""

from iceberg_quickstart_iac_spark.tables.catalog_conf import spark_catalog_conf
from iceberg_quickstart_iac_spark.tables.lakehouse import CatalogBranch, Lakehouse
from iceberg_quickstart_iac_spark.tables.snapstore import SnapTable, TableNotFoundError

__all__ = [
    "CatalogBranch",
    "Lakehouse",
    "SnapTable",
    "TableNotFoundError",
    "spark_catalog_conf",
]
