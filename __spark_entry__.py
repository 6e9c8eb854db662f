"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's own example
analytics query — filter + group + count + sort over the event stream,
``docs/bring-your-own-data.md:83-90``) on sf0.001. ``queries()`` /
``oracle_sql()`` expose the full catalog from
``iceberg_quickstart_iac_spark.plans`` (one entry per implemented
operator from SURVEY.md §2, each aliased identically to its DuckDB
oracle).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iceberg_quickstart_iac_spark import plans


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return plans.queries()["flagship_event_type_counts"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for the few
    non-SQL-expressible operators — driver records rows-only checks)."""
    return plans.oracle_sql()
