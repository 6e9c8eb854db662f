"""Column-level access control (SURVEY §2.2 P1, §2.11 G1).

Parity target: the reference's three-tier model — Lake Formation
``excluded_column_names`` on AWS (``aws/modules/iam/main.tf:75-91``), BigQuery
policy tags on GCP, and the application-layer drop in
``resources/iceberg.py:132-153``. Spark-native expression:

- ``read_with_access_level``: drop restricted columns *before* any action, so
  Catalyst column-prunes them out of the parquet scan entirely — a reader
  session never materializes restricted bytes;
- ``reader_view_sql``: a governed per-role view (CREATE VIEW t_reader AS
  SELECT <non-restricted> FROM t) for SQL-surface consumers.
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import DataFrame

from iceberg_quickstart_iac_spark.governance.audit import log_audit_event
from iceberg_quickstart_iac_spark.templates.loader import (
    get_column_names,
    get_restricted_columns,
)


class AccessLevel(str, Enum):
    ADMIN = "admin"
    WRITER = "writer"
    READER = "reader"


def read_with_access_level(
    df: DataFrame,
    template: dict,
    access_level: AccessLevel | str = AccessLevel.READER,
    table: str | None = None,
) -> DataFrame:
    """Apply column-level governance to a table read.

    Admin/writer sessions see everything; reader sessions lose the columns
    marked ``access_level: restricted`` (and the drop is audited, mirroring
    ``resources/iceberg.py:144-151``).
    """
    level = AccessLevel(access_level)
    if level is not AccessLevel.READER:
        return df
    restricted = [c for c in get_restricted_columns(template) if c in df.columns]
    if restricted:
        log_audit_event(
            "pii_columns_dropped",
            table or template.get("name", ""),
            details={"columns_dropped": restricted, "access_level": level.value},
        )
        df = df.drop(*restricted)
    return df


def read_with_row_policies(
    df: DataFrame,
    policies: dict[str, str],
    access_level: AccessLevel | str = AccessLevel.READER,
    table: str | None = None,
) -> DataFrame:
    """Row-level governance: reader sessions see only rows passing EVERY
    policy predicate (Lake Formation row filters / BigQuery row-access
    policies, expressed Spark-native).

    ``policies`` maps policy name → SQL boolean expression over the
    table's columns (e.g. ``{"region_fence": "region = 'EU'"}``). The
    predicates are plain Catalyst filters, so they push down to the scan
    like any user filter — restricted rows are pruned at the parquet
    row-group level, not post-read. Admin/writer sessions bypass, same as
    the column tier.
    """
    from pyspark.sql import functions as F

    level = AccessLevel(access_level)
    if level is not AccessLevel.READER or not policies:
        return df
    for name in sorted(policies):
        df = df.filter(F.expr(policies[name]))
    log_audit_event(
        "row_policy_applied",
        table or "",
        details={"policies": sorted(policies), "access_level": level.value},
    )
    return df


def reader_view_sql(template: dict, table_fq: str, view_fq: str | None = None) -> str:
    """Render the governed reader view DDL for a template."""
    restricted = set(get_restricted_columns(template))
    visible = [c for c in get_column_names(template) if c not in restricted]
    view_fq = view_fq or f"{table_fq}_reader"
    cols = ", ".join(visible)
    return f"CREATE OR REPLACE VIEW {view_fq} AS SELECT {cols} FROM {table_fq}"
