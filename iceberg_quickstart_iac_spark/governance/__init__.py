"""Governance: column-level access, audit events, schema drift (SURVEY §2.10-§2.11)."""

from iceberg_quickstart_iac_spark.governance.access import (
    AccessLevel,
    read_with_access_level,
    read_with_row_policies,
    reader_view_sql,
)
from iceberg_quickstart_iac_spark.governance.audit import AUDIT_EVENTS, log_audit_event
from iceberg_quickstart_iac_spark.governance.drift import diff_schema

__all__ = [
    "AUDIT_EVENTS",
    "AccessLevel",
    "diff_schema",
    "log_audit_event",
    "read_with_access_level",
    "read_with_row_policies",
    "reader_view_sql",
]
