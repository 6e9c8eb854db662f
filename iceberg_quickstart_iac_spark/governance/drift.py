"""Schema-drift detection (SURVEY §2.10 M5).

Parity target: ``dagster/lakehouse/sensors/schema_drift.py:54-110`` — diff a
live table schema against its YAML template: missing columns, extra columns,
and type mismatches on the intersection; drift emits a ``schema_drift`` audit
event. The reference polls hourly via a Dagster sensor; here the diff is a
pure function over ``df.schema`` so it can run from any scheduler (or a
Structured Streaming monitor).

Both sides are compared in *Spark* type space: the template compiles through
the same ``iceberg_type_to_spark`` mapping used for DDL, so deliberate
demotions (time/uuid → string) don't read as drift — the live table was
created through that mapping too.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

from iceberg_quickstart_iac_spark.governance.audit import log_audit_event
from iceberg_quickstart_iac_spark.templates.loader import iceberg_type_to_spark


@dataclass
class DriftReport:
    table: str
    missing_columns: list[str] = field(default_factory=list)
    extra_columns: list[str] = field(default_factory=list)
    type_mismatches: dict[str, dict[str, str]] = field(default_factory=dict)

    @property
    def has_drift(self) -> bool:
        return bool(self.missing_columns or self.extra_columns or self.type_mismatches)

    def message(self) -> str:
        if not self.has_drift:
            return f"No schema drift in {self.table}"
        msg = f"Schema drift detected in {self.table}."
        if self.missing_columns:
            msg += f" Missing columns: {self.missing_columns}."
        if self.extra_columns:
            msg += f" Extra columns: {self.extra_columns}."
        if self.type_mismatches:
            msg += f" Type mismatches: {self.type_mismatches}."
        return msg


def diff_schema(live_schema: T.StructType, template: dict, audit: bool = True) -> DriftReport:
    """Compare a live StructType against a template's declared columns."""
    table = f"{template.get('namespace', 'default')}.{template['name']}"
    expected = {c["name"]: iceberg_type_to_spark(c.get("type", "string")) for c in template["columns"]}
    live = {f.name: f.dataType for f in live_schema.fields}

    report = DriftReport(
        table=table,
        missing_columns=sorted(set(expected) - set(live)),
        extra_columns=sorted(set(live) - set(expected)),
    )
    for name in sorted(set(expected) & set(live)):
        if expected[name] != live[name]:
            report.type_mismatches[name] = {
                "expected": expected[name].simpleString(),
                "actual": live[name].simpleString(),
            }

    if report.has_drift and audit:
        log_audit_event(
            "schema_drift",
            table,
            details={
                "missing_columns": report.missing_columns,
                "extra_columns": report.extra_columns,
                "type_mismatches": report.type_mismatches,
            },
        )
    return report
