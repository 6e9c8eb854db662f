"""Structured audit events (SURVEY §2.11 G2).

Parity target: ``dagster/lakehouse/utils/audit.py`` — identical record
shape ({timestamp, event, table, details}, UTC ISO timestamp, JSON on a
dedicated logger) and the same five event types, emitted from the same
kinds of sites (table read/write, source ingest, PII drop, schema drift).
"""

from __future__ import annotations

import json
import logging
from datetime import datetime, timezone
from typing import Any

AUDIT_EVENTS = (
    "table_read",
    "table_write",
    "source_ingest",
    "pii_columns_dropped",
    "schema_drift",
)

_audit_logger = logging.getLogger("lakehouse.audit")


def log_audit_event(event: str, table: str, *, details: dict[str, Any] | None = None) -> dict:
    """Emit one structured audit record; returns it (handy for tests)."""
    record = {
        "timestamp": datetime.now(timezone.utc).isoformat(),
        "event": event,
        "table": table,
        "details": details or {},
    }
    _audit_logger.info(json.dumps(record, default=str))
    return record
