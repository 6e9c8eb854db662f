"""Structured audit events (SURVEY §2.11 G2).

Behavioral parity with the reference's audit layer
(``dagster/lakehouse/utils/audit.py``): the record contract is
``{timestamp, event, table, details}`` with a UTC ISO timestamp, emitted as
one JSON line on the dedicated ``lakehouse.audit`` logger (captured by
CloudWatch / Cloud Logging with zero extra infrastructure), covering the
same five event types.

Additions over the reference:

- unknown event types are rejected (typo'd event names otherwise produce
  unqueryable audit streams);
- in-process subscribers (``add_audit_subscriber``) so tests — or an
  audit-table writer — can observe events without parsing log output.
"""

from __future__ import annotations

import json
import logging
from collections.abc import Callable
from datetime import datetime, timezone
from typing import Any

AUDIT_EVENTS = (
    "table_read",
    "table_write",
    "source_ingest",
    "pii_columns_dropped",
    "row_policy_applied",
    "schema_drift",
    "schema_evolution",
)

_audit_logger = logging.getLogger("lakehouse.audit")

_subscribers: list[Callable[[dict], None]] = []


def add_audit_subscriber(fn: Callable[[dict], None]) -> None:
    """Register an in-process observer for every audit record."""
    _subscribers.append(fn)


def remove_audit_subscriber(fn: Callable[[dict], None]) -> None:
    _subscribers.remove(fn)


def log_audit_event(event: str, table: str, *, details: dict[str, Any] | None = None) -> dict:
    """Emit one structured audit record; returns it (handy for tests).

    ``event`` must be one of :data:`AUDIT_EVENTS`; ``table`` is the fully
    qualified table name; ``details`` carries event-specific payload
    (row_count, columns_dropped, source_path, drift details, …).
    """
    if event not in AUDIT_EVENTS:
        raise ValueError(f"Unknown audit event {event!r}; expected one of {AUDIT_EVENTS}")
    record = {
        "timestamp": datetime.now(timezone.utc).isoformat(),
        "event": event,
        "table": table,
        "details": details or {},
    }
    _audit_logger.info(json.dumps(record, default=str))
    for fn in list(_subscribers):
        fn(record)
    return record
