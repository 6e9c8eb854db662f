"""Structured Streaming surface (SURVEY §2.9 ST1-ST4)."""

from iceberg_quickstart_iac_spark.streaming.ingest import (
    freshness_monitor,
    incremental_file_ingest,
    read_file_stream,
    session_windows,
    windowed_event_counts,
)

__all__ = [
    "freshness_monitor",
    "incremental_file_ingest",
    "read_file_stream",
    "session_windows",
    "windowed_event_counts",
]
