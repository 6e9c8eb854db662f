"""Structured Streaming surface (SURVEY §2.9 ST1-ST4)."""

from iceberg_quickstart_iac_spark.streaming.ingest import (
    freshness_monitor,
    incremental_cdc_ingest,
    incremental_file_ingest,
    incremental_wap_ingest,
    read_file_stream,
    session_windows,
    streaming_near_dup_admission,
    windowed_event_counts,
)
from iceberg_quickstart_iac_spark.streaming.stateful import (
    followup_join_stream,
    running_user_stats,
    streaming_dedup,
)

__all__ = [
    "followup_join_stream",
    "freshness_monitor",
    "incremental_cdc_ingest",
    "incremental_file_ingest",
    "incremental_wap_ingest",
    "read_file_stream",
    "running_user_stats",
    "session_windows",
    "streaming_dedup",
    "streaming_near_dup_admission",
    "windowed_event_counts",
]
