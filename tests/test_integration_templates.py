"""Integration: the shipped reference templates driven end-to-end on real
testdata — template → schema → materialize (quality-gated) → snapshot →
append → time-travel → drift → governed read → compaction. The closest
local analog of the reference's full Dagster materialization run."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_quickstart_iac_spark.datasets import load_table
from iceberg_quickstart_iac_spark.governance import diff_schema
from iceberg_quickstart_iac_spark.operators.quality import (
    EVENT_STREAM_CHECKS,
    Check,
    run_checks,
)
from iceberg_quickstart_iac_spark.pipeline import materialize, read_table
from iceberg_quickstart_iac_spark.templates import get_template, spark_schema


@pytest.fixture(scope="module")
def event_batch(spark, sf_dir_small):
    """Map the synthetic events table into the event_stream template shape."""
    ev = load_table(spark, sf_dir_small, "events")
    return ev.select(
        F.col("event_id").cast("string").alias("event_id"),
        F.col("event_type"),
        F.col("ts").alias("event_timestamp"),
        F.col("user_id").cast("string").alias("user_id"),
        F.lit(None).cast("string").alias("session_id"),
        F.lit(None).cast("string").alias("ip_address"),
        F.lit(None).cast("string").alias("user_agent"),
        F.col("props").alias("payload"),
        F.col("ts").alias("ingested_at"),
    )


def _checks_without_freshness():
    return [c for c in EVENT_STREAM_CHECKS if c.kind != "freshness"]


def test_event_stream_template_full_lifecycle(spark, tmp_path, event_batch):
    template = get_template("event_stream")

    # materialize with the template's own check set (freshness pinned to a
    # fixed instant separately below — materialize() uses wall-clock now)
    result = materialize(
        spark, template, tmp_path, df=event_batch, checks=_checks_without_freshness()
    )
    assert result.quality.passed
    assert result.num_rows == event_batch.count()
    assert result.num_columns == 9

    # freshness against a deterministic as-of instant
    rep = run_checks(
        read_table(spark, template, tmp_path),
        [Check("freshness", "event_timestamp", max_age="1d")],
        as_of=F.lit("2024-01-31 00:00:00").cast("timestamp"),
    )
    assert rep.passed

    # append a second day and time-travel back
    first_snapshot = result.snapshot_id
    materialize(
        spark, template, tmp_path, df=event_batch, mode="append",
        checks=[c for c in _checks_without_freshness() if c.kind != "duplicate_count"],
    )
    assert read_table(spark, template, tmp_path).count() == 2 * result.num_rows
    assert (
        read_table(spark, template, tmp_path, snapshot_id=first_snapshot).count()
        == result.num_rows
    )

    # live schema matches the template (no drift)
    live = read_table(spark, template, tmp_path).schema
    assert not diff_schema(live, template, audit=False).has_drift

    # reader governance on the materialized table
    reader = read_table(spark, template, tmp_path, access_level="reader")
    assert "user_id" not in reader.columns and "ip_address" not in reader.columns

    # compaction keeps data + history
    from iceberg_quickstart_iac_spark.tables import SnapTable

    t = SnapTable.load(tmp_path / "lakehouse" / "event_stream")
    t.compact(spark, target_files=1)
    assert t.read(spark).count() == 2 * result.num_rows


def test_scd_template_merge_lifecycle(spark, tmp_path):
    """scd_type2 template + the SCD2 merge operator, end to end."""
    import datetime

    from iceberg_quickstart_iac_spark.operators.scd2 import scd2_current, scd2_merge

    template = get_template("scd_type2")
    schema = spark_schema(template)
    TS = datetime.datetime

    dim = spark.createDataFrame(
        [
            (1, "c1", "Alice", None, None, "active", TS(2024, 1, 1), None, True, None, TS(2024, 1, 1)),
        ],
        schema,
    )
    updates = spark.createDataFrame(
        [
            ("c1", "Alice", "inactive", TS(2024, 2, 1), TS(2024, 2, 1)),
            ("c2", "Bob", "active", TS(2024, 2, 1), TS(2024, 2, 1)),
        ],
        "natural_key STRING, name STRING, status STRING, effective_from TIMESTAMP, updated_at TIMESTAMP",
    )
    merged = scd2_merge(dim, updates, "natural_key", ["name", "status"])

    from iceberg_quickstart_iac_spark.operators.quality import SCD_TYPE2_CHECKS

    result = materialize(spark, template, tmp_path, df=merged, checks=SCD_TYPE2_CHECKS)
    assert result.num_rows == 3  # closed c1 + new c1 version + new c2

    current = scd2_current(read_table(spark, template, tmp_path))
    assert {r.natural_key: r.status for r in current.collect()} == {
        "c1": "inactive",
        "c2": "active",
    }
