"""Iceberg transform scalars (spec-exactness) + alert fan-out tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_quickstart_iac_spark.functions import (
    iceberg_bucket,
    iceberg_truncate,
    transform_column,
)
from iceberg_quickstart_iac_spark.governance.alerting import alert

# Genuine spec vectors (Iceberg appendix B): murmur3_x86_32 seed 0 of the
# 8-byte little-endian encoding of 34 is 2017239379; of UTF-8 "iceberg" is
# 1210000089. bucket = (hash & Integer.MAX_VALUE) % N.
def test_bucket_long_matches_iceberg_spec(spark):
    df = spark.createDataFrame([(34,), (0,), (-1,)], "v LONG")
    for n in (16, 128):
        out = {
            r.v: r.b
            for r in df.withColumn("b", iceberg_bucket("v", n, "long")).collect()
        }
        assert out[34] == (2017239379 & 0x7FFFFFFF) % n  # spec vector
        # other values: vectorized path agrees with the scalar reference impl
        from iceberg_quickstart_iac_spark.functions.transforms import _murmur3_32_bytes
        import numpy as np

        for v in (0, -1):
            h = _murmur3_32_bytes(np.array([v], dtype="<i8").tobytes())
            assert out[v] == (h & 0x7FFFFFFF) % n, (v, n)


def test_bucket_string_matches_iceberg_spec(spark):
    # spec: murmur3_x86_32(UTF-8("iceberg")) = 1210000089
    df = spark.createDataFrame([("iceberg",)], "s STRING")
    out = df.withColumn("b", iceberg_bucket("s", 16, "string")).collect()[0].b
    assert out == (1210000089 & 0x7FFFFFFF) % 16


def test_bucket_null_passthrough(spark):
    df = spark.createDataFrame([(None,)], "v LONG")
    assert df.withColumn("b", iceberg_bucket("v", 16, "long")).collect()[0].b is None


def test_truncate_string_and_int(spark):
    df = spark.createDataFrame([("abcdef", 17), ("ab", -3)], "s STRING, v INT")
    rows = df.select(
        iceberg_truncate("s", 3, "string").alias("ts"),
        iceberg_truncate("v", 10, "int").alias("tv"),
    ).collect()
    assert [(r.ts, r.tv) for r in rows] == [("abc", 10), ("ab", -10)]  # floor, not trunc


def test_transform_column_date_parts(spark):
    df = spark.createDataFrame([("2024-03-15 10:30:00",)], "s STRING").select(
        F.col("s").cast("timestamp").alias("ts")
    )
    row = df.select(
        transform_column("ts", "year").alias("y"),
        transform_column("ts", "month").alias("m"),
        transform_column("ts", "day").cast("string").alias("d"),
        transform_column("ts", "hour").cast("string").alias("h"),
    ).collect()[0]
    assert (row.y, row.m, row.d) == (2024, 3, "2024-03-15")
    assert row.h == "2024-03-15 10:00:00"


def test_transform_column_unknown():
    with pytest.raises(ValueError, match="Unknown transform"):
        transform_column("c", "zigzag")


# --- alerting -------------------------------------------------------------


def test_alert_dispatch_matrix():
    calls = []

    def fake(dest, subject, message):
        calls.append((dest, subject, message))

    env = {"ALERT_SNS_TOPIC_ARN": "arn:aws:sns:x", "ALERT_SLACK_WEBHOOK_URL": "https://hooks/x"}
    sent = alert("Drift", "details", env=env, sns_transport=fake, slack_transport=fake)
    assert sent == ["sns", "slack"] and len(calls) == 2

    assert alert("s", "m", env={}) == []  # unconfigured → logged only


def test_alert_subject_truncated_and_errors_swallowed():
    seen = {}

    def fake(dest, subject, message):
        seen["subject"] = subject

    def boom(dest, subject, message):
        raise RuntimeError("down")

    env = {"ALERT_SNS_TOPIC_ARN": "arn", "ALERT_SLACK_WEBHOOK_URL": "hook"}
    sent = alert("x" * 300, "m", env=env, sns_transport=boom, slack_transport=fake)
    assert sent == ["slack"]  # sns failure swallowed, slack still delivered
    assert len(seen["subject"]) == 100
