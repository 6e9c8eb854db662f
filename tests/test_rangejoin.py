"""Bucketed range join (SURVEY §2.3 extension): equivalence with the naive
theta-join on every bucket-boundary configuration that matters."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from iceberg_quickstart_iac_spark.operators.rangejoin import range_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_range_join_matches_naive_theta_join(spark):
    # intervals chosen to hit: same-bucket, straddling a bucket edge,
    # multi-bucket span, empty (hi < lo), exact-boundary inclusivity
    points = spark.createDataFrame(
        [
            (1, 101, _ts("2024-01-01 00:10:00")),
            (1, 102, _ts("2024-01-01 01:00:00")),
            (1, 103, _ts("2024-01-01 02:59:59")),
            (2, 201, _ts("2024-01-01 00:10:00")),
        ],
        "k long, pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (1, 11, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 00:30:00")),
            (1, 12, _ts("2024-01-01 00:50:00"), _ts("2024-01-01 01:10:00")),
            (1, 13, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 03:00:00")),
            (1, 14, _ts("2024-01-01 01:00:00"), _ts("2024-01-01 01:00:00")),
            (1, 15, _ts("2024-01-01 02:00:00"), _ts("2024-01-01 01:00:00")),  # empty
            (2, 21, _ts("2024-01-01 00:10:00"), _ts("2024-01-01 00:10:00")),
        ],
        "k long, iid long, lo timestamp, hi timestamp",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in range_join(points, intervals, ["k"], "ts", "lo", "hi", bucket_s=1800).collect()
    )
    naive = sorted(
        (r.pid, r.iid)
        for r in points.join(
            intervals,
            (points.k == intervals.k) & (points.ts >= intervals.lo) & (points.ts <= intervals.hi),
        ).collect()
    )
    assert got == naive
    assert (101, 11) in got and (102, 12) in got and (102, 14) in got
    assert all(iid != 15 for _, iid in got)


def test_range_join_on_events_matches_theta_join(spark, sf_dir_small):
    from iceberg_quickstart_iac_spark.datasets import load_table

    ev = load_table(spark, sf_dir_small, "events")
    points = ev.select("user_id", F.col("event_id").alias("eid_b"), F.col("ts").alias("ts_b"))
    anchors = ev.select(
        "user_id",
        F.col("event_id").alias("eid_a"),
        F.timestamp_micros(F.unix_micros("ts") + 1).alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("hi"),
    )
    got = range_join(points, anchors, ["user_id"], "ts_b", "lo", "hi", bucket_s=3600)
    naive = (
        ev.alias("a")
        .join(
            ev.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 1 HOUR")),
        )
    )
    assert got.count() == naive.count()
    assert sorted((r.eid_a, r.eid_b) for r in got.select("eid_a", "eid_b").collect()) == sorted(
        (r.na, r.nb)
        for r in naive.select(
            F.col("a.event_id").alias("na"), F.col("b.event_id").alias("nb")
        ).collect()
    )
