"""Stateful streaming operators (SURVEY §2.9 extension): keyed
applyInPandasWithState dedup and running counters, driven with
AvailableNow + foreachBatch parquet sinks across checkpoint-restarted
runs (the memory sink can't recover from a checkpoint)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from iceberg_quickstart_iac_spark.streaming import (
    read_file_stream,
    running_user_stats,
    streaming_dedup,
)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ts_us", T.LongType()),
    ]
)


@pytest.fixture(autouse=True)
def _few_state_stores(spark):
    """2 shuffle partitions → 2 state stores per query: state-store commit
    overhead, not data volume, dominates these tiny streams."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", old)


def _us(s: str) -> int:
    """ISO 'YYYY-MM-DD HH:MM:SS' (UTC) → epoch microseconds."""
    from datetime import datetime, timezone

    return int(
        datetime.fromisoformat(s).replace(tzinfo=timezone.utc).timestamp() * 1_000_000
    )


def _write_slice(spark, path, rows):
    spark.createDataFrame(
        rows, "user_id LONG, event_id LONG, event_type STRING, value DOUBLE, ts_us LONG"
    ).coalesce(1).write.mode("append").parquet(path)


def _drain(spark, stream_df, ckpt, out, mode):
    """Run the stream to completion, appending every micro-batch to ``out``.

    foreachBatch (unlike the memory sink) supports restart-from-checkpoint,
    which is the whole point of these tests; ``out`` accumulates across runs
    so each call returns only the rows emitted by THIS run.
    """
    import glob

    before = set(glob.glob(f"{out}/*.parquet"))

    def sink(batch_df, _batch_id):
        batch_df.coalesce(1).write.mode("append").parquet(out)

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "availableNow query failed to terminate"
    new = sorted(set(glob.glob(f"{out}/*.parquet")) - before)
    if not new:
        return []
    return spark.read.parquet(*new).collect()


def test_streaming_dedup_within_and_across_batches(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    # slice 1: event 10 delivered twice in the SAME batch
    _write_slice(
        spark,
        src,
        [(1, 10, "click", 1.0, 1000), (1, 10, "click", 1.0, 1000), (1, 11, "view", 2.0, 2000)],
    )
    out1 = _drain(
        spark, streaming_dedup(read_file_stream(spark, src, SCHEMA)), ckpt, str(tmp_path / "dedup_run1"), "append"
    )
    assert sorted(r.event_id for r in out1) == [10, 11]

    # slice 2 (restarted run, same checkpoint): 10 and 11 redelivered, 12 new —
    # state survives the restart, so only 12 comes out
    _write_slice(
        spark,
        src,
        [(1, 10, "click", 1.0, 1000), (1, 11, "view", 2.0, 2000), (1, 12, "buy", 3.0, 3000)],
    )
    out2 = _drain(
        spark, streaming_dedup(read_file_stream(spark, src, SCHEMA)), ckpt, str(tmp_path / "dedup_run2"), "append"
    )
    assert sorted(r.event_id for r in out2) == [12]


def test_streaming_dedup_is_per_key(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    # same event_id under two different keys → both kept
    _write_slice(spark, src, [(1, 77, "click", 1.0, 1000), (2, 77, "click", 1.0, 1000)])
    out = _drain(
        spark, streaming_dedup(read_file_stream(spark, src, SCHEMA)), ckpt, str(tmp_path / "dedup_keys"), "append"
    )
    assert sorted((r.user_id, r.event_id) for r in out) == [(1, 77), (2, 77)]


def test_streaming_dedup_ttl_resets_quiet_keys(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    _write_slice(spark, src, [(1, 10, "click", 1.0, 1000)])
    dedup = lambda: streaming_dedup(read_file_stream(spark, src, SCHEMA), ttl_ms=1)  # noqa: E731
    out1 = _drain(spark, dedup(), ckpt, str(tmp_path / "ttl_r1"), "append")
    assert [r.event_id for r in out1] == [10]

    # well past the 1ms TTL by the next run: the redelivered id re-emits
    _write_slice(spark, src, [(1, 10, "click", 1.0, 1000)])
    out2 = _drain(spark, dedup(), ckpt, str(tmp_path / "ttl_r2"), "append")
    assert [r.event_id for r in out2] == [10]


def test_running_user_stats_accumulates_across_runs(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    _write_slice(spark, src, [(1, 1, "click", 2.0, 1000), (1, 2, "view", 4.0, 2000)])
    out1 = _drain(
        spark, running_user_stats(read_file_stream(spark, src, SCHEMA)), ckpt, str(tmp_path / "stats_r1"), "update"
    )
    (row,) = [r for r in out1 if r.user_id == 1]
    assert (row.n_events, row.sum_value, row.max_value) == (2, 6.0, 4.0)

    # second run: state carries the lifetime totals forward
    _write_slice(spark, src, [(1, 3, "buy", 10.0, 3000), (2, 4, "click", 1.0, 4000)])
    out2 = _drain(
        spark, running_user_stats(read_file_stream(spark, src, SCHEMA)), ckpt, str(tmp_path / "stats_r2"), "update"
    )
    by_user = {r.user_id: r for r in out2}
    assert (by_user[1].n_events, by_user[1].sum_value, by_user[1].max_value) == (3, 16.0, 10.0)
    assert (by_user[2].n_events, by_user[2].sum_value, by_user[2].max_value) == (1, 1.0, 1.0)


def test_followup_join_stream_matches_batch_range_join(spark, tmp_path):
    """Stream-stream interval join produces exactly the pairs the batch
    bucketed range_join finds on the same data."""
    from pyspark.sql import functions as F

    from iceberg_quickstart_iac_spark.streaming.stateful import followup_join_stream

    rows = [
        (1, 10, "click", 1.0, _us("2024-01-01 00:00:00")),
        (1, 11, "buy", 2.0, _us("2024-01-01 00:30:00")),   # 30min after 10
        (1, 12, "view", 3.0, _us("2024-01-01 02:00:00")),  # past 1h from both
        (2, 20, "click", 1.0, _us("2024-01-01 00:00:00")),
        (2, 21, "buy", 1.0, _us("2024-01-01 01:00:00")),   # exactly 1h -> inclusive
    ]
    src = str(tmp_path / "src")
    _write_slice(spark, src, rows)

    base = read_file_stream(spark, src, SCHEMA).withColumn(
        "ts", F.timestamp_micros("ts_us")
    )
    anchors = base.select(
        "user_id", F.col("event_id").alias("anchor_id"), F.col("ts").alias("ts_a")
    )
    follows = base.select(
        "user_id", F.col("event_id").alias("follow_id"), F.col("ts").alias("ts_b")
    )
    out = _drain(
        spark,
        followup_join_stream(anchors, follows, max_gap_s=3600),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
        "append",
    )
    got = sorted((r.anchor_id, r.follow_id, r.gap_us) for r in out)
    assert got == [(10, 11, 1800_000000), (20, 21, 3600_000000)]
