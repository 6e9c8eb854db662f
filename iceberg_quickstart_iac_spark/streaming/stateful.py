"""Custom stateful streaming operators (SURVEY §2.9 extension).

The reference's stub leaves stateful ingestion logic to the user
(``assets/event_streams.py:22-24``); watermarked windows (``ingest.py``)
cover time-bucketed aggregation, but two event-stream staples need
*arbitrary* keyed state that windows can't express:

- :func:`streaming_dedup` — exactly-once delivery on top of an
  at-least-once source: drop any event whose ``event_id`` was already seen
  for the same key, across micro-batches, with a processing-time state TTL
  (lazy in-state reset by default; opt-in timeout eviction for
  continuously running queries) so state doesn't grow forever.
- :func:`running_user_stats` — continuously-updated per-key lifetime
  counters (count / sum / max), emitted once per micro-batch per active
  key — the streaming analog of the batch ``quality_checks_events`` runner.

Both are Arrow-batched ``applyInPandasWithState`` operators: the stream
shuffles once on the grouping key, each executor holds only its keys'
state in the state store, and the per-group callback works on whole pandas
batches (never row-at-a-time Python).

Scale notes: state is partitioned by key across executors and bounded by
(a) the TTL on :func:`streaming_dedup` and (b) one fixed-width row per key
on :func:`running_user_stats` — both survive a 1000-executor deployment
because no task ever sees more than its own key range. RocksDB state store
(``spark.sql.streaming.stateStore.providerClass``) is the knob for
state larger than executor heap.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: output schema of :func:`streaming_dedup` — the deduped event rows
DEDUP_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ts_us", T.LongType()),
    ]
)

#: keyed state of :func:`streaming_dedup` — ids already emitted + last touch
_DEDUP_STATE = T.StructType(
    [
        T.StructField("seen_ids", T.ArrayType(T.LongType())),
        T.StructField("last_ms", T.LongType()),
    ]
)

STATS_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

_STATS_STATE = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)


def _dedup_fn(ttl_ms: int, expire_idle: bool):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        now_ms = state.getCurrentProcessingTimeMs()
        if state.exists:
            seen, last_ms = state.get
            # lazy TTL: key went quiet past the window → forget its ids
            if ttl_ms > 0 and now_ms - last_ms > ttl_ms:
                seen = []
        else:
            seen = []
        seen_set = set(seen)
        for pdf in pdfs:
            # batch-level: drop ids seen in prior batches OR earlier in this one
            fresh = pdf[~pdf["event_id"].isin(seen_set)]
            fresh = fresh.drop_duplicates(subset=["event_id"], keep="first")
            seen_set.update(fresh["event_id"].tolist())
            if len(fresh):
                yield fresh[[f.name for f in DEDUP_OUTPUT.fields]]
        state.update((sorted(seen_set), now_ms))
        if expire_idle and ttl_ms > 0:
            state.setTimeoutDuration(ttl_ms)

    return fn


def streaming_dedup(
    events: DataFrame,
    ttl_ms: int = 24 * 3600 * 1000,
    expire_idle: bool = False,
) -> DataFrame:
    """Exactly-once dedup of an at-least-once event stream.

    ``events`` must carry ``user_id, event_id, event_type, value, ts_us``.
    Keyed on ``user_id``; an event_id that reappears (same key) in the same
    or any later micro-batch inside the TTL window is dropped. A key quiet
    for longer than ``ttl_ms`` has its id-set reset on its next event
    (lazy, in-state TTL — works under any trigger).

    ``expire_idle=True`` additionally registers a processing-time timeout
    that physically evicts idle keys' state. Use it ONLY for continuously
    running queries: with ``Trigger.AvailableNow`` a registered
    processing-time timeout keeps the query scheduling micro-batches until
    the timeout fires, so the query never terminates.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _dedup_fn(ttl_ms, expire_idle),
        outputStructType=DEDUP_OUTPUT,
        stateStructType=_DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout
        if expire_idle and ttl_ms > 0
        else GroupStateTimeout.NoTimeout,
    )


def _stats_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, s, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, s, mx))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [s], "max_value": [mx]}
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Lifetime per-user counters, re-emitted each micro-batch the user is
    active (``update`` semantics downstream). One fixed-width state row per
    key — state size is O(distinct users), independent of event volume."""
    return events.groupBy("user_id").applyInPandasWithState(
        _stats_fn,
        outputStructType=STATS_OUTPUT,
        stateStructType=_STATS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def followup_join_stream(
    anchors: DataFrame,
    followups: DataFrame,
    max_gap_s: int = 3600,
    watermark_s: int = 7200,
) -> DataFrame:
    """Watermarked stream-stream interval join — the streaming analog of
    ``operators.rangejoin.range_join`` (events within ``max_gap_s`` after a
    same-user anchor), expressed with Spark's native time-bound join.

    ``anchors`` needs ``user_id, event_id AS anchor_id, ts_a``;
    ``followups`` needs ``user_id, event_id AS follow_id, ts_b``. The time
    bound (``ts_b`` in ``(ts_a, ts_a + max_gap_s]``) plus both watermarks
    lets the state store evict anchors older than the watermark — bounded
    state on an unbounded stream, which is what makes this viable as an
    always-on job. Output: one row per (anchor, follow-up) pair with the
    gap in seconds.
    """
    a = anchors.withWatermark("ts_a", f"{watermark_s} seconds")
    b = followups.withWatermark("ts_b", f"{watermark_s} seconds")
    cond = (
        (a["user_id"] == b["user_id"])
        & (b["ts_b"] > a["ts_a"])
        & (b["ts_b"] <= a["ts_a"] + F.expr(f"INTERVAL {int(max_gap_s)} SECONDS"))
    )
    return a.join(b, cond).select(
        a["user_id"],
        "anchor_id",
        "follow_id",
        (F.unix_micros(b["ts_b"]) - F.unix_micros(a["ts_a"])).alias("gap_us"),
    )
