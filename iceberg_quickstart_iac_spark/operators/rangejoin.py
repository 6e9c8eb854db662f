"""Bucketed range (interval) join (SURVEY §2.3 extension).

Open-source Spark has no range-join optimization: a join whose condition
is ``keys equal AND lo <= ts <= hi`` plans as a shuffle join on the equi
keys with the band as residual — or worse, with low-cardinality keys, a
near-cartesian explosion per key. This operator decomposes the band into
an equi-join on coarse time buckets:

1. point side: tag each row with ``bucket = floor(ts / W)``;
2. interval side: explode each ``[lo, hi]`` to every bucket it overlaps;
3. plain equi-join on (keys…, bucket) — Catalyst shuffle-partitions it
   like any other join — then apply ``lo <= ts <= hi`` as the residual.

Cost model: the interval side replicates ``len/W + 1`` times (pick W at
or above the typical interval length, so ~2x), and each point meets only
the intervals sharing its bucket instead of every interval under its key.
At 100 TB both sides shuffle once on (keys…, bucket) — no skew beyond the
data's own hot keys, which salting or AQE handles as usual.

The streaming analog (stream-stream interval join) is expressed natively
by Structured Streaming's time-bound join conditions; this operator is
the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__range_bucket"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    point_ts: str,
    lo: str,
    hi: str,
    bucket_s: int = 3600,
) -> DataFrame:
    """Join point rows to interval rows: keys equal and lo <= ts <= hi
    (bounds inclusive; timestamps compared at microsecond precision).

    ``points`` and ``intervals`` must not share column names other than
    ``keys``. Empty/negative intervals (hi < lo) match nothing. Pick
    ``bucket_s`` >= the typical interval length: the interval side
    replicates once per overlapped bucket.

    DENSITY-BOUND CONTRACT (r13 sweep, SCALE_SWEEP_r13 pair_hotkey):
    output (and candidate) pairs per (keys…, bucket) cell are
    Ω(points_in_cell × intervals_in_cell) and the whole cell lands on ONE
    shuffle task — a single dense key measured α 1.22 (2.15 s → 63.5 s,
    29.5× time for 8.5× data, at 16× bot-key density). Salting cannot
    help: the blowup is the pair VOLUME itself, not partition imbalance.
    Use this operator only where per-(key, bucket) densities are bounded
    (human-scale activity); for pair-AGGREGATE semantics over possibly
    dense keys, use a join-free decomposition instead — see
    ``plans.queries.followup_pair_rollup`` (exact same-key pair counts +
    gap sums, flat on the same axis, α −0.02).
    """
    w_us = int(bucket_s) * 1_000_000
    pts = points.withColumn(_BUCKET, F.floor(F.unix_micros(F.col(point_ts)) / w_us))
    ivs = (
        intervals.filter(F.col(lo) <= F.col(hi))
        .withColumn(
            _BUCKET,
            F.explode(
                F.sequence(
                    F.floor(F.unix_micros(F.col(lo)) / w_us),
                    F.floor(F.unix_micros(F.col(hi)) / w_us),
                )
            ),
        )
    )
    return (
        pts.join(ivs, [*keys, _BUCKET])
        .filter((F.col(point_ts) >= F.col(lo)) & (F.col(point_ts) <= F.col(hi)))
        .drop(_BUCKET)
    )
