"""Co-located (bucketed) joins — the shuffle-elimination layout (SURVEY §4
"Shuffle/partitioning control", §7 hard part 3).

Parity target: the reference's ``bucket[N]`` partition transform, which it
recommends for "high-cardinality columns you join on"
(``docs/table-template-reference.md:144``) but never exploits — execution is
delegated to Athena/BigQuery. Here the layout actually pays off: Spark's
native bucketed tables (hash-bucketed files + bucket metadata in the
catalog) let a join between two tables bucketed on the same key with the
same bucket count run with NO Exchange on either side — each task reads
bucket i of both tables and joins locally.

At 100 TB this is the difference between re-shuffling a fact table on every
join (minutes of network + spill per query) and a one-time write-side
layout cost amortized over every subsequent join/aggregation on that key.
The same idea generalizes to Iceberg storage-partitioned joins
(``spark.sql.sources.v2.bucketing.enabled`` + a ``bucket(N, col)``
partition transform) on a real lakehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.

    Sorting within buckets additionally removes the per-task Sort from
    sort-merge joins on ``bucket_col`` — the join becomes a pure streaming
    merge of pre-sorted bucket files. That elision requires ONE file per
    bucket (with several, a bucket's rows are only sorted per file), so the
    frame is first shuffled onto the bucket key: Spark's repartition hash
    and its bucket hash are both Murmur3 pmod n, giving exactly one task —
    one file — per bucket, which also avoids the many-small-files problem
    of writing B buckets from every task.
    """
    from pyspark.sql import functions as F

    writer = df.repartition(n_buckets, F.col(bucket_col)).write.bucketBy(
        n_buckets, bucket_col
    )
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").mode(mode).saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key.

    Catalyst detects the matching bucket specs and plans a sort-merge join
    with no Exchange on either side (verify with
    :func:`join_exchange_count` — asserted in tests/test_bucketing.py so a
    refactor can't silently regress the layout). Two deliberate settings
    complete the zero-work read:

    - ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` lets the
      scan REPORT the ``sortBy`` ordering, eliding the per-side Sorts too
      (off by default since Spark 3.0; sound here because
      :func:`write_bucketed` guarantees one file per bucket, the case the
      ordering claim requires);
    - a ``merge`` hint pins the sort-merge strategy, so a broadcast-small
      side at test scale can't hide the layout the plan test pins.
    """
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    return spark.table(left_table).hint("merge").join(
        spark.table(right_table), on, how
    )


def join_exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the executed physical plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )
