"""Point-in-time (as-of) join (SURVEY §2.3 J4).

Parity target: the reference's feature-store semantics — "point-in-time
feature values … time-travel for training data consistency"
(``docs/table-template-reference.md:290-294``, ``feature_table.yaml:11-14``).
Spark has no native ASOF JOIN; the scalable construction here is the
union + running-``last`` window:

1. tag left (probe) and right (reference) rows, union them on aligned
   columns;
2. one window per key, ordered by (ts, side) with right-before-left at
   equal timestamps → backward-inclusive semantics;
3. ``last(value, ignorenulls=True)`` over unbounded-preceding rows carries
   the most recent right-side values onto each left row.

Cost: ONE shuffle on the join key (the window sort), no row explosion, no
range cross-product — this survives 100 TB where a naive
``l.ts >= r.ts`` range join (O(n·m) per key) does not. Skewed keys are
handled by AQE; a per-key salting variant is unnecessary because the window
is a linear scan per key, not a join fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    how: str = "left",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.right_ts <= left.left_ts`` (backward-inclusive), per key.

    ``value_cols``: right columns to carry (default: all non-key, non-ts).
    ``tolerance_seconds``: matches older than this are nulled out.
    ``how``: 'left' keeps unmatched left rows; 'inner' drops them.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in keys and c != right_ts]
    carried = [*value_cols, right_ts]  # right_ts carried for tolerance/inspection

    left_cols = [c for c in left.columns if c not in keys and c != left_ts]

    # a carried right column sharing a name with a left column would emit two
    # identically-named output columns, making every later F.col(c) ambiguous
    # — fail loudly instead of producing a silently unusable frame
    collisions = sorted(set(carried) & set([*left_cols, left_ts]))
    if collisions:
        raise ValueError(
            f"as_of_join: right columns {collisions} collide with left columns; "
            "rename them on the right side (or pass explicit value_cols) first"
        )

    tagged_left = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in carried],
    )
    tagged_right = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c).alias(f"__r_{c}") for c in carried],
    )

    unioned = tagged_left.unionByName(tagged_right)
    w = (
        W.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        *keys,
        "__ts",
        "__side",
        *left_cols,
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__r_{c}") for c in carried],
    ).filter(F.col("__side") == 1)

    matched_ts = F.col(f"__r_{right_ts}")
    if tolerance_seconds is not None:
        in_tol = matched_ts.isNotNull() & (
            F.col("__ts").cast("long") - matched_ts.cast("long") <= tolerance_seconds
        )
        filled = filled.select(
            *keys,
            "__ts",
            "__side",
            *left_cols,
            *[F.when(in_tol, F.col(f"__r_{c}")).alias(f"__r_{c}") for c in carried],
        )

    if how == "inner":
        filled = filled.filter(F.col(f"__r_{right_ts}").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")

    out_cols = (
        [F.col(k) for k in keys]
        + [F.col("__ts").alias(left_ts)]
        + [F.col(c) for c in left_cols]
        + [F.col(f"__r_{c}").alias(c) for c in carried]
    )
    return filled.select(*out_cols)
