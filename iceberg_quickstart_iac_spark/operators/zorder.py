"""Z-order (Morton) clustering for multi-dimensional data skipping.

The Iceberg ``rewrite_data_files(strategy => 'sort', sort_order =>
'zorder(a, b)')`` analog: a linear sort clusters files tightly on ONE
column, so min/max file skipping works for predicates on that column only.
Interleaving the bits of several columns gives every file a tight
bounding BOX across all of them — predicates on any participating column
skip files (the classic Morton-curve layout Delta/Iceberg/Databricks use
for multi-dim clustering).

Construction is pure codegen bit arithmetic:

1. normalize each column to an unsigned ``bits``-wide integer by its
   global [min, max] range (one tiny aggregate computes all ranges);
2. interleave the bits — output bit ``i * n_cols + j`` takes bit ``i`` of
   column ``j`` — via shiftleft/OR chains (no UDF, no shuffle beyond the
   range repartition the rewrite needs anyway).

At 100 TB the range statistics come from table metadata for free; here one
driver-side ``agg(min, max …)`` row stands in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def column_ranges(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """Global (min, max) per column — one aggregate row on the driver."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
    row = df.agg(*aggs).collect()[0]
    return {c: (row[f"__mn_{c}"], row[f"__mx_{c}"]) for c in cols}


def _as_float(v) -> float | None:
    """Range bound → float; timestamps/dates via epoch (matching Spark's
    ``cast("double")`` on those types). Strings are rejected up front —
    a silent NULL-cast would z-order every row to bucket 0."""
    import datetime as _dt

    if v is None:
        return None
    if isinstance(v, _dt.datetime):
        return v.timestamp()
    if isinstance(v, _dt.date):
        # Spark casts date -> double as days since epoch
        return float((v - _dt.date(1970, 1, 1)).days)
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        raise ValueError(
            f"z-order supports numeric/timestamp/date columns; got {type(v).__name__}"
        )
    return float(v)


def _normalized(col: Column, lo, hi, bits: int) -> Column:
    """Map a numeric/timestamp/date value into [0, 2^bits)."""
    top = (1 << bits) - 1
    flo, fhi = _as_float(lo), _as_float(hi)
    span = fhi - flo if fhi is not None and flo is not None else 0.0
    if span <= 0:
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(flo)) / F.lit(span) * F.lit(float(top))
    return F.least(F.greatest(F.floor(scaled).cast("long"), F.lit(0)), F.lit(top))


def zorder_key(
    cols: list[Column | str],
    ranges: list[tuple[float, float]],
    bits: int = 16,
) -> Column:
    """Morton-interleaved sort key over up to 4 columns.

    ``ranges[i]`` is column i's global (min, max) — from
    :func:`column_ranges` or table metadata. NULLs normalize to 0 (sort
    first, as a linear sort would place them).
    """
    if not 1 <= len(cols) <= 4:
        raise ValueError("zorder_key takes 1-4 columns")
    if len(ranges) != len(cols):
        raise ValueError("one (min, max) range per column required")
    n = len(cols)
    norm = [
        F.coalesce(
            _normalized(F.col(c) if isinstance(c, str) else c, lo, hi, bits),
            F.lit(0).cast("long"),
        )
        for c, (lo, hi) in zip(cols, ranges)
    ]
    key = F.lit(0).cast("long")
    for bit in range(bits):
        for j, nc in enumerate(norm):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(nc, bit).bitwiseAND(F.lit(1)), bit * n + j
                )
            )
    return key
