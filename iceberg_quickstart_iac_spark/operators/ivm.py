"""Incremental view maintenance: materialized rollups kept current from
the snapshot changelog (SURVEY §2.4/§2.10 composition).

The reference's model materializes every asset by full refresh
(``docs/bring-your-own-data.md:220-224``); its own docs list incremental
loads as the follow-up. This is the aggregate half of that follow-up: a
rollup table (GROUP BY dims → sums/counts) that refreshes by applying only
the rows that CHANGED since its last refresh — Delta CDF / Iceberg
changelog-scan fed into a MERGE, the standard lakehouse IVM recipe.

Correctness design:

- only **self-maintainable aggregates** are allowed (SUM/COUNT — AVG
  derives): they absorb inserts as ``+x`` and deletes as ``-x`` with no
  rescan. MIN/MAX are refused loudly — a deleted extremum needs the base
  table again, which would silently turn "incremental" into "full scan".
- sums are maintained in **DECIMAL** — decimal addition is exact and
  order-independent, so the incremental result is bit-identical to a full
  recompute (a double-typed sum would drift by accumulation order and the
  equivalence below could not hold).
- groups whose row count reaches zero are **deleted**, not left as
  zero-sum debris (the MERGE's first-match-wins delete clause).

The invariant tests + the catalog query's DuckDB oracle pin:
``refresh_rollup(...)`` after any mix of appends/deletes/updates equals
the full GROUP BY over the source's current snapshot, exactly.

Scale: one changelog diff (two exceptAll passes — the honest price of
directory-granular manifests; file-granular manifests would diff
manifests first), one partial-aggregated groupBy over the DELTA only,
and one merge keyed on the group columns. Refresh cost follows the
change volume, not the source size — the point of IVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_quickstart_iac_spark.tables.snapstore import SnapTable

#: exact, order-independent accumulator type for maintained sums
SUM_TYPE = "decimal(28,6)"
COUNT_COL = "_n_rows"


def _validate_measures(measures: dict[str, tuple[str, str]]) -> None:
    for out, (src_col, agg) in measures.items():
        if agg != "sum":
            raise ValueError(
                f"ivm: measure {out!r} uses {agg!r} — only self-maintainable "
                "aggregates are supported (sum/count; avg derives from them). "
                "min/max need a base-table rescan on delete; compute those "
                "with a full refresh instead."
            )
        if out == COUNT_COL:
            raise ValueError(f"ivm: {COUNT_COL!r} is reserved for the row count")


def rollup_template(
    src: SnapTable,
    name: str,
    group_cols: list[str],
    measures: dict[str, tuple[str, str]],
) -> dict:
    """The destination table template: group columns typed from the
    source's declared schema, decimal sum columns, and the row-count
    column that drives zero-group deletion."""
    _validate_measures(measures)
    src_types = {c["name"]: c["type"] for c in src.meta.get("columns", [])}
    missing = [c for c in group_cols if c not in src_types]
    if missing:
        raise ValueError(f"ivm: group columns {missing} not in {src.fq_name}")
    cols = [{"name": c, "type": src_types[c]} for c in group_cols]
    cols += [{"name": out, "type": SUM_TYPE} for out in measures]
    cols.append({"name": COUNT_COL, "type": "long"})
    return {"name": name, "namespace": src.meta.get("namespace", "lakehouse"), "columns": cols}


def _aggregate(
    df: DataFrame,
    group_cols: list[str],
    measures: dict[str, tuple[str, str]],
    sign: Column | None = None,
) -> DataFrame:
    """GROUP BY with decimal sums; ``sign`` (±1) turns the same expression
    into the delta aggregator (insert = +, delete = −)."""
    s = sign if sign is not None else F.lit(1)
    aggs = [
        F.sum(F.col(src_col).cast(SUM_TYPE) * s).cast(SUM_TYPE).alias(out)
        for out, (src_col, _) in measures.items()
    ]
    aggs.append(F.sum(s.cast("long")).alias(COUNT_COL))
    return df.groupBy(*group_cols).agg(*aggs)


def refresh_rollup(
    spark: SparkSession,
    src: SnapTable,
    dst: SnapTable,
    group_cols: list[str],
    measures: dict[str, tuple[str, str]],
) -> dict:
    """Bring ``dst`` up to date with ``src``'s current snapshot.

    First refresh (no watermark) computes the full rollup; later
    refreshes read only the changelog since the watermark and MERGE the
    per-group deltas: matched groups update (or delete when their row
    count hits zero), new groups insert.

    The watermark (applied source snapshot id) is recorded INSIDE the
    refresh's own commit entry on ``dst`` — watermark and merge are one
    atomic commit, so a crash can never land the non-idempotent delta
    merge without its watermark and double-count sums on the next
    refresh. The merge is additionally stamped into the transaction
    ledger (``txn``) keyed on the source head sequence, so replaying the
    SAME watermark transition after a crash is an idempotent skip.
    ``dst``'s table properties keep a copy purely as a legacy fallback.
    Returns ``{"refreshed", "mode", "src_snapshot"}``.
    """
    _validate_measures(measures)
    head = src._entries()[-1]
    cur = head["snapshot_id"]
    # watermark truth lives in dst's commit entries (atomic with the
    # refresh that applied it); properties are the pre-atomicity fallback
    last = None
    for e in reversed(dst._entries()):
        if "ivm_src_snapshot" in e:
            last = e["ivm_src_snapshot"]
            break
    if last is None:
        last = (dst.meta.get("properties", {}) or {}).get("ivm_src_snapshot")
    if last == cur:
        return {"refreshed": False, "mode": "noop", "src_snapshot": cur}

    watermark = {"ivm_src_snapshot": cur}
    if last is None:
        dst.overwrite(
            _aggregate(src.read(spark), group_cols, measures),
            entry_extra=watermark,
        )
        mode = "full"
    else:
        changes = src.read_changes(spark, last, cur)
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        deltas = _aggregate(changes, group_cols, measures, sign=sign)
        on = " AND ".join(f"t.{c} <=> s.{c}" for c in group_cols)
        dst.merge_into(
            spark,
            deltas,
            on,
            txn=(f"ivm:{src.fq_name}->{dst.fq_name}", head["sequence"]),
            entry_extra=watermark,
            when_matched=[
                {
                    "action": "delete",
                    "condition": f"t.{COUNT_COL} + s.{COUNT_COL} = 0",
                },
                {
                    "action": "update",
                    "set": {
                        **{
                            out: f"CAST(t.{out} + s.{out} AS {SUM_TYPE})"
                            for out in measures
                        },
                        COUNT_COL: f"t.{COUNT_COL} + s.{COUNT_COL}",
                    },
                },
            ],
            when_not_matched=[
                {
                    "action": "insert",
                    "condition": f"s.{COUNT_COL} > 0",
                    "values": {
                        **{c: f"s.{c}" for c in group_cols},
                        **{out: f"s.{out}" for out in measures},
                        COUNT_COL: f"s.{COUNT_COL}",
                    },
                }
            ],
        )
        mode = "incremental"

    meta = dst.meta
    meta.setdefault("properties", {})["ivm_src_snapshot"] = cur
    dst._write_meta(meta)
    return {"refreshed": True, "mode": mode, "src_snapshot": cur}
