"""MoR maintenance policy: compact when read amplification crosses a
threshold (SURVEY §2.10 maintenance composition).

Merge-on-read keeps writes O(changes) by deferring delete application to
read time; the price is one extra anti-join input per accumulated delete
file. The measured slope (PERFORMANCE.md, morread sweep) is mild in file
COUNT but linear in total deferred KEYS, so the policy bounds both:

- ``max_delete_files`` — the per-read planning/scan overhead knob (each
  delete file is one more tiny scan grouped into the anti-join);
- ``max_delete_ratio`` — deferred keys / live rows, the knob that bounds
  the anti-join's build side relative to the table.

This is the same dial Iceberg exposes as
``rewrite_data_files``/``rewrite_position_delete_files`` maintenance jobs
and Hudi runs as the compactor; the reference's operations runbook
schedules maintenance the same way (``docs/operations-runbook.md``). Run
it from the monitor loop (:mod:`..governance.drift`) or after a CDC
ingest cycle (:func:`..streaming.ingest.incremental_cdc_ingest`'s
documented cadence).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from iceberg_quickstart_iac_spark.tables.snapstore import SnapTable, _footer_row_count


def mor_read_amplification(table: SnapTable) -> dict:
    """Metadata-only audit of the current snapshot's deferred-delete
    debt: delete-file count, total deferred keys, and the keys/rows
    ratio. O(delete files) footer reads, no data scan."""
    snap = table.current_snapshot()
    if snap is None:
        return {"delete_files": 0, "deferred_keys": 0, "ratio": 0.0}
    ddirs = snap.get("delete_dirs") or []
    keys = 0
    for d in ddirs:
        base = table.data_dir / d
        if base.is_dir():
            keys += _footer_row_count(sorted(base.rglob("*.parquet")))
    rows = max(int(snap.get("row_count") or 0), 1)
    return {
        "delete_files": len(ddirs),
        "deferred_keys": keys,
        "ratio": keys / rows,
    }


def maintain_mor(
    spark: SparkSession,
    table: SnapTable,
    max_delete_files: int = 16,
    max_delete_ratio: float = 0.05,
) -> dict:
    """Two-tier MoR maintenance, the Iceberg/Hudi compactor split:

    - deferred-KEY ratio over ``max_delete_ratio`` → full
      :meth:`~..tables.snapstore.SnapTable.compact` (materialize the
      deletes; O(table) — the only way to shrink the anti-join);
    - delete-FILE count over ``max_delete_files`` with the ratio still
      healthy → :meth:`~..tables.snapstore.SnapTable.rewrite_delete_files`
      (merge the files; O(delete keys)); falls through to a full compact
      only if merging could not get back under the file bound (heavily
      interleaved appends);
    - neither → metadata-only no-op.

    Returns the audit plus ``{"action": "none"|"rewrite_deletes"|
    "compact", "compacted": bool}`` (+ the commit's snapshot id when one
    happened) — idempotent and safe on a fresh or delete-free table.
    """
    audit = mor_read_amplification(table)
    if audit["delete_files"] == 0:
        return {**audit, "compacted": False, "action": "none"}
    if audit["ratio"] >= max_delete_ratio:
        entry = table.compact(spark)
        return {**audit, "compacted": True, "action": "compact",
                "snapshot_id": entry["snapshot_id"]}
    if audit["delete_files"] >= max_delete_files:
        entry = table.rewrite_delete_files(spark)
        after = mor_read_amplification(table)
        if after["delete_files"] >= max_delete_files:
            entry = table.compact(spark)
            return {**audit, "compacted": True, "action": "compact",
                    "snapshot_id": entry["snapshot_id"]}
        return {**audit, "compacted": False, "action": "rewrite_deletes",
                "delete_files_after": after["delete_files"],
                "snapshot_id": entry["snapshot_id"]}
    return {**audit, "compacted": False, "action": "none"}
