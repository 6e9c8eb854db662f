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


def mor_partition_debt(table: SnapTable) -> dict:
    """Attribute the current snapshot's deferred-delete debt to partition
    leaves from the delete files' write-time sidecars — metadata only, no
    scan. Returns::

        {"attributed": bool,          # every delete file carries a sidecar
         "leaves": {suffix: keys},    # debt per partition-leaf suffix
         "debt_row_share": float}     # physical-row share of debt leaves

    ``debt_row_share`` is the fraction of the table's PHYSICAL rows living
    in partitions that carry any debt (parquet footer counts, O(files)) —
    the dial that decides whether a partition-scoped rewrite is cheaper
    than a full compact. ``attributed=False`` (a delete file predates the
    sidecar) forces the caller onto the full-compact path: unknown
    attribution must never scope a rewrite."""
    import json
    from pathlib import Path

    snap = table.current_snapshot()
    if snap is None:
        return {"attributed": True, "leaves": {}, "debt_row_share": 0.0}
    leaves: dict[str, int] = {}
    attributed = True
    for dd in snap.get("delete_dirs") or []:
        sidecar = table.data_dir / dd / table._DEBT_SIDECAR
        if not sidecar.exists():
            attributed = False
            continue
        for leaf, n in json.loads(sidecar.read_text()).items():
            leaves[leaf] = leaves.get(leaf, 0) + n
    if not leaves:
        return {"attributed": attributed, "leaves": {}, "debt_row_share": 0.0}
    dir_epochs = table._dir_epochs()
    total_rows = 0
    debt_rows = 0
    debt_suffixes = list(leaves)
    for d in snap["data_dirs"]:
        epoch = dir_epochs.get(d)
        spec = epoch.get("partition_spec") if epoch is not None else None
        for leaf in table._leaf_dirs([table.data_dir / d], [], spec):
            files = sorted(Path(leaf).rglob("*.parquet"))
            n = _footer_row_count(files) if files else 0
            total_rows += n
            suffix = table._leaf_suffix(d, leaf)
            if any(table._suffixes_intersect(suffix, s) for s in debt_suffixes):
                debt_rows += n
    share = debt_rows / total_rows if total_rows else 1.0
    return {"attributed": attributed, "leaves": leaves, "debt_row_share": share}


def maintain_mor(
    spark: SparkSession,
    table: SnapTable,
    max_delete_files: int | None = None,
    max_delete_ratio: float | None = None,
    partition_scope_max_share: float | None = None,
) -> dict:
    """Two-tier MoR maintenance, the Iceberg/Hudi compactor split:

    - deferred-KEY ratio over ``max_delete_ratio`` → materialize the
      deletes. When the sidecar attribution shows the debt concentrated
      in partitions holding at most ``partition_scope_max_share`` of the
      table's physical rows, that is a PARTITION-SCOPED
      :meth:`~..tables.snapstore.SnapTable.compact` — O(hot partitions),
      the Iceberg ``rewrite_data_files(filter)`` maintenance shape —
      falling back to the full O(table) compact only if the scoped
      rewrite could not restore a healthy ratio (keys matching no
      attributed partition) or attribution is unavailable;
    - delete-FILE count over ``max_delete_files`` with the ratio still
      healthy → :meth:`~..tables.snapstore.SnapTable.rewrite_delete_files`
      (merge the files; O(delete keys)); falls through to a full compact
      only if merging could not get back under the file bound (heavily
      interleaved appends);
    - neither → metadata-only no-op.

    Returns the audit plus ``{"action": "none"|"rewrite_deletes"|
    "compact", "compacted": bool}`` (+ the commit's snapshot id when one
    happened) — idempotent and safe on a fresh or delete-free table.

    Thresholds resolve template-first (the reference's single-source-of-
    truth philosophy): an explicit argument wins, else the table
    template's ``maintenance_max_delete_files`` /
    ``maintenance_max_delete_ratio`` /
    ``maintenance_partition_scope_max_share`` properties, else the
    measured sweep defaults (16 files / 5% / 50% share).
    """
    props = table.meta.get("properties", {})
    if max_delete_files is None:
        max_delete_files = int(props.get("maintenance_max_delete_files", 16))
    if max_delete_ratio is None:
        max_delete_ratio = float(props.get("maintenance_max_delete_ratio", 0.05))
    if partition_scope_max_share is None:
        partition_scope_max_share = float(
            props.get("maintenance_partition_scope_max_share", 0.5)
        )
    audit = mor_read_amplification(table)
    if audit["delete_files"] == 0:
        return {**audit, "compacted": False, "action": "none"}
    if audit["ratio"] >= max_delete_ratio:
        prof = mor_partition_debt(table)
        if (
            prof["attributed"]
            and prof["leaves"]
            and prof["debt_row_share"] <= partition_scope_max_share
        ):
            entry = table.compact(
                spark, partition_leaves=sorted(prof["leaves"])
            )
            after = mor_read_amplification(table)
            if after["ratio"] < max_delete_ratio:
                return {**audit, "compacted": True,
                        "action": "compact_partitions",
                        "debt_row_share": prof["debt_row_share"],
                        "ratio_after": after["ratio"],
                        "snapshot_id": entry["snapshot_id"]}
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
