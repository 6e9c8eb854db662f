"""Snapshot-log tables: Iceberg-semantics storage on plain parquet.

The local environment has no Iceberg runtime jar, so the engine ships its
own minimal table format with the reference's metadata semantics
(SURVEY §2.10 M1-M3, §2.1 S6-S10):

- **atomic commits**: data files are written to a fresh directory, then a
  tiny JSON log entry is committed via atomic rename — readers see the old
  or the new snapshot, never a partial write (the same
  pointer-swap consistency the reference gets from Iceberg,
  ``docs/deep-dive.md:66-69``). Optimistic concurrency: a sequence-number
  collision retries with backoff (``commit_num_retries`` parity,
  ``_schema.json:109-111``);
- **snapshot listing** (M1): every commit records snapshot_id, sequence,
  committed_at, operation, row/file counts — queryable as a DataFrame,
  mirroring Athena's ``"t$snapshots"`` named query
  (``aws/modules/athena/main.tf:56-61``);
- **time-travel reads** (M2): by snapshot id or as-of timestamp
  (``FOR SYSTEM_VERSION AS OF`` / ``FOR SYSTEM_TIME AS OF``,
  ``aws/modules/athena/main.tf:62-65``);
- **snapshot expiration** (M3): ``expire_snapshots`` honors
  ``history_expire_max_snapshot_age_ms`` from the template and deletes
  unreferenced data directories (``expire_snapshots`` +
  ``remove_orphan_files`` in one);
- **full-refresh overwrite + append** (S7): ``overwrite`` replaces table
  contents atomically (the reference's only write mode); ``append`` adds a
  directory to the visible set (the event-stream pattern);
- **missing-table error mapping** (S9): actionable error naming the fix.

Scale design: all data stays in parquet directories read/written by Spark
executors — the only driver-side work is one JSON file per commit (exactly
Iceberg's design point: metadata ops are O(snapshots), data ops are
distributed). On an object store the atomic rename becomes a
conditional-put; swapping the commit primitive is one function.

On a cluster with the Iceberg runtime, all of this is replaced by
``df.writeTo(...)`` / ``VERSION AS OF`` / ``CALL system.expire_snapshots``
against the catalogs configured in ``catalog_conf.py``.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from iceberg_quickstart_iac_spark.governance.audit import log_audit_event


class TableNotFoundError(RuntimeError):
    pass


class CommitConflictError(RuntimeError):
    pass


def _now_ms() -> int:
    return int(time.time() * 1000)


class SnapTable:
    """One snapshot-log table rooted at ``root`` (…/namespace/name)."""

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.log_dir = self.root / "_log"
        self.data_dir = self.root / "data"

    # -- lifecycle ---------------------------------------------------------

    @classmethod
    def create(
        cls,
        root: str | Path,
        template: dict | None = None,
        properties: dict | None = None,
    ) -> SnapTable:
        table = cls(root)
        table.log_dir.mkdir(parents=True, exist_ok=True)
        table.data_dir.mkdir(parents=True, exist_ok=True)
        meta = {
            "name": (template or {}).get("name", table.root.name),
            "namespace": (template or {}).get("namespace", "default"),
            "columns": (template or {}).get("columns", []),
            "properties": {**((template or {}).get("properties") or {}), **(properties or {})},
        }
        (table.root / "table.json").write_text(json.dumps(meta, indent=2))
        return table

    @classmethod
    def load(cls, root: str | Path) -> SnapTable:
        table = cls(root)
        if not (table.root / "table.json").exists():
            raise TableNotFoundError(
                f"Table not found at '{root}'. Create it first with "
                "SnapTable.create(root, template) (the reference's "
                "equivalent: run `terraform apply`)."
            )
        return table

    @property
    def meta(self) -> dict:
        return json.loads((self.root / "table.json").read_text())

    @property
    def fq_name(self) -> str:
        meta = self.meta
        return f"{meta['namespace']}.{meta['name']}"

    # -- log ---------------------------------------------------------------

    def _entries(self) -> list[dict]:
        entries = []
        for path in sorted(self.log_dir.glob("*.json")):
            entries.append(json.loads(path.read_text()))
        return entries

    def current_snapshot(self) -> dict | None:
        entries = self._entries()
        return entries[-1] if entries else None

    def _commit(self, build_entry, retries: int | None = None) -> dict:
        """Atomic commit: write temp file, link into the next sequence slot.

        ``build_entry(entries)`` produces the operation fields from the
        *latest* log state — recomputed on every attempt so a losing racer
        re-bases on the winner's snapshot (no lost updates). The slot is
        claimed with ``os.link`` (fails with EEXIST if another writer won) —
        optimistic concurrency with bounded retry
        (``commit_num_retries`` parity).
        """
        if retries is None:
            retries = int(self.meta.get("properties", {}).get("commit_num_retries", 3))
        tmp = self.log_dir / f".tmp-{uuid.uuid4().hex}.json"
        for attempt in range(retries + 1):
            entries = self._entries()
            seq = entries[-1]["sequence"] + 1 if entries else 0
            parent = entries[-1]["snapshot_id"] if entries else None
            full = {
                **build_entry(entries),
                "sequence": seq,
                "snapshot_id": uuid.uuid4().hex[:16],
                "parent_id": parent,
                "committed_at_ms": _now_ms(),
            }
            tmp.write_text(json.dumps(full))
            target = self.log_dir / f"{seq:012d}.json"
            try:
                os.link(tmp, target)
                tmp.unlink()
                return full
            except FileExistsError:
                if attempt == retries:
                    tmp.unlink(missing_ok=True)
                    raise CommitConflictError(
                        f"Commit to {self.fq_name} lost {retries + 1} races (sequence {seq})"
                    ) from None
                time.sleep(min(0.05 * 2**attempt, 1.0) * (1 + random.random()))
        raise AssertionError("unreachable")

    # -- writes ------------------------------------------------------------

    def _write_data(self, df: DataFrame) -> tuple[str, int, int]:
        dir_name = uuid.uuid4().hex
        out = self.data_dir / dir_name
        df.write.parquet(str(out))
        n_files = len(list(out.glob("*.parquet")))
        return dir_name, df.count(), n_files

    def _check_columns(self, df: DataFrame) -> None:
        declared = [c["name"] for c in self.meta.get("columns", [])]
        if declared and set(df.columns) != set(declared):
            raise ValueError(
                f"Schema mismatch on write to {self.fq_name}. "
                f"Table columns: {sorted(declared)}, Data columns: {sorted(df.columns)}"
            )

    def overwrite(self, df: DataFrame) -> dict:
        """Atomic full-refresh replace (the reference's write model,
        ``resources/iceberg.py:78``, ``docs/bring-your-own-data.md:220-224``)."""
        self._check_columns(df)
        dir_name, rows, files = self._write_data(df)
        entry = self._commit(
            lambda entries: {
                "operation": "overwrite",
                "data_dirs": [dir_name],
                "row_count": rows,
                "file_count": files,
            }
        )
        log_audit_event("table_write", self.fq_name, details={"row_count": rows, "mode": "overwrite"})
        return entry

    def append(self, df: DataFrame) -> dict:
        """Append commit (the event-stream pattern, ``event_stream.yaml:4``)."""
        self._check_columns(df)
        dir_name, rows, files = self._write_data(df)

        def build(entries: list[dict]) -> dict:
            current = entries[-1] if entries else None
            dirs = (current["data_dirs"] if current else []) + [dir_name]
            prev_rows = current["row_count"] if current else 0
            prev_files = current["file_count"] if current else 0
            return {
                "operation": "append",
                "data_dirs": dirs,
                # cumulative like row_count — Iceberg snapshot summaries track
                # TOTAL files in the snapshot, not just the new manifest's
                "row_count": prev_rows + rows,
                "file_count": prev_files + files,
            }

        entry = self._commit(build)
        log_audit_event("table_write", self.fq_name, details={"row_count": rows, "mode": "append"})
        return entry

    # -- reads -------------------------------------------------------------

    def _snapshot_for(self, snapshot_id: str | None, as_of_ms: int | None) -> dict:
        entries = self._entries()
        if not entries:
            raise TableNotFoundError(f"Table {self.fq_name} has no snapshots yet")
        if snapshot_id is not None:
            for e in entries:
                if e["snapshot_id"] == snapshot_id:
                    return e
            raise ValueError(f"No snapshot {snapshot_id!r} in {self.fq_name}")
        if as_of_ms is not None:
            eligible = [e for e in entries if e["committed_at_ms"] <= as_of_ms]
            if not eligible:
                raise ValueError(f"No snapshot at or before {as_of_ms} in {self.fq_name}")
            return eligible[-1]
        return entries[-1]

    def read(
        self,
        spark: SparkSession,
        snapshot_id: str | None = None,
        as_of_ms: int | None = None,
    ) -> DataFrame:
        """Read the table — current state, or time-travel by id/timestamp.

        After a schema evolution (:meth:`evolve_add_column`), directories
        written before the evolution lack the new columns; ``mergeSchema``
        unions the file schemas and the declared-schema projection fills
        the gaps with typed NULLs — Iceberg's read-time schema resolution.
        """
        snap = self._snapshot_for(snapshot_id, as_of_ms)
        paths = [str(self.data_dir / d) for d in snap["data_dirs"]]
        log_audit_event(
            "table_read", self.fq_name, details={"snapshot_id": snap["snapshot_id"]}
        )
        if not paths:
            raise ValueError(f"Snapshot {snap['snapshot_id']} has no data")
        df = spark.read.option("mergeSchema", "true").parquet(*paths)
        declared = self.meta.get("columns", [])
        if declared and set(c["name"] for c in declared) != set(df.columns):
            from pyspark.sql import functions as F

            from iceberg_quickstart_iac_spark.templates.loader import (
                iceberg_type_to_spark,
            )

            df = df.select(
                *[
                    F.col(c["name"])
                    if c["name"] in df.columns
                    else F.lit(None).cast(iceberg_type_to_spark(c["type"])).alias(c["name"])
                    for c in declared
                ]
            )
        return df

    def snapshots(self, spark: SparkSession) -> DataFrame:
        """The snapshot-metadata table (M1), like Iceberg's ``t.snapshots``."""
        entries = self._entries()
        return spark.createDataFrame(
            [
                (
                    e["snapshot_id"],
                    e["parent_id"],
                    e["sequence"],
                    e["committed_at_ms"],
                    e["operation"],
                    e["row_count"],
                    len(e["data_dirs"]),
                )
                for e in entries
            ],
            "snapshot_id STRING, parent_id STRING, sequence LONG, committed_at_ms LONG, "
            "operation STRING, row_count LONG, data_dir_count INT",
        )

    # -- schema evolution --------------------------------------------------

    def evolve_add_column(self, name: str, col_type: str, doc: str = "") -> dict:
        """ADD COLUMN (Iceberg schema evolution, the capability the
        reference advertises via the table format, ``docs/architecture.md:
        8-11`` / ``docs/deep-dive.md:66-72``, but never implements).

        Metadata-only: no data files are rewritten. Existing snapshots stay
        readable — :meth:`read` resolves the new column to typed NULLs for
        pre-evolution files — and subsequent writes must carry the column
        (the write-side schema check enforces it).
        """
        meta = self.meta
        cols = meta.get("columns", [])
        if any(c["name"] == name for c in cols):
            raise ValueError(f"Column {name!r} already exists on {self.fq_name}")
        cols.append({"name": name, "type": col_type, "doc": doc})
        meta["columns"] = cols
        (self.root / "table.json").write_text(json.dumps(meta, indent=2))
        log_audit_event(
            "schema_evolution",
            self.fq_name,
            details={"change": "add_column", "column": name, "type": col_type},
        )
        return meta

    def evolve_drop_column(self, name: str) -> dict:
        """DROP COLUMN — metadata-only, like Iceberg: data files keep the
        bytes, reads project the declared schema so the column vanishes,
        and the write-side check stops accepting it."""
        meta = self.meta
        cols = meta.get("columns", [])
        if not any(c["name"] == name for c in cols):
            raise ValueError(f"Column {name!r} does not exist on {self.fq_name}")
        meta["columns"] = [c for c in cols if c["name"] != name]
        (self.root / "table.json").write_text(json.dumps(meta, indent=2))
        log_audit_event(
            "schema_evolution",
            self.fq_name,
            details={"change": "drop_column", "column": name},
        )
        return meta

    # -- incremental reads -------------------------------------------------

    def read_incremental(self, spark: SparkSession, from_snapshot_id: str) -> DataFrame:
        """Rows appended AFTER ``from_snapshot_id`` (Iceberg's incremental
        append scan — the consumer side of CDC-style pipelines: checkpoint a
        snapshot id, read only what arrived since).

        Valid only across an append-only chain: an overwrite or compact
        rewrites the visible set, so "new rows" is no longer the directory
        delta — those chains raise and the caller falls back to a full read.
        """
        entries = self._entries()
        ids = [e["snapshot_id"] for e in entries]
        if from_snapshot_id not in ids:
            raise ValueError(f"No snapshot {from_snapshot_id!r} in {self.fq_name}")
        start = ids.index(from_snapshot_id)
        newer = entries[start + 1 :]
        if not newer:
            return self.read(spark).limit(0)
        non_append = [e["operation"] for e in newer if e["operation"] != "append"]
        if non_append:
            raise ValueError(
                f"Incremental read invalid across {non_append} snapshots on "
                f"{self.fq_name}; re-baseline with a full read"
            )
        base_dirs = set(entries[start]["data_dirs"])
        new_dirs = [d for d in newer[-1]["data_dirs"] if d not in base_dirs]
        log_audit_event(
            "table_read",
            self.fq_name,
            details={"incremental_from": from_snapshot_id, "new_dirs": len(new_dirs)},
        )
        if not new_dirs:
            return self.read(spark).limit(0)
        return spark.read.option("mergeSchema", "true").parquet(
            *[str(self.data_dir / d) for d in new_dirs]
        )

    # -- maintenance -------------------------------------------------------

    def compact(self, spark: SparkSession, target_files: int | None = None) -> dict:
        """Rewrite the current snapshot's data into fewer files — the
        ``rewrite_data_files`` analog (SURVEY §4; Iceberg calls this
        compaction). Many small append commits → one coalesced directory;
        history before the compaction snapshot remains time-travelable
        until expired.
        """
        current = self.current_snapshot()
        if current is None:
            raise TableNotFoundError(f"Table {self.fq_name} has no snapshots yet")
        df = self.read(spark)
        if target_files is not None:
            df = df.coalesce(target_files)
        dir_name = uuid.uuid4().hex
        df.write.parquet(str(self.data_dir / dir_name))
        files = len(list((self.data_dir / dir_name).glob("*.parquet")))
        entry = self._commit(
            lambda entries: {
                "operation": "compact",
                "data_dirs": [dir_name],
                "row_count": current["row_count"],
                "file_count": files,
            }
        )
        log_audit_event(
            "table_write", self.fq_name, details={"mode": "compact", "file_count": files}
        )
        return entry


    def expire_snapshots(self, older_than_ms: int | None = None, max_age_ms: int | None = None) -> int:
        """Drop snapshots past the retention window; delete orphaned data.

        ``max_age_ms`` defaults to the template's
        ``history_expire_max_snapshot_age_ms``. The current snapshot always
        survives. Returns the number of snapshots removed.
        """
        if older_than_ms is None:
            if max_age_ms is None:
                max_age_ms = int(
                    self.meta.get("properties", {}).get(
                        "history_expire_max_snapshot_age_ms", 7 * 86400 * 1000
                    )
                )
            older_than_ms = _now_ms() - max_age_ms

        entries = self._entries()
        if not entries:
            return 0
        keep = [e for e in entries if e["committed_at_ms"] > older_than_ms]
        if not keep or keep[-1]["sequence"] != entries[-1]["sequence"]:
            keep = keep + [entries[-1]] if entries[-1] not in keep else keep
        drop = [e for e in entries if e not in keep]

        referenced = {d for e in keep for d in e["data_dirs"]}
        for e in drop:
            (self.log_dir / f"{e['sequence']:012d}.json").unlink(missing_ok=True)
        for child in self.data_dir.iterdir():
            if child.is_dir() and child.name not in referenced:
                shutil.rmtree(child)
        return len(drop)
