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
import re
import shutil
import struct
import time
import uuid
from pathlib import Path
from urllib.parse import quote, unquote

from datetime import date, datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from iceberg_quickstart_iac_spark.governance.audit import log_audit_event


class TableNotFoundError(RuntimeError):
    pass


class CommitConflictError(RuntimeError):
    pass


def _now_ms() -> int:
    return int(time.time() * 1000)


# -- hidden partitioning -----------------------------------------------------
#
# The reference's headline table optimization is transform partitioning:
# a query filtering on the SOURCE column reads only matching partition
# folders (docs/table-template-reference.md:133-168 — "only reads files in
# the hour=10 folder"; table-templates/event_stream.yaml:44-48 declares
# [day(ts), hour(ts)]). Here the template's partition_spec drives the
# physical parquet layout: writes derive one directory level per spec entry
# (Iceberg's human-readable path convention, e.g. ts_day=2024-01-02/
# ts_hour=2024-01-02-10), and reads prune directories driver-side from
# simple predicates on the source column — the same metadata-only pruning
# Iceberg does with manifest entries, so a day-filtered read of a year of
# events lists and scans ~1/365th of the files. Directory listing is
# O(partitions), driver-side, exactly the role Iceberg gives manifests.

#: partition transforms usable for ORDER comparisons after rendering
#: (rendered form is chronologically/numerically ordered)
_ORDERED_TRANSFORMS = {"identity", "year", "month", "day", "hour"}


def partition_field_name(column: str, transform: str) -> str:
    """Iceberg-style partition field name: ``ts`` + ``day`` → ``ts_day``."""
    if transform == "identity":
        return column
    base = transform.split("[")[0]
    return f"{column}_{base}"


def _partition_expr(column: str, transform: str):
    """The Spark column rendering one spec entry as its partition value.

    Time transforms render as sortable strings matching Iceberg's partition
    path convention (day → yyyy-MM-dd, hour → yyyy-MM-dd-HH) so pruning can
    compare them lexicographically; bucket/truncate delegate to the
    spec-exact scalar transforms.
    """
    from pyspark.sql import functions as F

    from iceberg_quickstart_iac_spark.functions.transforms import (
        iceberg_bucket,
        iceberg_truncate,
    )

    c = F.col(column)
    if transform == "identity":
        return c.cast("string")
    if transform == "year":
        return F.year(c).cast("string")
    if transform == "month":
        return F.date_format(c, "yyyy-MM")
    if transform == "day":
        return F.date_format(c, "yyyy-MM-dd")
    if transform == "hour":
        return F.date_format(c, "yyyy-MM-dd-HH")
    m = re.match(r"^bucket\[(\d+)\]$", transform)
    if m:
        return iceberg_bucket(c, int(m.group(1)), "long").cast("string")
    m = re.match(r"^truncate\[(\d+)\]$", transform)
    if m:
        return iceberg_truncate(c, int(m.group(1)), "string")
    raise ValueError(f"Unknown partition transform: {transform!r}")


def _coerce_ts(value) -> datetime:
    if isinstance(value, datetime):
        return value
    if isinstance(value, date):
        return datetime(value.year, value.month, value.day)
    if isinstance(value, (int, float)):
        return datetime.fromtimestamp(value, tz=timezone.utc).replace(tzinfo=None)
    return datetime.fromisoformat(str(value))


def transform_value(value, transform: str) -> str:
    """Driver-side twin of :func:`_partition_expr` for PREDICATE bounds:
    renders a filter value into the partition-value domain so directory
    names can be compared against it without touching any data."""
    if transform == "identity":
        return str(value)
    ts = _coerce_ts(value)
    if transform == "year":
        return str(ts.year)
    if transform == "month":
        return ts.strftime("%Y-%m")
    if transform == "day":
        return ts.strftime("%Y-%m-%d")
    if transform == "hour":
        return ts.strftime("%Y-%m-%d-%H")
    raise ValueError(f"No driver-side rendering for transform {transform!r}")


def _transform_bound(value, transform: str) -> str | None:
    """Render a predicate bound into the partition-value domain, or None
    when the transform has no driver-side ordered rendering (bucket)."""
    m = re.match(r"^truncate\[(\d+)\]$", transform)
    if m:
        w = int(m.group(1))
        if isinstance(value, str):
            return value[:w]
        v = int(value)
        return str(v - (((v % w) + w) % w))
    try:
        return transform_value(value, transform)
    except ValueError:
        return None


def _bucket_of(value, transform: str) -> str | None:
    """Driver-side spec-exact bucket value for equality pruning."""
    from iceberg_quickstart_iac_spark.functions.transforms import _murmur3_32_bytes

    m = re.match(r"^bucket\[(\d+)\]$", transform)
    if not m:
        return None
    n = int(m.group(1))
    if isinstance(value, str):
        raw = value.encode("utf-8")
    else:
        raw = struct.pack("<q", int(value))
    return str((_murmur3_32_bytes(raw) & 0x7FFFFFFF) % n)


def _at_partition_floor(value, transform: str) -> bool:
    """True when a predicate bound sits EXACTLY on the lower boundary of its
    partition — then a strict ``<`` may exclude the boundary partition
    entirely (the half-open time-range idiom: ``ts < '2024-01-12'`` must not
    scan the 2024-01-12 folder)."""
    try:
        ts = _coerce_ts(value)
    except (ValueError, TypeError):
        return False
    zero_time = ts.hour == ts.minute == ts.second == ts.microsecond == 0
    if transform == "hour":
        return ts.minute == ts.second == ts.microsecond == 0
    if transform == "day":
        return zero_time
    if transform == "month":
        return ts.day == 1 and zero_time
    if transform == "year":
        return ts.month == 1 and ts.day == 1 and zero_time
    return False


def _cmp_vals(a: str, b: str) -> int:
    """Numeric-aware comparison of two rendered partition values."""
    try:
        fa, fb = float(a), float(b)
        return (fa > fb) - (fa < fb)
    except ValueError:
        return (a > b) - (a < b)


def _declared_spark_type(type_str: str):
    """Snapstore's declared-type resolution: ``decimal(p,s)`` is a real
    Iceberg primitive and the engine maintains exact decimal columns
    (e.g. IVM rollup sums), so it maps to DecimalType here — while the
    TEMPLATE loader keeps the reference's decimal→string demotion
    (pinned parity, ``templates/loader.py``). Everything else delegates
    to the loader mapping."""
    from pyspark.sql import types as T

    from iceberg_quickstart_iac_spark.templates.loader import iceberg_type_to_spark

    m = re.match(r"^decimal\((\d+)\s*,\s*(\d+)\)$", type_str.strip().lower())
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    # Iceberg list type (`list<int>`; `array<int>` accepted as an alias):
    # needed for real columns like embeddings and PQ code arrays — the
    # loader's unknown→string demotion would destroy them on projection
    m = re.match(r"^(?:list|array)<(.+)>$", type_str.strip().lower())
    if m:
        return T.ArrayType(_declared_spark_type(m.group(1)))
    return iceberg_type_to_spark(type_str)


def _normalize_merge_clauses(
    declared: list[str],
    when_matched: list[dict],
    when_not_matched: list[dict],
    when_not_matched_by_source: list[dict],
) -> tuple[list[dict], list[dict], list[dict]]:
    """Validate/expand MERGE clause dicts (shared by the local executor
    :meth:`SnapTable.merge_into` and the real-warehouse SQL renderer
    :meth:`SnapTable.merge_into_sql`). ``"*"`` shorthands expand against
    the declared columns; unknown columns and malformed actions raise."""

    def _norm(clause: dict, allowed: tuple, kind: str) -> dict:
        action = clause.get("action")
        if action not in allowed:
            raise ValueError(
                f"merge_into: {kind} clause action must be one of "
                f"{allowed}, got {action!r}"
            )
        exprs = clause.get("set" if action == "update" else "values")
        if action in ("update", "insert"):
            if exprs == "*":
                exprs = {c: f"s.{c}" for c in declared}
            if not isinstance(exprs, dict) or not exprs:
                raise ValueError(
                    f"merge_into: {kind} {action} clause needs a non-empty "
                    "'set'/'values' dict (or '*')"
                )
            unknown = set(exprs) - set(declared)
            if unknown:
                raise ValueError(
                    f"merge_into: unknown columns {sorted(unknown)}"
                )
        else:
            exprs = {}
        return {
            "action": action,
            "condition": clause.get("condition"),
            "exprs": exprs,
        }

    matched = [_norm(c, ("update", "delete"), "matched") for c in when_matched]
    not_matched = [_norm(c, ("insert",), "not-matched") for c in when_not_matched]
    by_source = [
        _norm(c, ("update", "delete"), "not-matched-by-source")
        for c in when_not_matched_by_source
    ]
    return matched, not_matched, by_source


def _footer_row_count(files: list[Path]) -> int:
    """Sum of file footer row counts (parquet or ORC, by extension) —
    metadata-only, no data read."""
    total = 0
    for f in files:
        if f.suffix == ".orc":
            import pyarrow.orc as po

            total += po.ORCFile(str(f)).nrows
        else:
            import pyarrow.parquet as pq

            total += pq.ParquetFile(str(f)).metadata.num_rows
    return total


#: tables already warned about the ORC no-file-skipping gap (once per
#: table per process — the warning is a configuration signal, not a
#: per-read nag)
_ORC_SKIP_WARNED: set[Path] = set()

#: follow-head SQL registrations: table root -> {view name: registration
#: spec}. ``_commit`` re-resolves these after every successful commit, so a
#: ``spark.sql`` statement against the view always reads the table's current
#: committed state — Athena's contract (a query never pins a snapshot;
#: ``aws/modules/athena/main.tf:26-67``). Process-local by design: Spark
#: temp views are session objects, and the registry's job is only to keep
#: them in step with commits made IN this process.
_HEAD_REGISTRATIONS: dict[str, dict[str, dict]] = {}


def _head_reg_key(root: Path) -> str:
    """Registry key for a table root: resolved, so two SnapTable handles
    opened through different path spellings (relative vs absolute, via a
    symlinked warehouse) refresh each other's registrations."""
    try:
        return str(Path(root).resolve())
    except OSError:
        return str(root)


def _footer_stats_match(f: Path, filters: list[tuple]) -> bool:
    """Can any row group of parquet file ``f`` satisfy every conjunct in
    ``filters``? Footer statistics only — no data read. Conservative:
    missing/unreadable/incomparable stats answer True (keep the file);
    only a provably-disjoint range skips it."""
    import pyarrow.parquet as pq

    try:
        md = pq.ParquetFile(str(f)).metadata
    except Exception:
        return True
    for rg in range(md.num_row_groups):
        group = md.row_group(rg)
        stats: dict[str, tuple] = {}
        for ci in range(group.num_columns):
            col = group.column(ci)
            st = col.statistics
            if st is not None and st.has_min_max:
                stats[col.path_in_schema] = (st.min, st.max)
        if _range_matches(stats, filters):
            return True  # one viable row group keeps the whole file
    return md.num_row_groups == 0


def _footer_bounds(f: Path) -> dict[str, list]:
    """File-level ``{column: [min, max]}`` from parquet footer statistics
    (merged across row groups); ``{}`` for ORC or unreadable footers."""
    if f.suffix != ".parquet":
        return {}
    import pyarrow.parquet as pq

    try:
        md = pq.ParquetFile(str(f)).metadata
    except Exception:
        return {}
    out: dict[str, list] = {}
    for rg in range(md.num_row_groups):
        group = md.row_group(rg)
        for ci in range(group.num_columns):
            st = group.column(ci).statistics
            if st is None or not st.has_min_max:
                continue
            name = group.column(ci).path_in_schema
            if name in out:
                try:
                    out[name] = [min(out[name][0], st.min), max(out[name][1], st.max)]
                except TypeError:
                    out.pop(name, None)
            else:
                out[name] = [st.min, st.max]
    return out


def _range_matches(stats: dict[str, tuple], filters: list[tuple]) -> bool:
    for col, op, bound in filters:
        if col not in stats:
            continue
        mn, mx = stats[col]
        if mn is None or mx is None:
            continue
        try:
            if op == "=":
                ok = mn <= bound <= mx
            elif op == ">=":
                ok = mx >= bound
            elif op == ">":
                ok = mx > bound
            elif op == "<=":
                ok = mn <= bound
            elif op == "<":
                ok = mn < bound
            elif op == "in":
                ok = any(mn <= b <= mx for b in bound)
            else:
                continue
        except TypeError:
            continue  # stats/bound types don't compare — keep the file
        if not ok:
            return False
    return True


def _list_data_files(base: Path) -> list[Path]:
    """Every data file under ``base``, whichever columnar format the dir
    was written in (`write_format: parquet|orc`)."""
    return sorted(list(base.rglob("*.parquet")) + list(base.rglob("*.orc")))


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
        # Iceberg-style field ids: every column gets a table-unique id at
        # declaration time; a dropped-then-re-added name is a NEW id, so old
        # data files never leak pre-drop values into the re-added column.
        columns = [dict(c) for c in (template or {}).get("columns", [])]
        for i, c in enumerate(columns):
            c.setdefault("id", i + 1)
        meta = {
            "name": (template or {}).get("name", table.root.name),
            "namespace": (template or {}).get("namespace", "default"),
            "columns": columns,
            "next_field_id": len(columns) + 1,
            "partition_spec": (template or {}).get("partition_spec", []) or [],
            "sort_order": (template or {}).get("sort_order", []) or [],
            # Iceberg identifier-field-ids analog: the row-key columns
            # merge-on-read equality deletes are keyed on
            "identifier_fields": (template or {}).get("identifier_fields", []) or [],
            "properties": {**((template or {}).get("properties") or {}), **(properties or {})},
        }
        # partition/sort columns must exist in the declared schema —
        # Iceberg rejects an unknown source column at DDL time; accepting
        # it silently would declare a spec the writer then silently
        # ignores (data lands unpartitioned while metadata claims a spec)
        declared = {c["name"] for c in columns}
        for kind in ("partition_spec", "sort_order"):
            for entry in meta[kind]:
                col = entry["column"] if isinstance(entry, dict) else entry
                if col not in declared:
                    raise ValueError(
                        f"{kind} references column {col!r}, which is not "
                        f"in the declared schema {sorted(declared)} — "
                        "declare the column or fix the transform source"
                    )
        fmt = meta["properties"].get("write_format", "parquet")
        if fmt == "avro":
            # loud S5-style rejection, not a silent parquet fallback: row-
            # oriented avro needs the external spark-avro runtime jar,
            # which this build does not bundle
            raise ValueError(
                "write_format 'avro' requires the spark-avro runtime jar "
                "(org.apache.spark:spark-avro), which is not bundled — "
                "declare 'parquet' (default) or 'orc' (both built into "
                "Spark), or add the jar via spark.jars.packages"
            )
        if fmt not in ("parquet", "orc"):
            raise ValueError(
                f"Unsupported write_format {fmt!r} — the template schema "
                "allows parquet | orc | avro (table-template-reference.md)"
            )
        # directories land only after every validation passed — a
        # rejected template must not leave a half-created table root
        table.log_dir.mkdir(parents=True, exist_ok=True)
        table.data_dir.mkdir(parents=True, exist_ok=True)
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

    #: committed log entries only — pathlib's glob matches dot-prefixed
    #: names, so a bare ``*.json`` would read in-flight ``.tmp-…`` commit
    #: temp files as committed snapshots
    _LOG_GLOB = "[0-9]*.json"

    @classmethod
    def _read_log(cls, log_dir: Path) -> list[dict]:
        entries = []
        for path in sorted(log_dir.glob(cls._LOG_GLOB)):
            entries.append(json.loads(path.read_text()))
        return entries

    def _entries(self) -> list[dict]:
        return self._read_log(self.log_dir)

    def _write_meta(self, meta: dict) -> None:
        # temp + atomic rename: concurrent readers (commit retries, verify,
        # reads in other processes) must never observe a torn table.json
        tmp = self.root / f".tmp-meta-{uuid.uuid4().hex}"
        tmp.write_text(json.dumps(meta, indent=2))
        os.replace(tmp, self.root / "table.json")

    def _seed_expired_sequences(self) -> None:
        """Upgrade shim: tables whose snapshots were expired BEFORE the
        tombstone feature existed have legitimate log gaps with no
        ``expired_sequences`` record — without this they'd flip from
        healthy to corrupt under :meth:`verify_integrity` on upgrade. The
        first commit or expire under this version stamps the key, seeding
        every pre-existing main-log gap as a tombstone (they were
        unattributable anyway); from then on a NEW unexplained gap is a
        real lost entry and fails fsck. Writes the MAIN table.json
        directly: tombstones only ever explain main-log gaps, and a
        branch's copy-on-evolve ``_write_meta`` would drop the key.

        Runs on every :meth:`_commit`, so it must be race-safe: N writer
        processes all seed on their first commit against a pre-upgrade
        table while readers re-read ``table.json`` (commit retries,
        verify, reads). The rewrite goes through a temp file +
        ``os.replace`` (atomic on POSIX) so a concurrent reader never
        sees a torn file, and a per-handle flag skips the read entirely
        once this handle has observed the key."""
        if getattr(self, "_expired_seqs_seeded", False):
            return
        main_path = self.root / "table.json"
        meta = json.loads(main_path.read_text())
        if "expired_sequences" in meta:
            self._expired_seqs_seeded = True
            return
        seqs = {e["sequence"] for e in self._read_log(self.root / "_log")}
        meta["expired_sequences"] = (
            [s for s in range(max(seqs)) if s not in seqs] if seqs else []
        )
        tmp = self.root / f".tmp-meta-{uuid.uuid4().hex}"
        tmp.write_text(json.dumps(meta, indent=2))
        os.replace(tmp, main_path)
        self._expired_seqs_seeded = True

    def current_snapshot(self) -> dict | None:
        entries = self._entries()
        return entries[-1] if entries else None

    def head_sequence(self) -> int | None:
        """Sequence of the newest committed entry in THIS log dir — a
        filename-only probe (no entry reads, one directory listing): the
        cheap staleness check the lazy SQL front door polls per statement
        to notice commits made by OTHER processes. On a branch view this
        probes the branch-local log only (None until the branch's first
        own commit)."""
        seqs = [int(p.stem) for p in self.log_dir.glob(self._LOG_GLOB)]
        return max(seqs) if seqs else None

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
        self._seed_expired_sequences()
        # no .json suffix: temp files must never match the log glob
        tmp = self.log_dir / f".tmp-{uuid.uuid4().hex}"
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
            # Persist each directory's INTRO sequence in the entry itself
            # (Iceberg's per-file data_sequence_number, at dir granularity).
            # Inferring it from surviving log entries breaks after
            # expire_snapshots drops the entry that introduced a data dir:
            # the dir's inferred intro collapses to a later sequence, the
            # MoR strictly-lower applicability test fails, and equality-
            # deleted rows resurrect. The map is cumulative (copied from
            # the parent entry) and pruned to dirs still referenced by any
            # surviving entry so it cannot grow past the live dir set.
            parent_map = entries[-1].get("dir_sequences") if entries else {}
            if parent_map is None:
                # legacy log: the parent entry predates the persisted map.
                # Seed every already-referenced dir from the log-scan intro
                # sequences — starting from {} would setdefault long-existing
                # data AND delete dirs to THIS commit's sequence, destroying
                # the strictly-greater ordering MoR delete applicability
                # relies on (deleted rows would resurrect).
                parent_map = {}
                for e in entries:
                    for d in self._entry_dirs(e):
                        parent_map.setdefault(d, e["sequence"])
            dir_seqs = dict(parent_map)
            # dir_sequence_overrides: an operation may pin a NEW dir to an
            # inherited sequence — delete-file compaction merges N delete
            # files into one that must keep the group's applicability
            # cutoff, not the rewrite commit's own sequence
            overrides = full.get("dir_sequence_overrides") or {}
            for d in self._entry_dirs(full):
                dir_seqs.setdefault(d, overrides.get(d, seq))
            live = {d for e in entries for d in self._entry_dirs(e)}
            live |= set(self._entry_dirs(full))
            full["dir_sequences"] = {d: s for d, s in dir_seqs.items() if d in live}
            tmp.write_text(json.dumps(full))
            target = self.log_dir / f"{seq:012d}.json"
            try:
                os.link(tmp, target)
                tmp.unlink()
                self._refresh_head_registrations()
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

    #: partition directory levels are engine-managed derived columns; the
    #: prefix keeps them from ever colliding with a declared data column
    #: (identity transforms would otherwise shadow their source column and
    #: partitionBy would strip it from the data files)
    _PPREFIX = "__p_"

    def _partition_cols(self, spec: list[dict] | None = None) -> list[tuple[str, dict]]:
        """(physical partition column name, spec entry) per spec level.
        ``spec`` defaults to the table's CURRENT spec (the write path); reads
        pass each data directory's recorded write-time spec instead."""
        if spec is None:
            spec = self.meta.get("partition_spec") or []
        return [
            (self._PPREFIX + partition_field_name(p["column"], p["transform"]), p)
            for p in spec
        ]

    def _write_data(
        self,
        df: DataFrame,
        order_override: list | None = None,
        drop_cols: list[str] | None = None,
        distribution: str = "hash",
    ) -> tuple[str, int, int]:
        """Write one immutable data directory; return (dir, rows, files).

        Applies the template's physical layout: one Hive-style directory
        level per partition_spec transform (hidden partitioning — reads
        prune on the SOURCE column, see :meth:`read`) and
        ``sortWithinPartitions`` for the declared sort_order (write-time
        clustering for compression + min/max file skipping, the
        ``WRITE ORDERED BY`` analog, ``docs/table-template-reference.md:
        180-191``). Row count comes from the written parquet footers — a
        driver-side metadata read, O(files), exactly what Iceberg stores in
        manifests — NOT from ``df.count()``, which would re-execute the
        entire input plan a second time.

        ``order_override``: sort expressions replacing the declared
        sort_order for THIS write (compaction's z-order path); columns in
        ``drop_cols`` are written out of the final projection (helper sort
        keys that must not land in the files).
        """
        dir_name = uuid.uuid4().hex
        out = self.data_dir / dir_name
        from pyspark.sql import functions as F

        # Normalize declared columns to their DECLARED Spark types before
        # writing: the read path groups dirs by declared-type epoch and
        # scans each group as ONE mergeSchema load, which requires every
        # file in the epoch to be physically merge-compatible (a caller
        # passing tz-µs timestamps next to an earlier ntz-ns write would
        # otherwise poison the group with CANNOT_MERGE_SCHEMAS).
        declared_types = {
            c["name"]: c["type"] for c in self.meta.get("columns", [])
        }
        if declared_types:
            df = df.select(
                *[
                    F.col(c).cast(_declared_spark_type(declared_types[c])).alias(c)
                    if c in declared_types
                    else F.col(c)
                    for c in df.columns
                ]
            )
        # spec entries on absent columns only occur with schema enforcement
        # disabled (declared columns cleared); write unpartitioned for those
        pcols = [(n, p) for n, p in self._partition_cols() if p["column"] in df.columns]
        wdf = df
        if pcols:
            wdf = wdf.select(
                "*",
                *[
                    _partition_expr(p["column"], p["transform"]).alias(name)
                    for name, p in pcols
                ],
            )
        if pcols:
            from pyspark.sql import functions as F

            if distribution == "range":
                # Iceberg's write.distribution-mode=range: range-partition
                # on (partition value, sort key) so ONE partition's rows
                # spread over many contiguous tasks — the right mode when
                # the write is a single-partition slice (partition-scoped
                # compaction rewrites the hot partition; hash mode would
                # serialize the whole rewrite onto one core). File count
                # per dir = tasks covering its range: bounded, sorted.
                # task ranges must be drawn on the SAME key the within-task
                # sort uses: under an order_override (z-order compaction)
                # ranging on the declared sort_order would give tasks whose
                # z-value bounding boxes overlap, weakening the multi-column
                # skipping the rewrite exists to provide
                if order_override is not None:
                    sort_keys = list(order_override)
                else:
                    sort_keys = [
                        F.col(o["column"])
                        for o in (self.meta.get("sort_order") or [])
                        if o["column"] in df.columns
                    ]
                range_cols = [F.col(name) for name, _ in pcols] + sort_keys
                n_tasks = wdf.sparkSession.sparkContext.defaultParallelism
                wdf = wdf.repartitionByRange(n_tasks, *range_cols)
            else:
                # hash-distribute by partition value before the partitioned
                # write (Iceberg's write.distribution-mode=hash): without it
                # every one of the N shuffle tasks writes a file into every
                # partition dir — N × dirs tiny files; with it each dir's
                # rows co-locate and the dir gets ONE well-sized file. At
                # 100 TB the shuffle is the price of a sane file count; a
                # hot partition concentrating in one task is the same
                # accepted tradeoff Iceberg's hash mode makes (range mode
                # is the skew-sensitive alternative, used by the
                # partition-scoped compactor).
                wdf = wdf.repartition(*[F.col(name) for name, _ in pcols])
        order = [
            o for o in (self.meta.get("sort_order") or []) if o["column"] in df.columns
        ]
        if order_override is not None:
            from pyspark.sql import functions as F

            wdf = wdf.sortWithinPartitions(
                *[F.col(name) for name, _ in pcols], *order_override
            )
        elif order or pcols:
            from pyspark.sql import functions as F

            sort_exprs = [F.col(name) for name, _ in pcols]
            for item in order:
                direction = item.get("direction", "asc")
                # default null order follows Iceberg/SQL: NULLS FIRST for
                # asc, NULLS LAST for desc; both explicit declarations are
                # honored (the reference's schema allows all four combos,
                # _schema.json:74-96 — Spark's bare asc() would silently
                # cluster an asc+nulls_last template nulls-first)
                null_order = item.get("null_order") or (
                    "nulls_first" if direction == "asc" else "nulls_last"
                )
                col = F.col(item["column"])
                c = {
                    ("asc", "nulls_first"): col.asc_nulls_first,
                    ("asc", "nulls_last"): col.asc_nulls_last,
                    ("desc", "nulls_first"): col.desc_nulls_first,
                    ("desc", "nulls_last"): col.desc_nulls_last,
                }[(direction, null_order)]()
                sort_exprs.append(c)
            wdf = wdf.sortWithinPartitions(*sort_exprs)
        if drop_cols:
            wdf = wdf.drop(*drop_cols)
        fmt = self.write_format()
        writer = wdf.write.format(fmt)
        if pcols:
            writer = writer.partitionBy(*[name for name, _ in pcols])
        writer.save(str(out))
        files = _list_data_files(out)
        rows = _footer_row_count(files)
        return dir_name, rows, len(files)

    def write_format(self) -> str:
        """The template's declared data-file format (``write_format``
        property, the reference's ``write.format.default``;
        ``table-templates/_schema.json:97-104``): parquet (default) or
        orc — both executed natively by Spark's columnar writers."""
        return self.meta.get("properties", {}).get("write_format", "parquet")

    def _check_columns(self, df: DataFrame) -> None:
        declared = [c["name"] for c in self.meta.get("columns", [])]
        if declared and set(df.columns) != set(declared):
            raise ValueError(
                f"Schema mismatch on write to {self.fq_name}. "
                f"Table columns: {sorted(declared)}, Data columns: {sorted(df.columns)}"
            )

    def overwrite(self, df: DataFrame, entry_extra: dict | None = None) -> dict:
        """Atomic full-refresh replace (the reference's write model,
        ``resources/iceberg.py:78``, ``docs/bring-your-own-data.md:220-224``).

        ``entry_extra`` — extra application fields recorded IN the commit
        entry (atomically with the data), e.g. an IVM watermark."""
        self._check_columns(df)
        dir_name, rows, files = self._write_data(df)
        entry = self._commit(
            lambda entries: {
                **(entry_extra or {}),
                "operation": "overwrite",
                "data_dirs": [dir_name],
                "row_count": rows,
                "file_count": files,
                **self._write_epoch(),
            }
        )
        log_audit_event("table_write", self.fq_name, details={"row_count": rows, "mode": "overwrite"})
        return entry

    def last_txn_version(self, app_id: str) -> int | None:
        """Highest committed transaction version for ``app_id``, or None.

        The idempotent-write ledger (Delta's ``txnAppId``/``txnVersion``,
        Iceberg's WAP-id dedup): a writer that stamps commits with a
        monotonically increasing version can detect an already-applied
        batch after a crash-and-replay. Lives in the snapshot entries, so
        — like Delta — expiring ALL snapshots of an app also forgets its
        ledger; retention must outlast the replay window.
        """
        versions = [
            e["txn"]["version"]
            for e in self._entries()
            if (e.get("txn") or {}).get("app_id") == app_id
        ]
        return max(versions) if versions else None

    def _txn_already_applied(self, txn: tuple[str, int] | None) -> dict | None:
        """The current head entry when ``txn`` was already committed
        (idempotent skip), else None. Called BEFORE any data is written so
        a replay leaves no orphan directories."""
        if txn is None:
            return None
        app_id, version = txn
        last = self.last_txn_version(app_id)
        if last is not None and last >= version:
            entries = self._entries()
            return entries[-1] if entries else None
        return None

    @staticmethod
    def _txn_meta(txn: tuple[str, int] | None) -> dict:
        if txn is None:
            return {}
        return {"txn": {"app_id": txn[0], "version": int(txn[1])}}

    def append(self, df: DataFrame, txn: tuple[str, int] | None = None) -> dict:
        """Append commit (the event-stream pattern, ``event_stream.yaml:4``).

        ``txn=(app_id, version)`` makes the append idempotent: a version
        at or below the app's last committed version is skipped (the head
        entry is returned unchanged) — exactly-once sinks for streaming
        ``foreachBatch`` replays.
        """
        skipped = self._txn_already_applied(txn)
        if skipped is not None:
            return skipped
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
                # an append is a pure add: any live equality-delete files
                # carry forward (they scope to STRICTLY LOWER sequences, so
                # they can never erase the rows appended here)
                "delete_dirs": list(current.get("delete_dirs") or []) if current else [],
                # cumulative like row_count — Iceberg snapshot summaries track
                # TOTAL files in the snapshot, not just the new manifest's
                "row_count": prev_rows + rows,
                "file_count": prev_files + files,
                **self._write_epoch(),
                **self._txn_meta(txn),
            }

        entry = self._commit(build)
        log_audit_event("table_write", self.fq_name, details={"row_count": rows, "mode": "append"})
        return entry

    def delete_where(
        self,
        spark: SparkSession,
        condition: str,
        hard: bool = False,
        mode: str = "cow",
    ) -> dict:
        """Row-level delete: commit a snapshot WITHOUT the rows matching
        ``condition`` (a SQL boolean expression) — the copy-on-write form
        of Iceberg's ``DELETE FROM`` (rewrite affected data; old snapshots
        keep serving the pre-delete rows for time travel).

        ``hard=True`` is the right-to-erasure composition the compliance
        guide's lifecycle rules imply (``docs/compliance.md:121-130``): a
        plain delete leaves the rows readable via time travel until
        retention expires them, so a GDPR/CCPA erase = delete + expire
        every pre-delete snapshot + drop the orphaned directories — after
        it returns, no snapshot can serve the deleted rows.

        Returns the commit entry with ``deleted_count`` in its audit
        record. Copy-on-write is the 100 TB-honest default here because
        snapstore tracks directory-granularity manifests; an engine with
        file-level manifests would rewrite only affected files
        (merge-on-read position deletes are the low-latency alternative).

        CAUTION (same as Iceberg's remove_orphan_files guidance): the
        hard path drops unreferenced directories with NO grace window —
        run it without concurrent writers, or an in-flight write that has
        materialized its directory but not yet committed can lose it.

        ``mode='mor'`` is the merge-on-read form (Iceberg v2 equality
        deletes — the low-write-amplification path the reference's engine
        comparison credits to Hudi for CDC workloads): instead of
        rewriting the table, the matched rows' identifier-field tuples
        land in a tiny delete file and every read anti-joins it until
        :meth:`compact` materializes. Write cost is O(deleted keys), not
        O(table). Requires ``identifier_fields`` in the table template;
        deletes at KEY granularity (every row sharing a matched row's key
        dies — identifier fields are expected unique, Iceberg's
        identifier-field contract). ``hard=True`` is CoW-only.
        """
        if mode not in ("cow", "mor"):
            raise ValueError(f"delete_where: mode must be 'cow' or 'mor', got {mode!r}")
        if hard and getattr(self, "branch_name", None) is not None:
            # hard erasure expires history and drops dirs TABLE-WIDE; a
            # branch shares main's data dirs — erase on main, not a ref
            raise ValueError(
                "delete_where(hard=True) is table-wide erasure — run it on "
                f"the MAIN table, not branch {self.branch_name!r}"
            )
        if mode == "mor":
            if hard:
                raise ValueError(
                    "delete_where: hard erasure requires mode='cow' — a MoR "
                    "delete leaves the bytes in the data files by design"
                )
            return self._delete_where_mor(spark, condition)
        current = self.read(spark)
        # SQL DELETE removes rows where the predicate is TRUE — rows where
        # it evaluates NULL (e.g. `region = 'us'` on a NULL region) are
        # KEPT. A bare NOT(cond) filter would silently drop them.
        kept = current.filter(f"NOT (({condition}) <=> TRUE)")
        dir_name, rows, files = self._write_data(kept)
        entry = self._commit(
            lambda entries: {
                "operation": "delete",
                "data_dirs": [dir_name],
                "row_count": rows,
                "file_count": files,
                **self._write_epoch(),
            }
        )
        prev_rows = None
        for e in self._entries():
            if e["snapshot_id"] == entry["parent_id"]:
                prev_rows = e["row_count"]
        deleted = (prev_rows - rows) if prev_rows is not None else None
        log_audit_event(
            "table_write",
            self.fq_name,
            details={
                "mode": "delete",
                "condition": condition,
                "deleted_count": deleted,
                "hard": hard,
            },
        )
        if hard:
            # expire EVERYTHING but the delete snapshot, then drop the
            # now-unreferenced data dirs immediately (no grace: the point
            # is that the bytes are gone)
            self.expire_snapshots(older_than_ms=_now_ms() + 1)
            self.remove_orphan_files(grace_ms=0)
        return entry

    #: sidecar mapping partition-leaf suffix → deferred-key row count,
    #: written next to each equality-delete file so maintenance can
    #: attribute MoR debt to partitions from metadata alone (no scan)
    _DEBT_SIDECAR = "_partition_debt.json"

    def _partition_debt(self, doomed: DataFrame) -> tuple[int, dict[str, int]]:
        """Per-partition-leaf count of the rows a MoR delete defers.

        Returns ``(total_rows, {leaf_suffix: count})`` where a leaf suffix
        renders the CURRENT spec's physical levels unescaped
        (``__p_day=2024-01-15`` / nested with ``/``; ``""`` for an
        unpartitioned table). One small aggregate over the rows the delete
        already had to touch — the write-time price of metadata-only
        partition attribution at maintenance time."""
        from pyspark.sql import functions as F

        pcols = [
            (n, p)
            for n, p in self._partition_cols()
            if p["column"] in doomed.columns
        ]
        if not pcols:
            n = doomed.count()
            return n, ({"": n} if n else {})
        exprs = [
            _partition_expr(p["column"], p["transform"]).cast("string").alias(n)
            for n, p in pcols
        ]
        out = doomed.groupBy(*exprs).count().collect()
        debt: dict[str, int] = {}
        for r in out:
            leaf = "/".join(
                f"{n}={r[n] if r[n] is not None else '__HIVE_DEFAULT_PARTITION__'}"
                for n, _ in pcols
            )
            debt[leaf] = debt.get(leaf, 0) + r["count"]
        return sum(debt.values()), debt

    def _delete_where_mor(self, spark: SparkSession, condition: str) -> dict:
        ids = self.meta.get("identifier_fields")
        if not ids:
            raise ValueError(
                "delete_where(mode='mor') needs 'identifier_fields' in the "
                f"table template of {self.fq_name} — equality deletes are "
                "keyed on them (Iceberg identifier-field-ids)"
            )
        declared = [c["name"] for c in self.meta.get("columns", [])]
        missing = [c for c in ids if c not in declared]
        if missing:
            raise ValueError(
                f"delete_where(mode='mor'): identifier fields {missing} "
                f"not table columns"
            )
        current = self.read(spark)
        matched = (
            current.filter(f"({condition}) <=> TRUE").select(*ids).dropDuplicates()
        )
        dir_name = f"mordel-{uuid.uuid4().hex}"
        matched.write.parquet(str(self.data_dir / dir_name))
        # Sidecar: the key columns' name→field-id mapping AT WRITE TIME
        # (underscore prefix keeps Spark's parquet scan from reading it).
        # Delete files are keyed by field id like data files: a later
        # evolve_rename_column on an identifier field must not break the
        # read-time anti-join — reads resolve these ids back to the
        # then-current declared names (see _read_delete_keys).
        col_ids = self._column_ids()
        (self.data_dir / dir_name / "_key_ids.json").write_text(
            json.dumps({c: col_ids.get(c) for c in ids})
        )
        # key-granular row count: every row carrying a matched key dies —
        # counted per partition leaf so the debt sidecar is free
        deleted, debt = self._partition_debt(
            current.join(matched, list(ids), "left_semi")
        )
        (self.data_dir / dir_name / self._DEBT_SIDECAR).write_text(
            json.dumps(debt)
        )

        def build(entries: list[dict]) -> dict:
            prev = entries[-1] if entries else None
            return {
                "operation": "delete",
                "data_dirs": list(prev["data_dirs"]) if prev else [],
                "delete_dirs": (
                    list(prev.get("delete_dirs") or []) if prev else []
                ) + [dir_name],
                "row_count": (prev["row_count"] if prev else 0) - deleted,
                "file_count": prev["file_count"] if prev else 0,
                **{
                    k: prev[k]
                    for k in ("column_ids", "column_types", "partition_spec", "write_format")
                    if prev and k in prev
                },
            }

        entry = self._commit(build)
        log_audit_event(
            "table_write",
            self.fq_name,
            details={
                "mode": "delete_mor",
                "condition": condition,
                "deleted_count": deleted,
            },
        )
        return entry

    def update_where(
        self, spark: SparkSession, condition: str, set_exprs: dict[str, str]
    ) -> dict:
        """Row-level UPDATE: commit a snapshot where rows matching
        ``condition`` have each column in ``set_exprs`` replaced by its SQL
        expression (evaluated against the old row) — the copy-on-write
        ``UPDATE`` analog, completing the DML triad next to
        :meth:`delete_where` and the SCD2 MERGE. Unmatched rows carry
        over byte-identical; old snapshots keep the pre-update state.
        """
        from pyspark.sql import functions as F

        declared = [c["name"] for c in self.meta.get("columns", [])]
        unknown = set(set_exprs) - set(declared)
        if unknown:
            raise ValueError(f"update_where: unknown columns {sorted(unknown)}")
        current = self.read(spark)
        cond = F.expr(condition)
        updated = current.select(
            *[
                F.when(cond, F.expr(set_exprs[c])).otherwise(F.col(c)).alias(c)
                if c in set_exprs
                else F.col(c)
                for c in current.columns
            ]
        )
        dir_name, rows, files = self._write_data(updated)
        entry = self._commit(
            lambda entries: {
                "operation": "update",
                "data_dirs": [dir_name],
                "row_count": rows,
                "file_count": files,
                **self._write_epoch(),
            }
        )
        log_audit_event(
            "table_write",
            self.fq_name,
            details={"mode": "update", "condition": condition,
                     "set_columns": sorted(set_exprs)},
        )
        return entry

    def merge_into(
        self,
        spark: SparkSession,
        source: DataFrame,
        on: str,
        when_matched: list[dict] | None = None,
        when_not_matched: list[dict] | None = None,
        when_not_matched_by_source: list[dict] | None = None,
        txn: tuple[str, int] | None = None,
        entry_extra: dict | None = None,
    ) -> dict:
        """``MERGE INTO`` — the copy-on-write upsert completing the DML
        triad (Iceberg's flagship CDC write path; the reference weighs
        engines by exactly this: "Hudi has better upsert performance for
        CDC workloads", ``docs/deep-dive.md``).

        The table is aliased ``t`` and ``source`` is aliased ``s``; every
        SQL expression in ``on`` and the clause dicts references columns
        through those prefixes (``t.id = s.id``). Clause lists follow
        Spark's ``MergeIntoWriter`` shape, first-match-wins per row:

        - ``when_matched``: ``{"action": "update", "set": {col: expr}}``
          or ``{"action": "delete"}``, each with an optional
          ``"condition"`` expression. ``"set": "*"`` updates every
          target column from the same-named source column.
        - ``when_not_matched``: ``{"action": "insert", "values":
          {col: expr}}`` (``"values": "*"`` inserts by name; omitted
          columns become typed NULLs).
        - ``when_not_matched_by_source``: ``update``/``delete`` clauses
          whose expressions may only reference ``t`` (Spark 3.4+
          ``WHEN NOT MATCHED BY SOURCE``).

        A target row matched by more than one source row raises
        ``ValueError`` (Spark's MERGE_CARDINALITY_VIOLATION): the update
        would be non-deterministic. The check is one aggregate over the
        persisted join output, mirroring Spark's runtime assertion.

        Scale shape: ONE full-outer join on the ON condition is the only
        shuffle (AQE broadcast-optimizes a small CDC batch side), then a
        single projection derives every output column from a per-row
        clause verdict — no per-clause passes. Copy-on-write rewrite, same
        honesty note as :meth:`delete_where`; merge-on-read deletes are
        the low-latency alternative an engine with file-level manifests
        would pick.
        """
        from pyspark.sql import functions as F

        skipped = self._txn_already_applied(txn)
        if skipped is not None:
            return skipped
        declared = [c["name"] for c in self.meta.get("columns", [])]
        types = {c["name"]: c["type"] for c in self.meta.get("columns", [])}
        when_matched = list(when_matched or [])
        when_not_matched = list(when_not_matched or [])
        when_not_matched_by_source = list(when_not_matched_by_source or [])
        if not (when_matched or when_not_matched or when_not_matched_by_source):
            raise ValueError("merge_into: at least one WHEN clause is required")

        matched, not_matched, by_source = _normalize_merge_clauses(
            declared, when_matched, when_not_matched, when_not_matched_by_source
        )

        target = (
            self.read(spark)
            .withColumn("__sg_t_id", F.monotonically_increasing_id())
            .alias("t")
        )
        src = source.withColumn("__sg_s_mark", F.lit(True)).alias("s")
        joined = target.join(src, F.expr(on), "full_outer").persist()
        try:
            t_here = F.col("t.__sg_t_id").isNotNull()
            s_here = F.col("s.__sg_s_mark").isNotNull()

            if matched or by_source:
                dup = (
                    joined.filter(t_here & s_here)
                    .groupBy("t.__sg_t_id")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .filter("n > 1")
                    .limit(1)
                    .count()
                )
                if dup:
                    raise ValueError(
                        "merge_into: MERGE cardinality violation — a target "
                        "row matches more than one source row; aggregate the "
                        "source to one row per key first"
                    )

            # one ordered verdict per row; every output column reads it
            verdict = None
            labels: dict[str, dict] = {}

            def _add(pred, label, clause):
                nonlocal verdict
                cond = pred
                if clause["condition"]:
                    cond = cond & F.expr(clause["condition"])
                # deletes keep a distinct label ("d"+label) so merge_stats
                # can tell deleted target rows from skipped source rows
                lab = "d" + label if clause["action"] == "delete" else label
                if clause["action"] != "delete":
                    labels[label] = clause
                verdict = (
                    F.when(cond, F.lit(lab))
                    if verdict is None
                    else verdict.when(cond, F.lit(lab))
                )

            for i, c in enumerate(matched):
                _add(t_here & s_here, f"m{i}", c)
            for i, c in enumerate(by_source):
                _add(t_here & ~s_here, f"b{i}", c)
            # unmatched-by-any-clause target rows carry over unchanged
            verdict = (
                F.when(t_here, F.lit("keep"))
                if verdict is None
                else verdict.when(t_here, F.lit("keep"))
            )
            for i, c in enumerate(not_matched):
                _add(s_here, f"i{i}", c)
            verdict = verdict.otherwise(F.lit("skip"))

            tagged = joined.withColumn("__sg_verdict", verdict)
            stats = {
                r["__sg_verdict"]: r["n"]
                for r in tagged.groupBy("__sg_verdict")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }

            def _out(col: str):
                expr = None
                for label, clause in labels.items():
                    if clause["action"] == "update" and col not in clause["exprs"]:
                        continue  # update leaves unlisted columns at t.col
                    val = (
                        F.expr(clause["exprs"][col])
                        if col in clause["exprs"]
                        else F.lit(None)
                    ).cast(types.get(col, "string"))
                    pred = F.col("__sg_verdict") == label
                    expr = F.when(pred, val) if expr is None else expr.when(pred, val)
                base = F.col(f"t.{col}")
                return (base if expr is None else expr.otherwise(base)).alias(col)

            # rows to write: everything except deletes (dm*/db*) and
            # source rows no insert clause claimed (skip)
            result = tagged.filter(
                ~F.col("__sg_verdict").startswith("d")
                & (F.col("__sg_verdict") != "skip")
            ).select(*[_out(c) for c in declared])
            self._check_columns(result)
            dir_name, rows, files = self._write_data(result)
        finally:
            joined.unpersist()

        merge_stats = {
            "updated": sum(n for v, n in stats.items() if v[0] in "mb"),
            "inserted": sum(n for v, n in stats.items() if v[0] == "i"),
            "deleted": sum(n for v, n in stats.items() if v[0] == "d"),
            "unchanged": stats.get("keep", 0),
        }
        entry = self._commit(
            lambda entries: {
                **(entry_extra or {}),
                "operation": "merge",
                "data_dirs": [dir_name],
                "row_count": rows,
                "file_count": files,
                "merge_stats": merge_stats,
                **self._write_epoch(),
                **self._txn_meta(txn),
            }
        )
        log_audit_event(
            "table_write",
            self.fq_name,
            details={"mode": "merge", "on": on, **merge_stats},
        )
        return entry

    def merge_into_sql(
        self,
        source_view: str,
        on: str,
        when_matched: list[dict] | None = None,
        when_not_matched: list[dict] | None = None,
        when_not_matched_by_source: list[dict] | None = None,
        table_fq: str | None = None,
    ) -> str:
        """Render the equivalent ``MERGE INTO`` statement for a real
        warehouse (Iceberg/Delta on a cluster with the runtime jar; see
        ``tables/catalog_conf.py``) from the SAME clause dicts
        :meth:`merge_into` executes locally — the swap-in path: develop
        and test the merge locally, ship the rendered SQL to production.
        Same first-match-wins semantics (Spark evaluates MERGE clauses in
        order), same ``"*"`` expansion, same validation.
        """
        declared = [c["name"] for c in self.meta.get("columns", [])]
        matched, not_matched, by_source = _normalize_merge_clauses(
            declared,
            list(when_matched or []),
            list(when_not_matched or []),
            list(when_not_matched_by_source or []),
        )
        if not (matched or not_matched or by_source):
            raise ValueError("merge_into_sql: at least one WHEN clause is required")

        def _when(prefix: str, clause: dict) -> str:
            head = prefix + (f" AND ({clause['condition']})" if clause["condition"] else "")
            if clause["action"] == "delete":
                return f"{head} THEN DELETE"
            if clause["action"] == "update":
                sets = ", ".join(
                    f"t.{c} = {e}" for c, e in clause["exprs"].items()
                )
                return f"{head} THEN UPDATE SET {sets}"
            cols = ", ".join(clause["exprs"])
            vals = ", ".join(clause["exprs"].values())
            return f"{head} THEN INSERT ({cols}) VALUES ({vals})"

        lines = [
            f"MERGE INTO {table_fq or self.fq_name} t",
            f"USING {source_view} s",
            f"ON {on}",
        ]
        lines += [_when("WHEN MATCHED", c) for c in matched]
        lines += [_when("WHEN NOT MATCHED", c) for c in not_matched]
        lines += [_when("WHEN NOT MATCHED BY SOURCE", c) for c in by_source]
        return "\n".join(lines)

    def apply_changelog(
        self,
        spark: SparkSession,
        changes: DataFrame,
        key_cols: list[str],
        op_col: str = "op",
        seq_col: str | None = None,
        txn: tuple[str, int] | None = None,
        mode: str = "cow",
    ) -> dict:
        """Apply a CDC changelog (Debezium/Hudi-style ``I``/``U``/``D``
        rows) as ONE merge commit — the upsert workload the reference's
        engine comparison centers on (``docs/deep-dive.md``: "Hudi has
        better upsert performance for CDC workloads").

        ``changes`` carries the table's columns plus ``op_col`` (values
        ``I``/``U``/``D``) and optionally ``seq_col`` (LSN / commit
        timestamp). When ``seq_col`` is given, the batch is first
        compacted to the LATEST change per key (window over the keys,
        descending sequence) so replaying a multi-change batch lands on
        the end state — without it, a key appearing twice in one batch is
        a cardinality violation, which :meth:`merge_into` raises on
        rather than applying nondeterministically.

        I and U both upsert (insert if absent, update if present — CDC
        streams routinely replay inserts); D deletes when present and is
        a no-op when absent.
        """
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        declared = [c["name"] for c in self.meta.get("columns", [])]
        missing = [c for c in key_cols if c not in declared]
        if missing:
            raise ValueError(f"apply_changelog: keys {missing} not table columns")
        if mode not in ("cow", "mor"):
            raise ValueError(
                f"apply_changelog: mode must be 'cow' or 'mor', got {mode!r}"
            )
        if seq_col is not None:
            w = Window.partitionBy(*key_cols).orderBy(
                F.col(seq_col).desc(), F.col(op_col).desc()
            )
            changes = (
                changes.withColumn("__sg_rn", F.row_number().over(w))
                .filter("__sg_rn = 1")
                .drop("__sg_rn")
            )
        if mode == "mor":
            return self._apply_changelog_mor(
                spark, changes, key_cols, op_col, txn
            )
        on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
        data_cols = [c for c in declared if c not in key_cols]
        return self.merge_into(
            spark,
            changes,
            on,
            when_matched=[
                {"action": "delete", "condition": f"s.{op_col} = 'D'"},
                {"action": "update", "set": {c: f"s.{c}" for c in data_cols}},
            ],
            when_not_matched=[
                {
                    "action": "insert",
                    "condition": f"s.{op_col} <> 'D'",
                    "values": {c: f"s.{c}" for c in declared},
                }
            ],
            txn=txn,
        )

    def _apply_changelog_mor(
        self,
        spark: SparkSession,
        changes: DataFrame,
        key_cols: list[str],
        op_col: str,
        txn: tuple[str, int] | None,
    ) -> dict:
        """Merge-on-read CDC apply — the Hudi-MoR upsert shape the
        reference's engine comparison credits for CDC workloads
        (``docs/deep-dive.md:83``): ONE commit carrying (a) an
        equality-delete file with every changed key and (b) a data file
        with the new images of upserted rows. Write cost is O(changes),
        never O(table) — no full-outer join, no table rewrite. Reads
        resolve by sequence scoping: the delete file erases OLD images
        only (strictly lower commit sequence), so the same commit's new
        images survive; :meth:`compact` folds everything down.
        """
        from pyspark.sql import functions as F

        skipped = self._txn_already_applied(txn)
        if skipped is not None:
            return skipped
        declared = [c["name"] for c in self.meta.get("columns", [])]
        changes = changes.persist()
        try:
            upserts = changes.filter(f"{op_col} <> 'D'").select(*declared)
            touched = changes.select(*key_cols).dropDuplicates()
            # rows the delete file will erase (current images of touched
            # keys) — counted per partition leaf: the snapshot's row
            # accounting and the maintenance debt sidecar from one pass
            removed, debt = self._partition_debt(
                self.read(spark).join(touched, key_cols, "left_semi")
            )
            del_dir = f"mordel-{uuid.uuid4().hex}"
            touched.write.parquet(str(self.data_dir / del_dir))
            col_ids = self._column_ids()
            (self.data_dir / del_dir / "_key_ids.json").write_text(
                json.dumps({c: col_ids.get(c) for c in key_cols})
            )
            (self.data_dir / del_dir / self._DEBT_SIDECAR).write_text(
                json.dumps(debt)
            )
            up_dir, up_rows, up_files = self._write_data(upserts)
        finally:
            changes.unpersist()

        def build(entries: list[dict]) -> dict:
            prev = entries[-1] if entries else None
            return {
                "operation": "merge",
                "data_dirs": (list(prev["data_dirs"]) if prev else []) + [up_dir],
                "delete_dirs": (
                    list(prev.get("delete_dirs") or []) if prev else []
                ) + [del_dir],
                "row_count": (prev["row_count"] if prev else 0) - removed + up_rows,
                "file_count": (prev["file_count"] if prev else 0) + up_files,
                "merge_stats": {
                    "upserted": up_rows,
                    "erased_images": removed,
                    "mode": "mor",
                },
                **self._write_epoch(),
                **self._txn_meta(txn),
            }

        entry = self._commit(build)
        log_audit_event(
            "table_write",
            self.fq_name,
            details={
                "mode": "merge_mor",
                "upserted": up_rows,
                "erased_images": removed,
            },
        )
        return entry

    def rollback_to(self, snapshot_id: str) -> dict:
        """Roll the table back to an earlier snapshot — Iceberg's
        ``rollback_to_snapshot`` procedure: a NEW commit that re-references
        the old snapshot's data directories (metadata-only, nothing
        rewritten), so the rollback itself is in the history and can be
        rolled back in turn. The intervening snapshots stay
        time-travelable until retention expires them.
        """
        target = self._snapshot_for(snapshot_id, None)

        entry = self._commit(
            lambda entries: {
                "operation": "rollback",
                # the target's sequence, so `history` can reconstruct the
                # current-ancestor chain (snapshots between the target and
                # this commit left the head lineage — Iceberg's
                # is_current_ancestor=false rows)
                "rollback_of": target["sequence"],
                "data_dirs": list(target["data_dirs"]),
                "delete_dirs": list(target.get("delete_dirs") or []),
                "row_count": target["row_count"],
                "file_count": target["file_count"],
                # restore the WRITE EPOCH of the target so epoch-grouped
                # reads treat the re-referenced dirs under their original
                # schema/spec, not the current one
                **{
                    k: target[k]
                    for k in ("column_ids", "column_types", "partition_spec", "write_format")
                    if k in target
                },
            }
        )
        log_audit_event(
            "table_write",
            self.fq_name,
            details={"mode": "rollback", "to_snapshot": snapshot_id},
        )
        return entry

    def cherrypick_snapshot(self, snapshot_id: str) -> dict:
        """Re-apply ONE append snapshot's delta onto the current head —
        Iceberg's ``cherrypick_snapshot`` procedure (metadata-only:
        the target's NEW data directories are re-referenced, nothing
        is rewritten). The recovery shape it exists for: after a
        ``rollback_to`` skipped past a bad commit, cherry-pick the good
        commits that followed it back one by one.

        Only ``append`` snapshots are cherry-pickable (Iceberg has the
        same restriction — a delete/overwrite delta is not expressible
        as a directory re-reference). Directories whose rows the head
        already references are skipped — DIRECTLY (the dir or one of its
        kept-leaf subpaths is in the head's ``data_dirs``) or through
        REWRITE LINEAGE (a compact/rewrite commit recorded the dir in its
        ``absorbed_dirs`` map and the rewrite's output is reachable from
        the head): without the lineage walk, cherry-picking an append
        whose delta a later ``rewrite_data_files`` absorbed would
        re-append rows the head already holds. Cherry-picking a fully
        covered snapshot is a no-op returning the current snapshot
        unchanged; a partially covered one re-references only the
        uncovered dirs, with ``row_count``/``file_count`` deltas computed
        from those dirs' file footers (metadata-only), never the full
        target-parent delta.

        Lineage survives expiry by construction: ``expire_snapshots``
        drops entries oldest-first, so a rewrite's ``absorbed_dirs``
        record can only leave the log AFTER every (older) snapshot it
        absorbed — i.e. after those targets stop being cherry-pickable
        at all.

        Known divergence (shared with Iceberg's procedure): coverage is
        DIRECTORY-level, not row-level — cherry-picking an append whose
        rows were later DML-DELETED (or whose partition-scoped rewrite
        materialized to nothing because every row was MoR-deleted)
        re-references the dirs and resurrects those rows; deletes are
        not part of an append's re-applicable delta.
        """
        target = self._snapshot_for(snapshot_id, None)
        if target.get("operation") != "append":
            raise ValueError(
                f"cherrypick_snapshot: {snapshot_id!r} is a "
                f"{target.get('operation')!r} snapshot — only append "
                "snapshots are cherry-pickable"
            )
        entries = self._entries()
        idx = next(
            i for i, e in enumerate(entries)
            if e["sequence"] == target["sequence"]
        )
        parent = entries[idx - 1] if idx > 0 else None
        parent_dirs = set(parent["data_dirs"]) if parent else set()
        delta_dirs = [
            d for d in target["data_dirs"] if d not in parent_dirs
        ]
        current = entries[-1]
        # top-level dir segments whose rows the head can reach: seed with
        # the head's references, then walk rewrite lineage (absorbed_dirs
        # maps recorded by compact) to a fixed point. Conservative by
        # construction — over-covering turns a would-be duplicate append
        # into a no-op, never the reverse.
        absorbed_by: dict[str, set[str]] = {}
        for e in entries:
            for nd, ab in (e.get("absorbed_dirs") or {}).items():
                absorbed_by.setdefault(nd.split("/", 1)[0], set()).update(
                    p.split("/", 1)[0] for p in ab
                )
        reached = {d.split("/", 1)[0] for d in current["data_dirs"]}
        frontier = list(reached)
        while frontier:
            for t_ in absorbed_by.get(frontier.pop(), ()):
                if t_ not in reached:
                    reached.add(t_)
                    frontier.append(t_)
        new_dirs = [
            d for d in delta_dirs if d.split("/", 1)[0] not in reached
        ]
        if not new_dirs:
            return current
        # deltas from the dirs actually re-referenced — on partial
        # coverage the target-parent delta would overstate both counts
        new_files_list = [
            f for d in new_dirs for f in _list_data_files(self.data_dir / d)
        ]
        delta_rows = _footer_row_count(new_files_list)
        delta_files = len(new_files_list)

        def build(cur_entries: list[dict]) -> dict:
            cur = cur_entries[-1] if cur_entries else None
            return {
                "operation": "append",
                "data_dirs": (cur["data_dirs"] if cur else []) + new_dirs,
                "delete_dirs": (
                    list(cur.get("delete_dirs") or []) if cur else []
                ),
                "row_count": (cur["row_count"] if cur else 0) + delta_rows,
                "file_count": (cur["file_count"] if cur else 0)
                + delta_files,
                # the delta dirs were written under the TARGET's epoch:
                # carry its schema/spec stamps so epoch-grouped reads
                # project them correctly (same contract as merge rebase)
                **{
                    k: target[k]
                    for k in (
                        "column_ids", "column_types", "partition_spec",
                        "write_format",
                    )
                    if k in target
                },
            }

        entry = self._commit(build)
        log_audit_event(
            "table_write",
            self.fq_name,
            details={
                "mode": "cherrypick_snapshot",
                "source_snapshot": snapshot_id,
            },
        )
        return entry

    def read_changes(
        self, spark: SparkSession, from_snapshot_id: str, to_snapshot_id: str | None = None
    ) -> DataFrame:
        """Row-level changelog between two snapshots (Delta CDF /
        Iceberg changelog-scan analog): every row only in the newer
        snapshot tagged ``insert``, every row only in the older tagged
        ``delete`` — an UPDATE surfaces as its delete+insert pair.
        Works across ANY operations (overwrite, delete, update, compact),
        where :meth:`read_incremental` covers only append-only chains.

        Cost honesty: without stored per-file diffs this is two
        ``exceptAll`` passes over both snapshots (multiset semantics, so
        duplicate rows diff correctly) — CDC-on-demand, O(|old| + |new|)
        shuffle. An engine with file-granular manifests diffs manifests
        first and scans only changed files; snapstore's
        directory-granular manifests make the data pass the honest price.
        """
        old = self.read(spark, snapshot_id=from_snapshot_id)
        new = self.read(spark, snapshot_id=to_snapshot_id)
        from pyspark.sql import functions as F

        inserts = new.exceptAll(old).withColumn("_change_type", F.lit("insert"))
        deletes = old.exceptAll(new).withColumn("_change_type", F.lit("delete"))
        return inserts.unionByName(deletes)

    # -- reads -------------------------------------------------------------

    def _dir_intro_seqs(self) -> dict[str, int]:
        """Directory (data or delete) → the sequence of the log entry that
        INTRODUCED it — the commit-sequence ordering Iceberg scopes
        delete-file applicability by.

        Source of truth is the persisted ``dir_sequences`` map stamped on
        every commit entry: a log scan alone mis-dates a dir once
        ``expire_snapshots`` drops its introducing entry (the dir then
        first appears at a surviving carry-forward entry, which can sit
        AFTER a MoR delete commit and un-apply it — resurrecting deleted
        rows). The scan remains only as the fallback for entries committed
        before the map existed."""
        seen: dict[str, int] = {}
        entries = self._entries()
        for e in entries:
            for d in self._entry_dirs(e):
                seen.setdefault(d, e["sequence"])
        for e in reversed(entries):
            persisted = e.get("dir_sequences")
            if persisted is not None:
                # A dir's intro is by definition <= the first surviving
                # entry that references it, so min(scan, persisted) is
                # always the true intro: persisted wins after expire
                # collapses the scan date forward, while the scan heals a
                # map that was ever (mis)seeded with a too-late sequence.
                for d, s in persisted.items():
                    seen[d] = min(seen.get(d, s), s)
                break
        return seen

    @staticmethod
    def _entry_dirs(e: dict) -> list[str]:
        """Every directory a log entry references: data dirs plus any
        merge-on-read equality-delete dirs — retention/orphan logic must
        protect both."""
        return list(e.get("data_dirs", [])) + list(e.get("delete_dirs") or [])

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

    def _column_ids(self) -> dict[str, int | None]:
        """Declared column name → field id (None on legacy tables created
        before field ids existed)."""
        return {c["name"]: c.get("id") for c in self.meta.get("columns", [])}

    def _write_epoch(self) -> dict:
        """The write-time metadata stamped on every commit entry, so reads
        can reconstruct how each data directory was PHYSICALLY written long
        after the declared schema/layout has evolved:

        - ``column_ids``: name → field id (field-id projection; rename /
          drop+re-add safety);
        - ``column_types``: name → declared type at write time — a widened
          column (int→long) leaves pre-widen files as int; grouping reads
          by type epoch keeps Spark's parquet schema merge from seeing
          int and long for one column in one scan (CANNOT_MERGE_SCHEMAS)
          and lets each epoch cast up to the declared type independently;
        - ``partition_spec``: the layout this directory was written under —
          partition-spec evolution means new writes use the new layout
          while old dirs keep (and are pruned by) their own.
        """
        meta = self.meta
        return {
            "column_ids": {c["name"]: c.get("id") for c in meta.get("columns", [])},
            "column_types": {c["name"]: c["type"] for c in meta.get("columns", [])},
            "partition_spec": meta.get("partition_spec") or [],
            # the file format the dir was physically written in — reads
            # must pick the matching Spark data source per epoch
            "write_format": meta.get("properties", {}).get("write_format", "parquet"),
        }

    def _dir_epochs(self) -> dict[str, dict | None]:
        """Data dir → the write-epoch metadata it was WRITTEN under
        (the first log entry referencing the dir; None for legacy entries
        without ``column_ids``)."""
        seen: dict[str, dict | None] = {}
        for e in self._entries():
            ids = e.get("column_ids")
            epoch = None
            if ids is not None:
                epoch = {
                    "column_ids": ids,
                    "column_types": e.get("column_types"),
                    "partition_spec": e.get("partition_spec"),
                    "write_format": e.get("write_format"),
                }
            # dir_epoch_overrides: a partition-scoped compact keeps the
            # unmatched leaves of a split dir as subpath references; those
            # files were written under the SOURCE dir's epoch, not the
            # compact commit's — the override pins it (processed before
            # data_dirs so it wins for the entry that introduces them)
            for d, ep in (e.get("dir_epoch_overrides") or {}).items():
                if d not in seen:
                    seen[d] = ep
            for d in e["data_dirs"]:
                if d not in seen:
                    seen[d] = epoch
        # defensive fallback: a subpath with no surviving override inherits
        # its containing dir's epoch when that is still known
        for d, ep in list(seen.items()):
            if ep is None and "/" in d:
                top = d.split("/", 1)[0]
                if seen.get(top) is not None:
                    seen[d] = seen[top]
        return seen

    def _project_declared(self, df: DataFrame, written_ids: dict | None) -> DataFrame:
        """Project a frame of raw data files to the declared table schema:
        declared names, declared order, cast to declared types.

        Always applied, never gated on a name-set comparison, and resolved
        by FIELD ID, not name (``written_ids`` is the name→id mapping the
        files were written under): Iceberg's field-id semantics make a
        column that is dropped and later re-added a FRESH column — its
        pre-drop bytes still sit in old data files, and a name-based
        projection would silently resurrect them (a governance leak when
        the drop removed PII). A declared column reads from a file only when
        the file was written under the SAME field id; otherwise it reads as
        typed NULL.
        """
        declared = self.meta.get("columns", [])
        if not declared:
            return df
        from pyspark.sql import functions as F

        out = []
        for c in declared:
            typ = _declared_spark_type(c["type"])
            name = c["name"]
            source = None
            if written_ids is None:
                source = name if name in df.columns else None
            elif c.get("id") is not None:
                # id-first resolution: the declared field reads from WHATEVER
                # file column carries its id — this is what makes RENAME safe
                # (old files keep serving the renamed column) while a
                # dropped-then-re-added name (fresh id) correctly reads NULL
                for fname, fid in written_ids.items():
                    if fid == c["id"] and fname in df.columns:
                        source = fname
                        break
                if (
                    source is None
                    and name in df.columns
                    and written_ids.get(name, "∅") is None
                ):
                    source = name  # legacy files written before field ids
            else:
                # legacy declared column (no id): name-based
                if name in df.columns and name in written_ids:
                    source = name
            if source is not None:
                out.append(F.col(source).cast(typ).alias(name))
            else:
                out.append(F.lit(None).cast(typ).alias(name))
        return df.select(*out)

    def _leaf_dirs(
        self,
        roots: list[Path],
        filters: list[tuple] | None,
        spec: list[dict] | None = None,
    ) -> list[str]:
        """Enumerate data directories under ``roots``, pruning partition
        levels that cannot match ``filters``.

        ``filters`` are simple conjunctive predicates ``(column, op, value)``
        with op in ``= >= > <= < in`` (``in`` takes an iterable of values —
        the probe-pruning shape: an IVF cell set, a key list) on the
        partition SOURCE columns (hidden
        partitioning: callers never name ``ts_day``, they constrain ``ts``).
        Range ops relax to the transformed granularity (``ts > X`` keeps the
        whole day-partition holding X); the residual row filter restores
        exactness. Listing is driver-side and O(partition dirs) — the same
        metadata-only role Iceberg gives manifest pruning. ``spec`` is the
        layout the dirs were written under (defaults to the current spec).
        """
        pcols = self._partition_cols(spec)
        if not pcols:
            return [str(r) for r in roots]
        filters = filters or []

        def matches(val: str, p: dict) -> bool:
            for col, op, bound in filters:
                if col != p["column"]:
                    continue
                t = p["transform"]
                if op == "in":
                    # dir survives iff its value matches ANY member's
                    # rendering; an unrenderable member makes the whole
                    # IN unprunable (residual row filter restores exactness)
                    opts = []
                    prunable = True
                    for b in bound:
                        r = _bucket_of(b, t) if t.startswith("bucket[") else _transform_bound(b, t)
                        if r is None:
                            prunable = False
                            break
                        opts.append(r)
                    if prunable and all(_cmp_vals(val, r) != 0 for r in opts):
                        return False
                    continue
                if op == "=" and t.startswith("bucket["):
                    b = _bucket_of(bound, t)
                    if b is not None and val != b:
                        return False
                    continue
                rendered = _transform_bound(bound, t)
                if rendered is None:
                    continue
                c = _cmp_vals(val, rendered)
                if op == "=" and c != 0:
                    return False
                if op in (">=", ">") and c < 0:
                    return False
                if op in ("<=", "<") and c > 0:
                    return False
                # strict bounds are exact on injective transforms, and a
                # strict upper bound at the exact partition floor excludes
                # the boundary partition (half-open range idiom)
                if c == 0 and op in ("<", ">") and t == "identity":
                    return False
                if c == 0 and op == "<" and _at_partition_floor(bound, t):
                    return False
            return True

        leaves: list[str] = []

        def descend(path: Path, level: int) -> None:
            if level == len(pcols):
                leaves.append(str(path))
                return
            name, p = pcols[level]
            prefix = name + "="
            matched_any = False
            for child in sorted(path.iterdir()):
                if child.is_dir() and child.name.startswith(prefix):
                    matched_any = True
                    val = unquote(child.name[len(prefix):])
                    if matches(val, p):
                        descend(child, level + 1)
            if not matched_any:
                # dir written before this partition level existed (legacy /
                # enforcement-disabled write) — unprunable, scan it whole
                leaves.append(str(path))

        for root in roots:
            if not root.exists():
                continue
            # a root may itself be a partition SUBPATH (partition-scoped
            # compaction keeps a split dir's unmatched leaves as direct
            # references): resume the descent at the level the subpath
            # already sits at, and let filters prune on its own segments
            level = 0
            pruned = False
            try:
                rel_parts = root.relative_to(self.data_dir).parts[1:]
            except ValueError:
                rel_parts = ()
            for seg in rel_parts:
                if level < len(pcols) and seg.startswith(pcols[level][0] + "="):
                    name, p = pcols[level]
                    if not matches(unquote(seg[len(name) + 1:]), p):
                        pruned = True
                        break
                    level += 1
            if not pruned:
                descend(root, level)
        return leaves

    def _empty_declared(self, spark: SparkSession) -> DataFrame:
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField(c["name"], _declared_spark_type(c["type"]))
                for c in self.meta.get("columns", [])
            ]
        )
        return spark.createDataFrame([], schema)

    @staticmethod
    def _apply_row_filters(df: DataFrame, filters: list[tuple] | None) -> DataFrame:
        if not filters:
            return df
        from pyspark.sql import functions as F

        ops = {
            "=": lambda c, v: c == v,
            ">=": lambda c, v: c >= v,
            ">": lambda c, v: c > v,
            "<=": lambda c, v: c <= v,
            "<": lambda c, v: c < v,
        }
        for col, op, value in filters:
            if op == "in":
                vals = list(value)
                if not vals:
                    # Column.isin() with zero args raises; an empty IN list
                    # matches nothing — same verdict _dirs_survive reaches
                    # for directory pruning.
                    df = df.filter(F.lit(False))
                else:
                    df = df.filter(F.col(col).isin(*[F.lit(v) for v in vals]))
            else:
                df = df.filter(ops[op](F.col(col), F.lit(value)))
        return df

    def read(
        self,
        spark: SparkSession,
        snapshot_id: str | None = None,
        as_of_ms: int | None = None,
        filters: list[tuple] | None = None,
        tag: str | None = None,
    ) -> DataFrame:
        """Read the table — current state, or time-travel by id/timestamp,
        or at a named tag (Iceberg's ``VERSION AS OF 'v1'``).

        ``filters`` — optional ``(column, op, value)`` conjuncts — prune
        partition directories BEFORE Spark ever lists a file (hidden
        partitioning: predicates on the source column skip non-matching
        ``day(ts)``/``hour(ts)`` folders, the reference's headline read
        optimization, ``docs/table-template-reference.md:133-168``), then
        re-apply as row filters for exact semantics.

        After a schema evolution (:meth:`evolve_add_column`), directories
        written before the evolution lack the new columns; ``mergeSchema``
        unions the file schemas and the unconditional declared-schema
        projection fills the gaps with typed NULLs — Iceberg's read-time
        schema resolution.
        """
        if tag is not None:
            if snapshot_id is not None or as_of_ms is not None:
                raise ValueError("read: pass at most one of tag/snapshot_id/as_of_ms")
            snapshot_id = self.tag(tag)["snapshot_id"]
        snap = self._snapshot_for(snapshot_id, as_of_ms)
        log_audit_event(
            "table_read", self.fq_name, details={"snapshot_id": snap["snapshot_id"]}
        )
        if not snap["data_dirs"]:
            # a committed snapshot CAN be legitimately empty (delete-all
            # then compact materializes to zero files): DELETE FROM t;
            # SELECT * must serve 0 typed rows, not an error
            return self._apply_row_filters(self._empty_declared(spark), filters)
        # merge-on-read: equality-delete files (Iceberg v2) are applied at
        # read time as an anti-join on the key columns — each snapshot
        # carries exactly the delete files committed up to it, so time
        # travel before a MoR delete still serves the deleted rows.
        # SEQUENCE SCOPING (Iceberg's rule): a delete file applies only to
        # data files with a STRICTLY LOWER commit sequence — a MoR upsert
        # commits its delete keys and replacement rows together, and the
        # delete must not erase its own replacements.
        ddirs = snap.get("delete_dirs") or []
        if not ddirs:
            return self._read_dirs(spark, snap["data_dirs"], filters)
        intro = self._dir_intro_seqs()
        groups: dict[frozenset, list[str]] = {}
        for d in snap["data_dirs"]:
            applicable = frozenset(
                dd for dd in ddirs if intro.get(dd, -1) > intro.get(d, -1)
            )
            groups.setdefault(applicable, []).append(d)
        parts = []
        for applicable, dirs_ in groups.items():
            df = self._read_dirs(spark, dirs_, filters)
            if applicable:
                keys = self._read_delete_keys(spark, sorted(applicable))
                df = df.join(keys, on=list(keys.columns), how="left_anti")
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def register(
        self,
        spark: SparkSession,
        name: str | None = None,
        access_level: str = "admin",
        row_policies: dict[str, str] | None = None,
        snapshot_id: str | None = None,
        as_of_ms: int | None = None,
        tag: str | None = None,
        metadata_tables: bool | None = None,
        follow_head: bool = False,
    ) -> str:
        """The SQL front door: expose the GOVERNED table read plus its
        Iceberg-style metadata tables to ``spark.sql`` as session temp
        views — the reference's user-facing promise is plain SQL against
        the lakehouse, including time travel (Athena named queries,
        ``aws/modules/athena/main.tf:26-67``; the flagship example,
        ``docs/bring-your-own-data.md:83-90``).

        Registers:

        - ``<name>`` — the governed read. ``access_level='reader'`` drops
          restricted columns INSIDE the view plan (Catalyst prunes them
          before the scan — ``spark.sql`` output can never name them) and
          applies ``row_policies`` ({policy: SQL predicate}) as pushed
          filters;
        - ``<name>__snapshots`` / ``__history`` / ``__files`` /
          ``__partitions`` / ``__delete_files`` / ``__refs`` — the
          metadata tables.
          ``metadata_tables=None`` (the default) resolves to True for
          admin/writer and **False for reader** — ``__files`` carries
          actual min/max data values in ``column_bounds`` and
          ``__partitions`` carries partition values, so publishing them
          to a reader by default would bypass the restricted-column
          guarantee through the side door. An explicit
          ``metadata_tables=True`` at reader level registers them with
          restricted columns REDACTED from both the bounds JSON and the
          partition values (never their names or values).

        Time travel registers the same way: ``snapshot_id``/``as_of_ms``/
        ``tag`` with a distinct ``name`` gives Athena's ``FOR TIMESTAMP AS
        OF`` named-query shape. Views are SESSION-scoped and by default pin
        the snapshot resolved at registration time — re-register after
        writes to serve the new head (the scheduled-refresh cadence the
        runbook's view maintenance uses). ``follow_head=True`` matches
        Athena's actual contract instead: every commit made through this
        process re-resolves and re-registers the view (the write path
        funnels through ``_commit``), so ``spark.sql`` always reads the
        current committed state — including the MoR view after
        equality-delete commits. Follow-head excludes the time-travel
        arguments (a pinned snapshot cannot also track the head) and costs
        one view re-resolution per commit (plus the metadata-table rebuild
        when those are registered — leave them off on hot write paths).
        Follow-head is PROCESS-LOCAL: temp views are Spark session objects
        and the refresh hook fires only for commits made through this
        process's table handles — for multi-process serving use
        ``Lakehouse.sql``, which head-probes the commit log per statement
        (one directory listing) and re-registers on any unseen commit,
        whoever made it. Returns the base view name.

        Audit granularity: the underlying ``table_read`` plus a
        ``table_registered`` event log at REGISTRATION time; subsequent
        ``spark.sql`` statements against the view are not individually
        audited (Spark has no per-query view-access hook) — the same
        granularity the reference gets from Athena, where per-query audit
        lives in the engine's own CloudTrail/warehouse logs, not the
        application layer.
        """
        from iceberg_quickstart_iac_spark.governance.access import (
            AccessLevel,
            read_with_access_level,
            read_with_row_policies,
        )
        from iceberg_quickstart_iac_spark.templates.loader import (
            get_restricted_columns,
        )

        level = AccessLevel(access_level)
        if metadata_tables is None:
            metadata_tables = level is not AccessLevel.READER
        if follow_head and (snapshot_id or as_of_ms or tag):
            raise ValueError(
                "register(follow_head=True) tracks the current head — it "
                "cannot combine with snapshot_id/as_of_ms/tag pinning"
            )
        base = name or self.meta["name"]
        df = self.read(
            spark, snapshot_id=snapshot_id, as_of_ms=as_of_ms, tag=tag
        )
        df = read_with_access_level(
            df, self.meta, access_level, table=self.fq_name
        )
        df = read_with_row_policies(
            df, row_policies or {}, access_level, table=self.fq_name
        )
        df.createOrReplaceTempView(base)
        if metadata_tables:
            redact = (
                set(get_restricted_columns(self.meta))
                if level is AccessLevel.READER
                else None
            )
            self.snapshots(spark).createOrReplaceTempView(f"{base}__snapshots")
            self.history(spark).createOrReplaceTempView(f"{base}__history")
            self.files(spark, redact_columns=redact).createOrReplaceTempView(
                f"{base}__files"
            )
            self.partitions(
                spark, redact_columns=redact
            ).createOrReplaceTempView(f"{base}__partitions")
            self.delete_files(spark).createOrReplaceTempView(
                f"{base}__delete_files"
            )
            self.refs(spark).createOrReplaceTempView(f"{base}__refs")
        if follow_head:
            # a view name tracks exactly ONE table: if another table root
            # holds a follow-head registration under this name, drop it —
            # otherwise commits on either table would silently thrash the
            # view between two tables' heads (last committer wins)
            own = _head_reg_key(self.root)
            for root_key, specs in _HEAD_REGISTRATIONS.items():
                if root_key != own:
                    specs.pop(base, None)
            _HEAD_REGISTRATIONS.setdefault(_head_reg_key(self.root), {})[base] = {
                "table": self,
                "spark": spark,
                "access_level": access_level,
                "row_policies": dict(row_policies or {}),
                "metadata_tables": metadata_tables,
            }
        log_audit_event(
            "table_registered",
            self.fq_name,
            details={
                "view": base,
                "access_level": str(access_level),
                "metadata_tables": metadata_tables,
                "time_travel": bool(snapshot_id or as_of_ms or tag),
                "follow_head": follow_head,
            },
        )
        return base

    def register_changes(
        self,
        spark: SparkSession,
        from_snapshot_id: str,
        to_snapshot_id: str | None = None,
        name: str | None = None,
        access_level: str = "admin",
        row_policies: dict[str, str] | None = None,
        follow_head: bool = False,
    ) -> str:
        """Register the row-level changelog between two snapshots
        (:meth:`read_changes` — Delta CDF / Iceberg changelog-scan
        analog) as a SQL view ``<name>__changes``: the front-door shape
        of "what changed since the last publish", queryable with plain
        SQL next to the head and time-travel views. Governance applies to
        the changelog exactly as to reads — a reader's restricted columns
        are dropped from the change rows inside the view plan, and row
        policies filter both the insert and delete sides (a reader must
        not learn a restricted row existed by seeing its delete).

        By default the view pins the two snapshots resolved here.
        ``follow_head=True`` is the live-CDC-feed shape (Delta CDF's
        ``readChangeFeed`` with ``startingVersion``): the interval START
        stays fixed at ``from_snapshot_id`` and the END re-resolves to
        the current head on every commit made through this process, so
        the view always serves "everything changed since the anchor".
        Follow-head excludes ``to_snapshot_id`` (a pinned end cannot also
        track the head) and, like :meth:`register`, is process-local —
        temp views are session objects."""
        from iceberg_quickstart_iac_spark.governance.access import (
            read_with_access_level,
            read_with_row_policies,
        )

        if follow_head and to_snapshot_id is not None:
            raise ValueError(
                "register_changes(follow_head=True) tracks the head as the "
                "interval end — it cannot combine with to_snapshot_id"
            )
        base = (name or self.meta["name"]) + "__changes"
        df = self.read_changes(spark, from_snapshot_id, to_snapshot_id)
        df = read_with_access_level(
            df, self.meta, access_level, table=self.fq_name
        )
        df = read_with_row_policies(
            df, row_policies or {}, access_level, table=self.fq_name
        )
        df.createOrReplaceTempView(base)
        if follow_head:
            # same name-takeover guard as register(): one view name tracks
            # exactly one table root
            own = _head_reg_key(self.root)
            for root_key, specs in _HEAD_REGISTRATIONS.items():
                if root_key != own:
                    specs.pop(base, None)
            _HEAD_REGISTRATIONS.setdefault(own, {})[base] = {
                "table": self,
                "spark": spark,
                "access_level": access_level,
                "row_policies": dict(row_policies or {}),
                "kind": "changes",
                "from_snapshot_id": from_snapshot_id,
                # strip the suffix: the refresh passes name= back in and
                # register_changes re-appends __changes
                "name": (name or self.meta["name"]),
            }
        log_audit_event(
            "table_registered",
            self.fq_name,
            details={
                "view": base,
                "access_level": str(access_level),
                "changelog": True,
                "from_snapshot": from_snapshot_id,
                "to_snapshot": to_snapshot_id,
            },
        )
        return base

    def unregister(self, spark: SparkSession, name: str | None = None) -> None:
        """Drop a registration's views and, if it was follow-head, stop
        tracking commits for it."""
        base = name or self.meta["name"]
        specs = _HEAD_REGISTRATIONS.get(_head_reg_key(self.root), {})
        specs.pop(base, None)
        specs.pop(base + "__changes", None)  # follow-head changelog spec
        for suffix in ("", "__snapshots", "__files", "__partitions",
                       "__delete_files", "__refs", "__changes"):
            spark.catalog.dropTempView(base + suffix)

    def _refresh_head_registrations(self) -> None:
        """Re-resolve every follow-head view on this table root against the
        just-committed state. Uses each registration's OWN table handle (a
        branch view re-resolves its branch head, the main table its own), so
        a commit on either never serves the other's rows."""
        import warnings

        specs = _HEAD_REGISTRATIONS.get(_head_reg_key(self.root), {})
        for base, spec in list(specs.items()):
            try:
                if spec.get("kind") == "changes":
                    # live changelog view: fixed interval start, end
                    # re-resolves to the just-committed head
                    spec["table"].register_changes(
                        spec["spark"],
                        spec["from_snapshot_id"],
                        name=spec["name"],
                        access_level=spec["access_level"],
                        row_policies=spec["row_policies"],
                        follow_head=True,
                    )
                    continue
                spec["table"].register(
                    spec["spark"],
                    name=base,
                    access_level=spec["access_level"],
                    row_policies=spec["row_policies"],
                    metadata_tables=spec["metadata_tables"],
                    follow_head=True,
                )
            except Exception as exc:  # noqa: BLE001 — the COMMIT landed;
                # a dead SparkSession in the registry must not make the
                # write look failed. Drop the registration and warn loudly.
                specs.pop(base, None)
                warnings.warn(
                    f"follow-head view {base!r} on {self.fq_name} could not "
                    f"be refreshed and was dropped: {exc}",
                    stacklevel=2,
                )

    def _read_delete_keys(self, spark: SparkSession, ddirs: list[str]) -> DataFrame:
        """Load equality-delete key tuples from ``ddirs``, with every key
        column resolved BY FIELD ID to its CURRENT declared name — the
        same id-first resolution data files get in :meth:`_read_dirs`.
        Each delete dir carries a ``_key_ids.json`` sidecar (name→field id
        at write time); without it, a rename of an identifier field after
        a MoR delete would break every subsequent read (the anti-join
        would look for the old column name). Dirs sharing one rename map
        are scanned together, so the common no-rename case stays a single
        parquet scan regardless of delete-file count."""
        from pyspark.sql import functions as F

        id_to_name = {
            c["id"]: c["name"]
            for c in self.meta.get("columns", [])
            if c.get("id") is not None
        }
        groups: dict[tuple, tuple[dict | None, list[str]]] = {}
        for dd in ddirs:
            sidecar = self.data_dir / dd / "_key_ids.json"
            renames: dict[str, str] | None = None
            if sidecar.exists():
                renames = {}
                for written, fid in json.loads(sidecar.read_text()).items():
                    current = id_to_name.get(fid) if fid is not None else written
                    if current is None:
                        raise ValueError(
                            f"MoR delete file {dd} on {self.fq_name} is keyed "
                            f"on field id {fid} ({written!r} at write time), "
                            "which is no longer a declared column"
                        )
                    renames[written] = current
            key = tuple(sorted(renames.items())) if renames is not None else ("__legacy__",)
            groups.setdefault(key, (renames, []))[1].append(str(self.data_dir / dd))
        parts = []
        for renames, paths in groups.values():
            df = spark.read.parquet(*paths)
            if renames:
                df = df.select(
                    *[F.col(c).alias(renames.get(c, c)) for c in df.columns]
                )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.dropDuplicates()

    def _written_name(self, name: str, written_ids: dict | None) -> str | None:
        """The file-column name serving declared column ``name`` in a dir
        epoch written under ``written_ids`` — field-id resolution, the same
        rules as :meth:`_project_declared` (rename-safe; a dropped-then-
        re-added name resolves to None against pre-drop files). None means
        the column has no source in that epoch (reads as NULL)."""
        declared = next(
            (c for c in self.meta.get("columns", []) if c["name"] == name), None
        )
        if written_ids is None or declared is None:
            return name
        if declared.get("id") is not None:
            for fname, fid in written_ids.items():
                if fid == declared["id"]:
                    return fname
            if written_ids.get(name, "∅") is None:
                return name  # legacy files written before field ids
            return None
        return name if name in written_ids else None

    def _translate_filters(
        self, filters: list[tuple], written_ids: dict | None
    ) -> list[tuple] | None:
        """Rewrite filter column names into one dir epoch's WRITTEN names
        (a filter on a renamed column must compare against the old file
        column in pre-rename dirs). None = some filtered column does not
        exist in this epoch — it reads as typed NULL, no comparison can
        hold, the whole epoch is prunable."""
        out = []
        for col, op, value in filters:
            wname = self._written_name(col, written_ids)
            if wname is None:
                return None
            out.append((wname, op, value))
        return out

    def _read_dirs(
        self, spark: SparkSession, dirs: list[str], filters: list[tuple] | None
    ) -> DataFrame:
        """Scan ``dirs``, grouped by the write epoch (field ids + declared
        types + partition spec) they were written under — almost always one
        group, so the plan stays a single parquet scan. Per group: filters
        are translated to the epoch's written column names, partition dirs
        are pruned against the epoch's own recorded layout, rows are
        filtered, and the result is field-id-projected (and cast) to the
        declared schema before ``unionByName`` across epochs. Separate
        type epochs keep a widened column (int files + long files) out of a
        single ``mergeSchema`` scan, which Spark cannot merge."""
        dir_epochs = self._dir_epochs()
        groups: dict[str, tuple[dict | None, list[Path]]] = {}
        for d in dirs:
            epoch = dir_epochs.get(d)
            key = (
                json.dumps(epoch, sort_keys=True) if epoch is not None else "__legacy__"
            )
            groups.setdefault(key, (epoch, []))[1].append(self.data_dir / d)
        parts: list[DataFrame] = []
        for epoch, roots in groups.values():
            ids = epoch["column_ids"] if epoch is not None else None
            spec = epoch.get("partition_spec") if epoch is not None else None
            gfilters = filters or []
            if filters:
                gfilters = self._translate_filters(filters, ids)
                if gfilters is None:
                    # a filtered column absent from this epoch's files reads
                    # as NULL — no comparison predicate can hold, skip
                    continue
            paths = self._leaf_dirs(roots, gfilters, spec)
            # a zero-row write on a PARTITIONED table lands a dir with no
            # data files at all (partitionBy emits nothing, not even a
            # schema-only file — TRUNCATE and full CoW DELETE both hit
            # this): loading it would fail schema inference. One driver
            # directory listing per leaf — the same listing the scan is
            # about to do anyway.
            paths = [p for p in paths if _list_data_files(Path(p))]
            if not paths:
                continue
            fmt = (epoch or {}).get("write_format") or "parquet"
            scan: list[str] = list(paths)
            if gfilters and fmt == "orc":
                # ORC gets NO file-level min/max skipping: pyarrow.orc
                # exposes stripe-statistics lengths but not their values,
                # so there is nothing cheap to prune on. Losing the
                # read-side payoff of a sort_order silently would be worse
                # than the miss itself — warn loudly, once per table.
                import warnings

                if self.root not in _ORC_SKIP_WARNED:
                    _ORC_SKIP_WARNED.add(self.root)
                    warnings.warn(
                        f"Filtered read on ORC table {self.fq_name}: "
                        "file-level min/max skipping is parquet-only "
                        "(pyarrow exposes no ORC stripe statistic values) "
                        "— every file in the pruned partitions will be "
                        "scanned. Prefer write_format: parquet for "
                        "read-heavy sorted tables.",
                        stacklevel=3,
                    )
            if gfilters and fmt == "parquet":
                # FILE-level min/max skipping (Iceberg manifest-stats
                # pruning at dir-manifest granularity): after partition
                # dirs are pruned, parquet footer statistics on the
                # filtered columns drop whole files — the read-side
                # payoff of write-time sort_order clustering. Driver-side
                # metadata only, O(files); unknown/missing stats keep the
                # file.
                files = [
                    f for p_ in paths for f in sorted(Path(p_).rglob("*.parquet"))
                ]
                kept = [
                    str(f) for f in files if _footer_stats_match(f, gfilters)
                ]
                if not kept:
                    continue
                if len(kept) < len(files):
                    scan = kept
            # mergeSchema only where merging can differ from one footer:
            # within a non-legacy epoch group every file was written under
            # the SAME declared types (the write path casts before writing
            # — see _write_data), so schema inference from one footer is
            # exact and skips the all-footers merge job Spark otherwise
            # runs per read — a fixed driver cost on EVERY table read
            # (r14, guide §1.2 per-task work; lifecycles pay it 5-10x per
            # query). Legacy dirs (schema enforcement disabled) keep the
            # merge: their files carry no epoch guarantee.
            merge = "true" if epoch is None else "false"
            df = spark.read.option("mergeSchema", merge).format(fmt).load(scan)
            if gfilters and any(col not in df.columns for col, _, _ in gfilters):
                continue
            df = self._apply_row_filters(df, gfilters)
            parts.append(self._project_declared(df, ids))
        if not parts:
            return self._apply_row_filters(self._empty_declared(spark), filters)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

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

    def history(self, spark: SparkSession) -> DataFrame:
        """The table-history metadata table (M1), like Iceberg's
        ``t.history``: one row per commit with ``is_current_ancestor``
        marking whether the HEAD's state still derives from it.

        Snapstore's log is linear (a rollback is itself a commit), so the
        divergence Iceberg expresses through parent pointers is encoded in
        the rollback entries' ``rollback_of`` stamp: walking back from the
        head, a rollback jumps to its target — everything between the two
        left the head lineage exactly like Iceberg snapshots orphaned by
        ``rollback_to_snapshot`` (is_current_ancestor = false). Entries
        committed before the stamp existed degrade to the linear walk
        (every commit ancestral — the pre-upgrade behavior, conservative).
        Metadata-only: reads the commit log, never data files.
        """
        entries = self._entries()
        seq_to_idx = {e["sequence"]: i for i, e in enumerate(entries)}
        ancestors: set[int] = set()
        i = len(entries) - 1
        while i >= 0:
            e = entries[i]
            ancestors.add(e["sequence"])
            target = e.get("rollback_of")
            if (
                e.get("operation") == "rollback"
                and target in seq_to_idx
                and target < e["sequence"]  # set_current_snapshot can jump
                # FORWARD; only a backward jump orphans the span between
            ):
                i = seq_to_idx[target]
            else:
                i -= 1
        return spark.createDataFrame(
            [
                (
                    e["committed_at_ms"],
                    e["snapshot_id"],
                    e["parent_id"],
                    e["sequence"],
                    e["operation"],
                    e["sequence"] in ancestors,
                )
                for e in entries
            ],
            "made_current_at_ms LONG, snapshot_id STRING, parent_id STRING, "
            "sequence LONG, operation STRING, is_current_ancestor BOOLEAN",
        )

    def files(
        self,
        spark: SparkSession,
        snapshot_id: str | None = None,
        redact_columns: set[str] | None = None,
    ) -> DataFrame:
        """The per-file metadata table (M1), like Iceberg's ``t.files``:
        one row per data file of the selected (default current) snapshot
        with its partition values, record count, size, and per-column
        value bounds (Iceberg's ``lower_bounds``/``upper_bounds`` — the
        stats the file-skipping read path prunes on, surfaced for audits:
        "which files would a predicate touch?"). Driver-side metadata
        only (footers + paths), O(files), no data scan — exactly what
        Iceberg serves from manifests. Bounds are JSON ``{col: [lo, hi]}``
        strings (parquet files only; ORC reports ``{}``).

        ``redact_columns`` removes those columns' entries from BOTH the
        ``partition`` values and ``column_bounds`` JSON — min/max bounds
        are actual data values, so a reader-level registration must not
        publish them for restricted columns (Lake Formation redacts file
        stats the same way for cell-filtered tables).
        """
        snap = self._snapshot_for(snapshot_id, None)
        redact = redact_columns or set()

        def _partition_key_redacted(key: str) -> bool:
            # partition path keys are PHYSICAL field names: __p_<col> for
            # identity, __p_<col>_<transform> otherwise (any historical
            # spec) — a key derived from a restricted source column must
            # redact; startswith over-matching only ever over-redacts
            return any(
                key == self._PPREFIX + c or key.startswith(self._PPREFIX + c + "_")
                for c in redact
            )

        def _redact_path(p: str) -> str:
            # file_path and data_dir embed the same ``__p_<col>=<value>``
            # segments the partition JSON parses from — a restricted
            # partition column's VALUES must not leak through the path
            # columns either (the docstring's "never their names or
            # values" guarantee applies to every emitted column)
            if not redact:
                return p
            out = []
            for seg in p.split("/"):
                if "=" in seg:
                    k, _, _v = seg.partition("=")
                    if _partition_key_redacted(k):
                        seg = k + "=<redacted>"
                out.append(seg)
            return "/".join(out)

        rows = []
        for d in snap["data_dirs"]:
            base = self.data_dir / d
            # partition values parse from the path BELOW the top-level dir
            # so a subpath reference (partition-scoped compaction) still
            # reports the segments baked into the reference itself
            top = self.data_dir / d.split("/", 1)[0]
            for f in _list_data_files(base):
                parts = {}
                for seg in f.relative_to(top).parts[:-1]:
                    if "=" in seg:
                        k, _, v = seg.partition("=")
                        if not _partition_key_redacted(k):
                            parts[k] = unquote(v)
                bounds = {
                    c: b
                    for c, b in _footer_bounds(f).items()
                    if c not in redact
                }
                rows.append(
                    (
                        _redact_path(str(f.relative_to(self.root))),
                        _redact_path(d),
                        json.dumps(parts, sort_keys=True),
                        _footer_row_count([f]),
                        f.stat().st_size,
                        json.dumps(bounds, sort_keys=True, default=str),
                    )
                )
        return spark.createDataFrame(
            rows,
            "file_path STRING, data_dir STRING, partition STRING, "
            "record_count LONG, file_size_bytes LONG, column_bounds STRING",
        )

    def delete_files(
        self, spark: SparkSession, snapshot_id: str | None = None
    ) -> DataFrame:
        """The equality-delete-file metadata table (Iceberg's
        ``t.delete_files``): one row per delete file of the selected
        snapshot with its key count and the commit sequence scoping which
        data files it applies to — the read-amplification audit for MoR
        tables (big counts here = time to :meth:`compact`). Metadata-only:
        footers + paths, no data scan."""
        snap = self._snapshot_for(snapshot_id, None)
        intro = self._dir_intro_seqs()
        rows = []
        for d in snap.get("delete_dirs") or []:
            base = self.data_dir / d
            files = _list_data_files(base) if base.is_dir() else []
            rows.append(
                (
                    d,
                    intro.get(d),
                    _footer_row_count(files) if files else 0,
                    sum(f.stat().st_size for f in files),
                )
            )
        return spark.createDataFrame(
            rows,
            "delete_dir STRING, applies_after_sequence LONG, "
            "key_count LONG, file_size_bytes LONG",
        )

    def partitions(
        self,
        spark: SparkSession,
        snapshot_id: str | None = None,
        redact_columns: set[str] | None = None,
    ) -> DataFrame:
        """The per-partition metadata table (M1), like Iceberg's
        ``t.partitions``: one row per live partition with its record/file
        counts and byte size — the skew/small-file audit surface (Athena
        exposes the same as ``"t$partitions"``). An aggregation over
        :meth:`files` (``redact_columns`` passes through — a restricted
        partition column's values must not appear in the partition key),
        so still metadata-only: footers and paths, never a data scan."""
        from pyspark.sql import functions as F

        return (
            self.files(spark, snapshot_id, redact_columns=redact_columns)
            .groupBy("partition")
            .agg(
                F.count(F.lit(1)).alias("file_count"),
                F.sum("record_count").alias("record_count"),
                F.sum("file_size_bytes").alias("total_size_bytes"),
            )
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
        fid = meta.get("next_field_id", max((c.get("id") or 0) for c in cols) + 1 if cols else 1)
        cols.append({"name": name, "type": col_type, "doc": doc, "id": fid})
        meta["columns"] = cols
        meta["next_field_id"] = fid + 1
        self._write_meta(meta)
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
        self._write_meta(meta)
        log_audit_event(
            "schema_evolution",
            self.fq_name,
            details={"change": "drop_column", "column": name},
        )
        return meta

    #: Iceberg-safe type promotions (spec §Schema Evolution): widening only,
    #: so every already-written value remains exactly representable
    _SAFE_PROMOTIONS = {
        ("int", "long"),
        ("int", "bigint"),
        ("integer", "long"),
        ("integer", "bigint"),
        ("float", "double"),
    }

    def evolve_rename_column(self, old: str, new: str) -> dict:
        """RENAME COLUMN — metadata-only and SAFE under field ids: the
        declared column keeps its id, and reads resolve file columns BY ID,
        so data written under the old name keeps serving the renamed
        column (Iceberg rename semantics — no rewrite, no data loss,
        unlike Hive-style name-based tables where a rename orphans every
        old file's values)."""
        meta = self.meta
        cols = meta.get("columns", [])
        if not any(c["name"] == old for c in cols):
            raise ValueError(f"Column {old!r} does not exist on {self.fq_name}")
        if any(c["name"] == new for c in cols):
            raise ValueError(f"Column {new!r} already exists on {self.fq_name}")
        for c in cols:
            if c["name"] == old:
                c["name"] = new
        meta["columns"] = cols
        # partition_spec / sort_order entries are keyed by NAME here (unlike
        # Iceberg's id-based specs) — rename them too, or subsequent writes
        # silently become unpartitioned/unsorted (the spec filter drops
        # entries whose column is absent from the frame)
        for p in meta.get("partition_spec") or []:
            if p.get("column") == old:
                p["column"] = new
        for o in meta.get("sort_order") or []:
            if o.get("column") == old:
                o["column"] = new
        # identifier_fields too — or the next MoR delete/upsert on a
        # renamed key column fails its declared-column validation
        if meta.get("identifier_fields"):
            meta["identifier_fields"] = [
                new if f == old else f for f in meta["identifier_fields"]
            ]
        self._write_meta(meta)
        log_audit_event(
            "schema_evolution",
            self.fq_name,
            details={"change": "rename_column", "from": old, "to": new},
        )
        return meta

    def evolve_widen_column(self, name: str, new_type: str) -> dict:
        """Widen a column's type (int→long, float→double) — the promotions
        the Iceberg spec allows because every written value stays exactly
        representable. Metadata-only: the declared-schema projection casts
        old files up on read. Narrowing or cross-family changes raise."""
        meta = self.meta
        cols = meta.get("columns", [])
        target = next((c for c in cols if c["name"] == name), None)
        if target is None:
            raise ValueError(f"Column {name!r} does not exist on {self.fq_name}")
        if (target["type"], new_type) not in self._SAFE_PROMOTIONS:
            raise ValueError(
                f"Unsafe type change {target['type']!r} -> {new_type!r} on "
                f"{self.fq_name}.{name}: only widening promotions "
                f"{sorted(self._SAFE_PROMOTIONS)} preserve written values"
            )
        target["type"] = new_type
        meta["columns"] = cols
        self._write_meta(meta)
        log_audit_event(
            "schema_evolution",
            self.fq_name,
            details={"change": "widen_column", "column": name, "type": new_type},
        )
        return meta

    _TRANSFORM_RE = re.compile(
        r"^(identity|year|month|day|hour|bucket\[\d+\]|truncate\[\d+\])$"
    )

    def evolve_sort_order(self, order: list[dict]) -> dict:
        """Replace the declared write-time sort order (Iceberg's
        ``ALTER TABLE … WRITE ORDERED BY``). Metadata-only and forward-
        looking: existing files keep their layout; subsequent writes and
        compactions cluster by the new order. Entries are
        ``{"column", "direction" (asc|desc), "null_order"
        (nulls_first|nulls_last)}`` — the template's sort_order shape."""
        declared = {c["name"] for c in self.meta.get("columns", [])}
        for o in order:
            if o.get("column") not in declared:
                raise ValueError(
                    f"evolve_sort_order: unknown column {o.get('column')!r} "
                    f"on {self.fq_name}"
                )
            if o.get("direction", "asc") not in ("asc", "desc"):
                raise ValueError(f"evolve_sort_order: bad direction in {o}")
            if o.get("null_order", "nulls_first") not in (
                "nulls_first", "nulls_last"
            ):
                raise ValueError(f"evolve_sort_order: bad null_order in {o}")
        meta = self.meta
        meta["sort_order"] = [dict(o) for o in order]
        self._write_meta(meta)
        log_audit_event(
            "schema_evolution",
            self.fq_name,
            details={"change": "sort_order", "order": order},
        )
        return meta

    def evolve_partition_spec(self, new_spec: list[dict]) -> dict:
        """Change how the table is partitioned WITHOUT rewriting any data —
        the partition-spec evolution the reference advertises as a core
        Iceberg capability (``docs/architecture.md:11``,
        ``docs/deep-dive.md:66-72``) but never implements.

        Metadata-only, like Iceberg: every commit entry records the spec it
        was written under, so existing data directories keep their physical
        layout and are pruned by their OWN recorded spec, while writes from
        now on lay out (and prune) under the new spec. A query filtering on
        a newly added transform column prunes the new epoch's directories
        and falls back to scan-plus-row-filter on the old ones — exactly
        Iceberg's split-planning across specs.
        """
        declared = {c["name"] for c in self.meta.get("columns", [])}
        for p in new_spec:
            if "column" not in p or "transform" not in p:
                raise ValueError(
                    f"Partition spec entries need 'column' and 'transform': {p!r}"
                )
            if declared and p["column"] not in declared:
                raise ValueError(
                    f"Partition column {p['column']!r} is not declared on {self.fq_name}"
                )
            if not self._TRANSFORM_RE.match(p["transform"]):
                raise ValueError(f"Unknown partition transform: {p['transform']!r}")
        meta = self.meta
        old_spec = meta.get("partition_spec") or []
        meta["partition_spec"] = list(new_spec)
        self._write_meta(meta)
        log_audit_event(
            "schema_evolution",
            self.fq_name,
            details={"change": "partition_spec", "from": old_spec, "to": new_spec},
        )
        return meta

    def set_properties(self, props: dict) -> dict:
        """Merge table properties (Iceberg's ``ALTER TABLE … SET
        TBLPROPERTIES``). Metadata-only; keys overwrite, others keep."""
        meta = self.meta
        old = dict(meta.get("properties", {}))
        meta.setdefault("properties", {}).update(
            {str(k): str(v) for k, v in props.items()}
        )
        self._write_meta(meta)
        log_audit_event(
            "schema_evolution",
            self.fq_name,
            details={"change": "set_properties", "from": old,
                     "to": meta["properties"]},
        )
        return meta

    def unset_properties(self, keys: list[str]) -> dict:
        """Remove table properties (``ALTER TABLE … UNSET TBLPROPERTIES``).
        Unknown keys are ignored, like Iceberg's IF EXISTS behavior."""
        meta = self.meta
        old = dict(meta.get("properties", {}))
        for k in keys:
            meta.get("properties", {}).pop(str(k), None)
        self._write_meta(meta)
        log_audit_event(
            "schema_evolution",
            self.fq_name,
            details={"change": "unset_properties", "from": old,
                     "to": meta.get("properties", {})},
        )
        return meta

    def set_identifier_fields(self, fields: list[str]) -> dict:
        """Declare the row-identity columns (Iceberg's ``ALTER TABLE …
        SET IDENTIFIER FIELDS`` — the fields MoR equality deletes key
        on). Fields must be declared columns; an empty list clears."""
        meta = self.meta
        declared = {c["name"] for c in meta.get("columns", [])}
        for f in fields:
            if f not in declared:
                raise ValueError(
                    f"Identifier field {f!r} is not a declared column of "
                    f"{self.fq_name}"
                )
        old = meta.get("identifier_fields")
        if fields:
            meta["identifier_fields"] = list(fields)
        else:
            meta.pop("identifier_fields", None)
        self._write_meta(meta)
        log_audit_event(
            "schema_evolution",
            self.fq_name,
            details={"change": "identifier_fields", "from": old,
                     "to": fields or None},
        )
        return meta

    # -- incremental reads -------------------------------------------------

    def read_incremental(
        self,
        spark: SparkSession,
        from_snapshot_id: str,
        filters: list[tuple] | None = None,
        to_snapshot_id: str | None = None,
    ) -> DataFrame:
        """Rows appended AFTER ``from_snapshot_id`` (Iceberg's incremental
        append scan — the consumer side of CDC-style pipelines: checkpoint a
        snapshot id, read only what arrived since). ``to_snapshot_id``
        pins the UPPER bound (Iceberg's ``end-snapshot-id``): a streaming
        turn that captured a head must deliver exactly up to that head,
        or a commit landing mid-turn slips into the batch while the
        checkpoint records the older sequence — re-delivered next turn
        under a different batch id, un-dedupable downstream.

        Valid only across an append-only chain: an overwrite or compact
        rewrites the visible set, so "new rows" is no longer the directory
        delta — those chains raise and the caller falls back to a full read.

        Goes through the same scan path as :meth:`read` — partition pruning
        from ``filters``, field-id declared-schema projection — so
        incremental consumers see EXACTLY the schema a full read would give
        (a dropped column stays dropped; appends that predate an
        ``evolve_add_column`` carry the new column as typed NULLs).
        """
        entries = self._entries()
        ids = [e["snapshot_id"] for e in entries]
        if from_snapshot_id not in ids:
            raise ValueError(f"No snapshot {from_snapshot_id!r} in {self.fq_name}")
        start = ids.index(from_snapshot_id)
        if to_snapshot_id is not None:
            if to_snapshot_id not in ids:
                raise ValueError(
                    f"No snapshot {to_snapshot_id!r} in {self.fq_name}"
                )
            end = ids.index(to_snapshot_id)
            if end < start:
                raise ValueError(
                    f"read_incremental: to_snapshot_id {to_snapshot_id!r} "
                    f"predates from_snapshot_id {from_snapshot_id!r} on "
                    f"{self.fq_name}"
                )
            newer = entries[start + 1 : end + 1]
        else:
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
        return self._read_dirs(spark, new_dirs, filters)

    # -- maintenance -------------------------------------------------------

    def compact(
        self,
        spark: SparkSession,
        target_files: int | None = None,
        zorder: list[str] | None = None,
        partition_filter: list[tuple] | None = None,
        partition_leaves: list[str] | None = None,
    ) -> dict:
        """Rewrite the current snapshot's data into fewer files — the
        ``rewrite_data_files`` analog (SURVEY §4; Iceberg calls this
        compaction). Many small append commits → one coalesced directory;
        history before the compaction snapshot remains time-travelable
        until expired.

        ``zorder=[col, …]`` rewrites with a Morton-interleaved layout
        instead of the declared linear sort (Iceberg's
        ``strategy => 'sort', sort_order => 'zorder(a, b)'``): every
        output file gets a tight min/max bounding box on ALL the z-order
        columns, so predicates on any of them skip files — a linear sort
        only ever skips on its leading column. Range stats come from one
        tiny aggregate; the key itself is codegen bit arithmetic
        (operators/zorder.py).

        ``partition_filter=[(col, op, val), …]`` / ``partition_leaves=
        [suffix, …]`` switch to PARTITION-SCOPED compaction (Iceberg's
        ``rewrite_data_files`` with a filter — the 100 TB maintenance
        shape: rewrite only where churn concentrates, O(hot partitions),
        never O(table)). Granularity is the partition DIRECTORY: every
        leaf dir the filter can match is rewritten whole (rows in a
        matched dir that fail a relaxed range predicate are rewritten
        too — nothing is dropped). Unmatched leaves of a split dir stay
        as direct subpath references pinned to the source dir's commit
        sequence and write epoch, so MoR delete applicability and
        schema-evolution projection are unchanged for them. Delete files
        whose entire (sidecar-attributed) debt lived in rewritten
        partitions are retired from the new snapshot.
        """
        if partition_filter is not None or partition_leaves is not None:
            if target_files is not None:
                raise ValueError(
                    "partition-scoped compaction does not combine with "
                    "target_files (file count follows the scoped slice)"
                )
            return self._compact_partitions(
                spark, partition_filter, partition_leaves, zorder
            )
        current = self.current_snapshot()
        if current is None:
            raise TableNotFoundError(f"Table {self.fq_name} has no snapshots yet")
        df = self.read(spark)
        from pyspark.sql import functions as F

        if zorder:
            from iceberg_quickstart_iac_spark.operators.zorder import (
                column_ranges,
                zorder_key,
            )

            ranges = column_ranges(df, zorder)
            df = df.withColumn(
                "__z", zorder_key(zorder, [ranges[c] for c in zorder])
            )
            if not self._partition_cols():
                # unpartitioned: the z-curve IS the file layout — range
                # partition on the key so each file owns a curve segment
                n_files = (
                    target_files or df.sparkSession.sparkContext.defaultParallelism
                )
                df = df.repartitionByRange(n_files, F.col("__z"))
            # partitioned tables z-sort WITHIN each partition dir (the
            # hash repartition in _write_data keeps dir co-location)
            dir_name, rows, files = self._write_data(
                df, order_override=[F.col("__z")], drop_cols=["__z"]
            )
        else:
            if target_files is not None:
                df = df.coalesce(target_files)
            # through _write_data so the compacted copy keeps the declared
            # physical layout (partition dirs + within-partition sort order)
            dir_name, rows, files = self._write_data(df)
        entry = self._commit(
            lambda entries: {
                "operation": "compact",
                "data_dirs": [dir_name],
                "row_count": rows,
                "file_count": files,
                # lineage: which directories this rewrite ABSORBED — a
                # later cherrypick_snapshot must treat an absorbed dir's
                # rows as already present wherever this dir is referenced
                "absorbed_dirs": {dir_name: sorted(current["data_dirs"])},
                **self._write_epoch(),
            }
        )
        log_audit_event(
            "table_write",
            self.fq_name,
            details={"mode": "compact", "file_count": files, "zorder": zorder or []},
        )
        # procedure-output counts (Iceberg's rewrite_data_files reports the
        # files it touched, not table totals) — returned on a COPY, never
        # persisted to the commit log; a full compact rewrites every file
        return {
            **entry,
            "rewritten_files": int(current["file_count"]),
            "added_files": int(files),
        }

    def _leaf_suffix(self, top_dir: str, leaf: str) -> str:
        """A leaf dir's partition suffix relative to its TOP-LEVEL data
        dir, unescaped — '' for the (unpartitioned) dir itself. A data-dir
        entry that is itself a subpath (kept by an earlier partition-scoped
        compact) contributes its own partition segments, so suffixes stay
        comparable across compaction generations."""
        top = top_dir.split("/", 1)[0]
        rel = Path(leaf).relative_to(self.data_dir / top).parts
        return "/".join(unquote(s) for s in rel)

    @staticmethod
    def _suffixes_intersect(a: str, b: str) -> bool:
        """Whether two partition suffixes MAY share rows. Disjointness is
        provable only level-by-level under the SAME partition field name:
        equal names with different values → disjoint; a DIFFERENT field
        name (the suffixes render different partition-spec epochs, e.g.
        ``__p_ts_month=…`` vs ``__p_ts_day=…`` after spec evolution)
        proves nothing — the same row can live under both renderings, so
        the answer must be True (a retire check that treated cross-spec
        suffixes as disjoint would retire a delete file whose keys still
        have live rows in old-spec dirs and resurrect them)."""
        if a == "" or b == "":
            return True
        for sa, sb in zip(a.split("/"), b.split("/")):
            ka, _, va = sa.partition("=")
            kb, _, vb = sb.partition("=")
            if ka != kb:
                return True  # different spec levels — cannot prove disjoint
            if va != vb:
                return False  # same level, different value — disjoint
        return True  # one is a directory-prefix of the other

    def _compact_partitions(
        self,
        spark: SparkSession,
        partition_filter: list[tuple] | None,
        partition_leaves: list[str] | None,
        zorder: list[str] | None = None,
    ) -> dict:
        """Partition-scoped ``rewrite_data_files``: see :meth:`compact`.
        ``zorder`` rewrites the scoped slice Morton-interleaved (Iceberg's
        ``strategy => 'sort', sort_order => 'zorder(…)'`` WITH a filter) —
        hot partitions get multi-column file bounding boxes while cold
        data is untouched."""
        from pyspark.sql import functions as F

        current = self.current_snapshot()
        if current is None:
            raise TableNotFoundError(f"Table {self.fq_name} has no snapshots yet")
        dir_epochs = self._dir_epochs()
        intro = self._dir_intro_seqs()
        ddirs = list(current.get("delete_dirs") or [])
        targets = set(partition_leaves or [])

        rewrite: dict[str, list[str]] = {}      # dir -> matched leaf paths
        kept_suffixes: dict[str, list[str]] = {}  # dir -> surviving suffixes
        kept_subpaths: dict[str, list[str]] = {}  # dir -> kept rel subpaths
        for d in current["data_dirs"]:
            root = self.data_dir / d
            epoch = dir_epochs.get(d)
            spec = epoch.get("partition_spec") if epoch is not None else None
            all_leaves = self._leaf_dirs([root], [], spec)
            if partition_leaves is not None:
                matched = [
                    leaf
                    for leaf in all_leaves
                    if any(
                        self._suffixes_intersect(self._leaf_suffix(d, leaf), t)
                        for t in targets
                    )
                ]
            else:
                gf = partition_filter
                if epoch is not None:
                    gf = self._translate_filters(
                        partition_filter, epoch["column_ids"]
                    )
                matched = (
                    self._leaf_dirs([root], gf, spec) if gf is not None else []
                )
            if not matched:
                kept_suffixes[d] = [self._leaf_suffix(d, l) for l in all_leaves]
                continue
            rewrite[d] = matched
            matched_set = set(matched)
            kept = [l for l in all_leaves if l not in matched_set]
            kept_suffixes[d] = [self._leaf_suffix(d, l) for l in kept]
            if kept:
                kept_subpaths[d] = [
                    str(Path(l).relative_to(self.data_dir)) for l in kept
                ]
        if not rewrite:
            # nothing matches — metadata no-op; the procedure output still
            # reports what the rewrite touched (nothing)
            return {**current, "rewritten_files": 0, "added_files": 0}

        # rewrite the matched leaves, per source dir so each slice gets its
        # own epoch projection and exactly the delete files applicable to it
        parts: list[DataFrame] = []
        matched_files = 0
        for d, leaves in rewrite.items():
            epoch = dir_epochs.get(d)
            ids = epoch["column_ids"] if epoch is not None else None
            fmt = (epoch or {}).get("write_format") or "parquet"
            matched_files += sum(
                len(_list_data_files(Path(l))) for l in leaves
            )
            df = (
                # one source dir = one write epoch: every leaf file shares
                # the same written schema, one-footer inference is exact
                # (same rationale as _read_dirs, r14)
                spark.read.option("mergeSchema", "false" if epoch is not None else "true")
                .format(fmt)
                .load([str(l) for l in leaves])
            )
            df = self._project_declared(df, ids)
            applicable = sorted(
                dd for dd in ddirs if intro.get(dd, -1) > intro.get(d, -1)
            )
            if applicable:
                keys = self._read_delete_keys(spark, applicable)
                df = df.join(keys, on=list(keys.columns), how="left_anti")
            parts.append(df)
        slice_df = parts[0]
        for p in parts[1:]:
            slice_df = slice_df.unionByName(p)
        # the range-distributed write samples its input before shuffling,
        # which would re-execute the scan + delete anti-join — persist so
        # the slice materializes once (unpersisted right after the write;
        # cached keeps the handle so derived frames don't orphan it)
        cached = slice_df.persist()
        slice_df = cached
        if zorder:
            from iceberg_quickstart_iac_spark.operators.zorder import (
                column_ranges,
                zorder_key,
            )

            ranges = column_ranges(slice_df, zorder)
            slice_df = slice_df.withColumn(
                "__z", zorder_key(zorder, [ranges[c] for c in zorder])
            )
            if not self._partition_cols():
                slice_df = slice_df.repartitionByRange(
                    spark.sparkContext.defaultParallelism, F.col("__z")
                )
            new_dir, new_rows, new_files = self._write_data(
                slice_df, order_override=[F.col("__z")], drop_cols=["__z"],
                distribution="range",
            )
        else:
            # range distribution: the slice is typically ONE hot partition,
            # which hash mode would write on a single core
            new_dir, new_rows, new_files = self._write_data(
                slice_df, distribution="range"
            )
        cached.unpersist()
        if new_rows == 0:
            # every row in the matched partitions was MoR-deleted: the
            # rewrite materializes to nothing — drop the empty dir AND its
            # file count (Spark may have emitted a schema-only empty file;
            # counting it would make the snapshot's file_count disagree
            # with what verify_integrity can see on disk)
            shutil.rmtree(self.data_dir / new_dir, ignore_errors=True)
            new_dir = None
            new_files = 0

        # a delete file can be retired when every partition its sidecar
        # attributes debt to was rewritten in EVERY data dir it applies to
        # (a suffix is uncovered in a dir iff a SURVIVING leaf of that dir
        # can intersect it); files without a sidecar are kept — unknown
        # attribution must never retire a delete
        retired: set[str] = set()
        for dd in ddirs:
            sidecar = self.data_dir / dd / self._DEBT_SIDECAR
            if not sidecar.exists():
                continue
            debt = json.loads(sidecar.read_text())
            applies_to = [
                d
                for d in current["data_dirs"]
                if intro.get(dd, -1) > intro.get(d, -1)
            ]
            if all(
                not any(
                    self._suffixes_intersect(s, k)
                    for k in kept_suffixes.get(d, [])
                )
                for s in debt
                for d in applies_to
            ):
                retired.add(dd)

        overrides = {
            sp: intro.get(d, -1)
            for d, sps in kept_subpaths.items()
            for sp in sps
        }
        epoch_overrides = {
            sp: dir_epochs.get(d)
            for d, sps in kept_subpaths.items()
            for sp in sps
            if dir_epochs.get(d) is not None
        }

        def build(entries: list[dict]) -> dict:
            cur = entries[-1]
            if cur["data_dirs"] != current["data_dirs"] or sorted(
                cur.get("delete_dirs") or []
            ) != sorted(ddirs):
                raise CommitConflictError(
                    f"partition-scoped compact on {self.fq_name}: table "
                    "changed concurrently — re-run"
                )
            new_data_dirs: list[str] = []
            for d in cur["data_dirs"]:
                if d not in rewrite:
                    new_data_dirs.append(d)
                else:
                    new_data_dirs.extend(kept_subpaths.get(d, []))
            if new_dir is not None:
                new_data_dirs.append(new_dir)
            absorbed = (
                {
                    new_dir: sorted(
                        str(Path(l).relative_to(self.data_dir))
                        for leaves in rewrite.values()
                        for l in leaves
                    )
                }
                if new_dir is not None
                else {}
            )
            return {
                "operation": "compact",
                "data_dirs": new_data_dirs,
                # lineage for cherrypick_snapshot: the matched leaves'
                # rows now live in new_dir (kept leaves stay as direct
                # subpath references, so they need no lineage entry)
                **({"absorbed_dirs": absorbed} if absorbed else {}),
                "delete_dirs": [dd for dd in ddirs if dd not in retired],
                # visible rows are unchanged: the rewrite only materializes
                # deletes that were already applied logically
                "row_count": cur["row_count"],
                "file_count": cur["file_count"] - matched_files + new_files,
                "dir_sequence_overrides": overrides,
                "dir_epoch_overrides": epoch_overrides,
                # the rewritten dir was written under the CURRENT declared
                # state (kept subpaths carry their own epoch overrides)
                **self._write_epoch(),
            }

        entry = self._commit(build)
        log_audit_event(
            "table_write",
            self.fq_name,
            details={
                "mode": "compact_partitions",
                "rewritten_dirs": len(rewrite),
                "rewritten_files": matched_files,
                "new_files": new_files,
                "retired_delete_files": len(retired),
            },
        )
        # scoped procedure output: only the files the rewrite touched —
        # table-wide totals would misreport a where-scoped rewrite
        return {
            **entry,
            "rewritten_files": int(matched_files),
            "added_files": int(new_files),
        }

    def rewrite_delete_files(self, spark: SparkSession) -> dict:
        """Merge accumulated equality-delete files WITHOUT touching any
        data — Iceberg's ``rewrite_position_delete_files`` maintenance
        analog, the cheap tier between "leave the deletes deferred" and a
        full :meth:`compact`: cost is O(delete keys), never O(table).

        Correctness hinges on sequence scoping: a delete file applies
        only to data dirs with a STRICTLY LOWER intro sequence, so two
        delete files are mergeable only when the SAME data dirs sit below
        both (no data dir's intro falls between theirs). Delete dirs are
        grouped by that applicability cutpoint; each multi-file group is
        rewritten into one deduplicated key file whose intro sequence is
        pinned to the group's minimum via ``dir_sequence_overrides`` —
        the merged file erases exactly what its sources erased, and never
        a row appended after them.
        """
        import bisect

        snap = self.current_snapshot()
        if snap is None:
            raise TableNotFoundError(f"Table {self.fq_name} has no snapshots yet")
        ddirs = list(snap.get("delete_dirs") or [])
        if len(ddirs) < 2:
            return snap
        intro = self._dir_intro_seqs()
        data_seqs = sorted(intro.get(d, -1) for d in snap["data_dirs"])
        groups: dict[int, list[str]] = {}
        for dd in ddirs:
            cut = bisect.bisect_left(data_seqs, intro.get(dd, -1))
            groups.setdefault(cut, []).append(dd)
        new_ddirs: list[str] = []
        overrides: dict[str, int] = {}
        merged = 0
        col_ids = self._column_ids()
        for cut in sorted(groups):
            dds = groups[cut]
            if len(dds) == 1:
                new_ddirs.append(dds[0])
                continue
            keys = self._read_delete_keys(spark, sorted(dds))
            new_dir = f"mordel-{uuid.uuid4().hex}"
            keys.write.parquet(str(self.data_dir / new_dir))
            (self.data_dir / new_dir / "_key_ids.json").write_text(
                json.dumps({c: col_ids.get(c) for c in keys.columns})
            )
            # merged partition-debt attribution survives only when EVERY
            # source carried one (a missing map means unknown partitions —
            # the merged file must stay unattributable, not falsely scoped)
            src_debts = [
                json.loads(sc.read_text())
                for dd in dds
                if (sc := self.data_dir / dd / self._DEBT_SIDECAR).exists()
            ]
            if len(src_debts) == len(dds):
                merged_debt: dict[str, int] = {}
                for m in src_debts:
                    for leaf, n in m.items():
                        merged_debt[leaf] = merged_debt.get(leaf, 0) + n
                (self.data_dir / new_dir / self._DEBT_SIDECAR).write_text(
                    json.dumps(merged_debt)
                )
            new_ddirs.append(new_dir)
            overrides[new_dir] = min(intro[dd] for dd in dds)
            merged += 1
        if not merged:
            return snap

        def build(entries: list[dict]) -> dict:
            cur = entries[-1]
            if sorted(cur.get("delete_dirs") or []) != sorted(ddirs):
                # a concurrent MoR write changed the delete inventory the
                # merge was computed from — surface, caller re-runs
                raise CommitConflictError(
                    f"rewrite_delete_files on {self.fq_name}: delete files "
                    "changed concurrently — re-run"
                )
            return {
                "operation": "rewrite_deletes",
                "data_dirs": list(cur["data_dirs"]),
                "delete_dirs": new_ddirs,
                "row_count": cur["row_count"],
                "file_count": cur["file_count"],
                "dir_sequence_overrides": overrides,
                **{
                    k: cur[k]
                    for k in ("column_ids", "column_types", "partition_spec", "write_format")
                    if k in cur
                },
            }

        entry = self._commit(build)
        log_audit_event(
            "table_write",
            self.fq_name,
            details={
                "mode": "rewrite_deletes",
                "delete_files_before": len(ddirs),
                "delete_files_after": len(new_ddirs),
            },
        )
        return entry

    def remove_orphan_files(
        self, older_than_ms: int | None = None, grace_ms: int = 3 * 86400 * 1000
    ) -> list[str]:
        """Delete data directories referenced by NO snapshot — debris from
        writes that crashed between data materialization and log commit
        (the ``remove_orphan_files`` maintenance procedure; SURVEY §4 —
        distinct from :meth:`expire_snapshots`, which prunes directories
        that WERE referenced by now-expired history).

        A grace window protects in-flight writes: a concurrent writer has
        materialized its directory but not yet won the commit race, so only
        directories last modified before ``older_than_ms`` (default
        now − ``grace_ms``, Iceberg's 3-day default) are removed. Returns
        the removed directory names.
        """
        if older_than_ms is None:
            older_than_ms = _now_ms() - grace_ms
        referenced = {d for e in self._entries() for d in self._entry_dirs(e)}
        # branch commits reference dirs main never will — protect them
        referenced |= {
            d for e in self._all_branch_entries() for d in self._entry_dirs(e)
        }
        ref_whole, ref_subs = self._ref_index(referenced)
        removed: list[str] = []
        for child in sorted(self.data_dir.iterdir()):
            if (
                not child.is_dir()
                or child.name in ref_whole
                or child.name in ref_subs
            ):
                continue
            # truncate mtime to ms the same way _now_ms truncates: the raw
            # float keeps fractional milliseconds, so a dir created within
            # the same millisecond as the cutoff would compare as "newer
            # than now" and flakily survive a grace_ms=0 sweep
            if int(child.stat().st_mtime * 1000) > older_than_ms:
                continue
            shutil.rmtree(child)
            removed.append(child.name)
        if removed:
            log_audit_event(
                "table_write",
                self.fq_name,
                details={"mode": "remove_orphan_files", "removed_dirs": removed},
            )
        return removed

    def verify_integrity(self, snapshot_id: str | None = None) -> dict:
        """Metadata↔data consistency check — the fsck the reference's
        disaster-recovery runbook implies (restore a catalog store or
        un-delete S3 objects, then "after verification, swap the table",
        ``docs/operations-runbook.md:105-140``; this is the verification
        step). Driver-side metadata only: paths + parquet footers,
        O(files), no data scan.

        Checks, for the selected (default current) snapshot:

        - every referenced data directory exists and holds ≥1 parquet file
          (a missing dir = data loss the log doesn't know about — exactly
          what a partial S3 restore produces);
        - footer row counts sum to the entry's ``row_count``;
        - physical file count matches ``file_count``;
        - the commit log itself is well-formed: wherever two surviving
          entries have CONSECUTIVE sequences, the later one's parent must
          chain to the earlier. Non-consecutive neighbors are NOT errors —
          tag-/fork-pinned ``expire_snapshots`` legitimately keeps e.g.
          {seq 0, seq 2} (Iceberg retention does the same), so gaps are
          reported informationally as ``retention_gaps`` without failing
          ``ok``.

        Also inventories orphan directories (referenced by NO snapshot or
        branch) — debris, not corruption; ``remove_orphan_files``
        territory. Returns a report dict with ``ok`` (orphans don't fail
        it) and per-category findings; raises nothing, so it is safe to
        run against a half-restored table.
        """
        report: dict = {
            "table": self.fq_name,
            "ok": True,
            "missing_dirs": [],
            "empty_dirs": [],
            "row_count_mismatch": None,
            "file_count_mismatch": None,
            "log_errors": [],
            "retention_gaps": [],
            "orphan_dirs": [],
        }
        entries = self._entries()
        if not entries:
            report["log_errors"].append("no snapshots")
            report["ok"] = False
            return report
        meta = self.meta
        expired_seqs = set(meta.get("expired_sequences") or [])
        # A table whose meta lacks the expired_sequences key entirely
        # predates the tombstone feature (or was restored from such a
        # version and never written since — the first commit/expire seeds
        # it): its gaps were made by the old expire_snapshots, which left
        # no record, so they grandfather as retention gaps rather than
        # flipping a healthy table to corrupt on upgrade.
        tombstones_seeded = "expired_sequences" in meta
        for prev, e in zip(entries, entries[1:]):
            if e["sequence"] == prev["sequence"] + 1:
                # adjacent survivors: the parent chain must hold exactly
                if e.get("parent_id") != prev["snapshot_id"]:
                    report["log_errors"].append(
                        f"sequence {e['sequence']} parent_id does not chain"
                    )
            else:
                # A gap is legitimate ONLY when expire_snapshots tombstoned
                # every missing sequence (tag-/fork-pinned retention keeps
                # e.g. {0, 2}); a sequence absent from both the log and the
                # tombstone list is a lost entry — the partial-restore
                # corruption fsck exists to catch.
                unexplained = [
                    s
                    for s in range(prev["sequence"] + 1, e["sequence"])
                    if s not in expired_seqs
                ]
                if unexplained and tombstones_seeded:
                    report["log_errors"].append(
                        f"sequences {unexplained} missing from the log with "
                        "no expire_snapshots tombstone (lost entries?)"
                    )
                else:
                    report["retention_gaps"].append(
                        (prev["sequence"], e["sequence"])
                    )
        snap = self._snapshot_for(snapshot_id, None)
        total_rows = 0
        total_files = 0
        for d in snap["data_dirs"]:
            base = self.data_dir / d
            if not base.is_dir():
                report["missing_dirs"].append(d)
                continue
            files = _list_data_files(base)
            if not files:
                report["empty_dirs"].append(d)
                continue
            total_rows += _footer_row_count(files)
            total_files += len(files)
        for d in snap.get("delete_dirs") or []:
            if not (self.data_dir / d).is_dir():
                report["missing_dirs"].append(d)
        if not report["missing_dirs"] and not report["empty_dirs"]:
            if snap.get("delete_dirs"):
                # MoR snapshot: footers count PRE-delete rows; the exact
                # visible count would need a data scan (anti-join), which
                # fsck deliberately never does — verify the bound only
                if total_rows < snap["row_count"]:
                    report["row_count_mismatch"] = {
                        "expected_at_most": total_rows,
                        "actual": snap["row_count"],
                    }
            elif total_rows != snap["row_count"]:
                report["row_count_mismatch"] = {
                    "expected": snap["row_count"], "actual": total_rows,
                }
            if total_files != snap["file_count"]:
                report["file_count_mismatch"] = {
                    "expected": snap["file_count"], "actual": total_files,
                }
        referenced = {d for e in entries for d in self._entry_dirs(e)}
        referenced |= {
            d for e in self._all_branch_entries() for d in self._entry_dirs(e)
        }
        ref_whole, ref_subs = self._ref_index(referenced)
        if self.data_dir.is_dir():
            report["orphan_dirs"] = sorted(
                c.name for c in self.data_dir.iterdir()
                if c.is_dir()
                and c.name not in ref_whole
                and c.name not in ref_subs
            )
        report["ok"] = not (
            report["missing_dirs"]
            or report["empty_dirs"]
            or report["row_count_mismatch"]
            or report["file_count_mismatch"]
            or report["log_errors"]
        )
        return report

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

        self._seed_expired_sequences()
        entries = self._entries()
        if not entries:
            return 0
        keep = [e for e in entries if e["committed_at_ms"] > older_than_ms]
        if not keep or keep[-1]["sequence"] != entries[-1]["sequence"]:
            keep = keep + [entries[-1]] if entries[-1] not in keep else keep
        # a branch's merged view needs its fork entry (its base data_dirs
        # live there) — fork entries survive retention while the branch does
        forks = {b["fork_sequence"] for b in self.list_branches()}
        for e in entries:
            if e["sequence"] in forks and e not in keep:
                keep.append(e)
        # Iceberg expire semantics for named refs: tag refs past their own
        # max_ref_age_ms are dropped first, then every snapshot a LIVE tag
        # points at is pinned regardless of the age cutoff
        for ref in self.list_tags():
            age = ref.get("max_ref_age_ms")
            if age is not None and ref["created_at_ms"] + age <= _now_ms():
                self.delete_tag(ref["name"])
        tagged = {ref["sequence"] for ref in self.list_tags()}
        for e in entries:
            if e["sequence"] in tagged and e not in keep:
                keep.append(e)
        drop = [e for e in entries if e not in keep]

        referenced = {d for e in keep for d in self._entry_dirs(e)}
        referenced |= {
            d for e in self._all_branch_entries() for d in self._entry_dirs(e)
        }
        if drop:
            # Tombstone the dropped sequences in table metadata so
            # verify() can tell legitimate retention gaps from log entries
            # lost to a partial restore (which have no tombstone).
            meta = self.meta
            tomb = set(meta.get("expired_sequences") or [])
            tomb.update(e["sequence"] for e in drop)
            meta["expired_sequences"] = sorted(tomb)
            self._write_meta(meta)
        for e in drop:
            (self.log_dir / f"{e['sequence']:012d}.json").unlink(missing_ok=True)
        ref_whole, ref_subs = self._ref_index(referenced)
        for child in self.data_dir.iterdir():
            if not child.is_dir() or child.name in ref_whole:
                continue
            if child.name in ref_subs:
                # the dir survives only through kept subpath references
                # (partition-scoped compaction): GC the rewritten leaves
                # the moment no snapshot references the dir whole
                self._prune_unreferenced_leaves(child, ref_subs[child.name])
                continue
            shutil.rmtree(child)
        return len(drop)

    @staticmethod
    def _ref_index(dirs) -> tuple[set[str], dict[str, set[tuple]]]:
        """Split raw entry-dir references into whole top-level dirs and,
        for subpath references (partition-scoped compaction's kept
        leaves), {top dir: {segment tuples}}."""
        whole: set[str] = set()
        subs: dict[str, set[tuple]] = {}
        for d in dirs:
            if "/" in d:
                top, rest = d.split("/", 1)
                subs.setdefault(top, set()).add(tuple(rest.split("/")))
            else:
                whole.add(d)
        return whole, subs

    def _prune_unreferenced_leaves(self, base: Path, keep_rels: set[tuple]) -> None:
        """Remove partition subdirs of ``base`` not on any referenced
        subpath (files at each level are kept — sidecars, unpartitioned
        data). A zero-length rel means the whole subtree is referenced."""
        if any(len(k) == 0 for k in keep_rels):
            return
        firsts = {k[0] for k in keep_rels}
        for entry in sorted(base.iterdir()):
            if not entry.is_dir():
                continue
            if entry.name not in firsts:
                shutil.rmtree(entry)
                continue
            self._prune_unreferenced_leaves(
                entry, {k[1:] for k in keep_rels if k[0] == entry.name}
            )

    # -- tags (immutable named refs) ---------------------------------------
    #
    # Iceberg/Nessie tags: a tag names a snapshot forever (release audits,
    # "the exact data behind model v3"), unlike a branch whose head moves.
    # The reference's Nessie pitch covers both ref kinds
    # (docs/deep-dive.md:262-303); Iceberg itself exposes them as
    # `ALTER TABLE t CREATE TAG v1 [RETAIN ...]` + `VERSION AS OF 'v1'`.
    # A tag pins its snapshot against expire_snapshots until the tag is
    # deleted or its own max_ref_age_ms lapses — exactly Iceberg's
    # ref-retention rules.

    _TAGS = "_tags"

    def _tag_path(self, name: str) -> Path:
        return self.root / self._TAGS / (quote(name, safe="") + ".json")

    def create_tag(
        self,
        name: str,
        snapshot_id: str | None = None,
        max_ref_age_ms: int | None = None,
    ) -> dict:
        """Tag the current (or given) snapshot. Metadata-only; immutable —
        re-tagging an existing name raises (delete first, like Iceberg)."""
        path = self._tag_path(name)
        if path.exists():
            raise ValueError(f"Tag {name!r} already exists on {self.fq_name}")
        snap = self._snapshot_for(snapshot_id, None)
        path.parent.mkdir(parents=True, exist_ok=True)
        ref = {
            "name": name,
            "snapshot_id": snap["snapshot_id"],
            "sequence": snap["sequence"],
            "created_at_ms": _now_ms(),
            "max_ref_age_ms": max_ref_age_ms,
        }
        tmp = path.parent / f".tmp-{uuid.uuid4().hex}"
        tmp.write_text(json.dumps(ref, indent=2))
        try:
            os.link(tmp, path)
        except FileExistsError:
            raise ValueError(f"Tag {name!r} already exists on {self.fq_name}")
        finally:
            tmp.unlink(missing_ok=True)
        log_audit_event(
            "schema_evolution",
            self.fq_name,
            details={
                "change": "create_tag",
                "tag": name,
                "snapshot_id": snap["snapshot_id"],
            },
        )
        return ref

    def tag(self, name: str) -> dict:
        path = self._tag_path(name)
        if not path.exists():
            raise ValueError(f"No tag {name!r} on {self.fq_name}")
        return json.loads(path.read_text())

    def list_tags(self) -> list[dict]:
        tdir = self.root / self._TAGS
        if not tdir.exists():
            return []
        return [
            json.loads(p.read_text()) for p in sorted(tdir.glob("[!.]*.json"))
        ]

    def delete_tag(self, name: str) -> None:
        path = self._tag_path(name)
        if not path.exists():
            raise ValueError(f"No tag {name!r} on {self.fq_name}")
        path.unlink()

    def refs(self, spark: SparkSession) -> DataFrame:
        """The named-refs metadata table, like Iceberg's ``t.refs``: one
        row per branch/tag with the snapshot it points at. Driver-side
        metadata only — O(refs), no data scan."""
        main_entries = self._entries()
        rows = [
            (
                "main",
                "BRANCH",
                main_entries[-1]["snapshot_id"] if main_entries else None,
                None,
            )
        ]
        for b in self.list_branches():
            bv = _BranchView(self.root, b["name"])
            entries = bv._entries()
            head = entries[-1]["snapshot_id"] if entries else None
            rows.append((b["name"], "BRANCH", head, None))
        for ref in self.list_tags():
            rows.append(
                (ref["name"], "TAG", ref["snapshot_id"], ref.get("max_ref_age_ms"))
            )
        return spark.createDataFrame(
            rows, "name STRING, type STRING, snapshot_id STRING, max_ref_age_ms LONG"
        )

    # -- branches (Nessie-style data branching) ----------------------------
    #
    # The reference's Nessie catalog module exists FOR git-like data
    # branching (docs/deep-dive.md:262-303: test a schema migration on an
    # isolated branch while "readers on main see the old schema", merge
    # when ready, roll back by resetting the pointer). catalog_conf.py
    # carries the Nessie config; this gives the local snapstore the same
    # semantics: a branch is a lightweight ref — its own commit log + an
    # optional copy-on-evolve schema — sharing the main table's immutable
    # data directories, exactly how Nessie/Iceberg refs work (a branch is
    # metadata; data files are never copied).

    _BRANCHES = "_branches"

    def _branch_root(self, name: str) -> Path:
        from urllib.parse import quote

        return self.root / self._BRANCHES / quote(name, safe="")

    def _all_branch_entries(self) -> list[dict]:
        out: list[dict] = []
        bdir = self.root / self._BRANCHES
        if bdir.exists():
            for child in sorted(bdir.iterdir()):
                log = child / "_log"
                if log.exists():
                    out.extend(self._read_log(log))
        return out

    def list_branches(self) -> list[dict]:
        bdir = self.root / self._BRANCHES
        out = []
        if bdir.exists():
            for child in sorted(bdir.iterdir()):
                ref = child / "branch.json"
                if ref.exists():
                    out.append(json.loads(ref.read_text()))
        return out

    def create_branch(self, name: str, at_snapshot_id: str | None = None) -> "SnapTable":
        """Fork a branch at the current (or given) snapshot; returns the
        branch view — a full SnapTable interface whose writes, schema
        evolutions, time-travel, and snapshot listing are isolated from
        main. Data directories are shared (refs are metadata-only)."""
        broot = self._branch_root(name)
        if (broot / "branch.json").exists():
            raise ValueError(f"Branch {name!r} already exists on {self.fq_name}")
        entries = self._entries()
        if at_snapshot_id is None:
            fork_seq = entries[-1]["sequence"] if entries else -1
        else:
            fork_seq = self._snapshot_for(at_snapshot_id, None)["sequence"]
        (broot / "_log").mkdir(parents=True, exist_ok=True)
        ref = {
            "name": name,
            "fork_sequence": fork_seq,
            # schema at fork time, for merge conflict detection
            "base_columns": self.meta.get("columns", []),
            "created_at_ms": _now_ms(),
        }
        (broot / "branch.json").write_text(json.dumps(ref, indent=2))
        return _BranchView(self.root, name)

    def branch(self, name: str) -> "SnapTable":
        if not (self._branch_root(name) / "branch.json").exists():
            raise ValueError(f"No branch {name!r} on {self.fq_name}")
        return _BranchView(self.root, name)

    def delete_branch(self, name: str) -> None:
        broot = self._branch_root(name)
        if not (broot / "branch.json").exists():
            raise ValueError(f"No branch {name!r} on {self.fq_name}")
        shutil.rmtree(broot)

    def merge_branch(self, name: str) -> dict:
        """Merge a branch into main.

        Fast-forward when main has not advanced past the fork: branch
        commits are adopted verbatim (atomic per-slot link claims — a
        concurrent main writer surfaces as CommitConflictError), and a
        branch schema evolution is applied to the main table. When main HAS
        advanced, append-only histories on both sides rebase — each branch
        append replays as a fresh main commit (appends commute) — while
        overwrites/compactions or a branch schema change against a
        moved main raise CommitConflictError (resolve by hand, exactly
        Nessie's conflict model). After a successful merge the branch ref
        fast-forwards to the new main head and keeps working.
        """
        bv = _BranchView(self.root, name)
        ref = bv._ref
        fork = ref["fork_sequence"]
        branch_entries = self._read_log(bv.log_dir)
        main_entries = self._entries()
        head = main_entries[-1]["sequence"] if main_entries else -1
        schema_override = "columns" in ref

        def check_schema_mergeable():
            if schema_override and self.meta.get("columns", []) != ref["base_columns"]:
                raise CommitConflictError(
                    f"Branch {name!r} evolved the schema but main's schema "
                    f"also changed since the fork — manual resolution required"
                )

        def replay_appends(entries_to_replay: list[dict], prev_view: dict | None) -> dict:
            """Re-commit each branch append's directory delta as a fresh
            main commit via the optimistic-retry path (appends commute, so
            a rebase is safe). The branch entry's write epoch rides along —
            the dirs keep the schema/layout they were physically written
            under."""
            last = None
            for e in entries_to_replay:
                prev_dirs = prev_view["data_dirs"] if prev_view else []
                prev_rows = prev_view["row_count"] if prev_view else 0
                prev_files = prev_view["file_count"] if prev_view else 0
                delta_dirs = [d for d in e["data_dirs"] if d not in prev_dirs]
                delta_rows = e["row_count"] - prev_rows
                delta_files = e["file_count"] - prev_files

                def build(entries: list[dict], _dd=delta_dirs, _dr=delta_rows, _df=delta_files, _e=e) -> dict:
                    current = entries[-1] if entries else None
                    return {
                        "operation": "append",
                        "data_dirs": (current["data_dirs"] if current else []) + _dd,
                        "delete_dirs": (
                            list(current.get("delete_dirs") or []) if current else []
                        ),
                        "row_count": (current["row_count"] if current else 0) + _dr,
                        "file_count": (current["file_count"] if current else 0) + _df,
                        "column_ids": _e.get("column_ids"),
                        "column_types": _e.get("column_types"),
                        "partition_spec": _e.get("partition_spec"),
                    }

                last = self._commit(build)
                prev_view = e
            return last

        if head == fork:
            # fast-forward: adopt branch entries verbatim, slot by slot. The
            # schema override is deferred until every entry has landed — a
            # half-failed merge must not leave main's schema changed.
            check_schema_mergeable()
            last = main_entries[-1] if main_entries else None
            raced_at: int | None = None
            for i, e in enumerate(branch_entries):
                tmp = self.log_dir / f".tmp-{uuid.uuid4().hex}"
                tmp.write_text(json.dumps(e))
                target = self.log_dir / f"{e['sequence']:012d}.json"
                try:
                    os.link(tmp, target)
                    tmp.unlink()
                except FileExistsError:
                    tmp.unlink(missing_ok=True)
                    raced_at = i
                    break
                last = e
            if raced_at is not None:
                # a concurrent main writer claimed a slot mid-merge. Fall
                # back to rebasing the unmerged remainder instead of raising
                # with a partial publish: appends commute, so replaying them
                # after the racer's commit is exactly the diverged-merge
                # semantics. Non-append remainders are a genuine conflict.
                remaining = branch_entries[raced_at:]
                if any(e["operation"] != "append" for e in remaining):
                    raise CommitConflictError(
                        f"Merge of branch {name!r} lost a race on sequence "
                        f"{remaining[0]['sequence']} and the remainder holds "
                        f"non-append commits (rewrites do not commute) — "
                        f"{raced_at} leading commit(s) already merged; the "
                        f"branch still holds the full history for manual "
                        f"resolution"
                    )
                if raced_at > 0:
                    prev_view = branch_entries[raced_at - 1]
                else:
                    at_fork = [e for e in main_entries if e["sequence"] <= fork]
                    prev_view = at_fork[-1] if at_fork else None
                last = replay_appends(remaining, prev_view)
                check_schema_mergeable()  # racer may have evolved the schema
            if schema_override:
                meta = self.meta
                meta["columns"] = ref["columns"]
                meta["next_field_id"] = ref["next_field_id"]
                self._write_meta(meta)
        else:
            if schema_override:
                raise CommitConflictError(
                    f"Branch {name!r} carries a schema change but main advanced "
                    f"past the fork — manual resolution required"
                )
            advanced = [e for e in main_entries if e["sequence"] > fork]
            if any(e["operation"] != "append" for e in advanced) or any(
                e["operation"] != "append" for e in branch_entries
            ):
                raise CommitConflictError(
                    f"Cannot auto-merge branch {name!r}: non-append commits on "
                    f"a diverged history (appends commute; rewrites do not)"
                )
            merged = [e for e in main_entries if e["sequence"] <= fork]
            last = replay_appends(branch_entries, merged[-1] if merged else None)
            if last is None:
                last = main_entries[-1]

        # fast-forward the branch ref to the merged head; branch keeps working
        new_head = last["sequence"] if last else -1
        for p in bv.log_dir.glob(self._LOG_GLOB):
            p.unlink()
        new_ref = {
            "name": name,
            "fork_sequence": new_head,
            "base_columns": self.meta.get("columns", []),
            "created_at_ms": ref["created_at_ms"],
        }
        (self._branch_root(name) / "branch.json").write_text(json.dumps(new_ref, indent=2))
        log_audit_event(
            "table_write",
            self.fq_name,
            details={"mode": "merge_branch", "branch": name, "head_sequence": new_head},
        )
        # merge mutates the committed head outside _commit (fast-forward
        # links entries directly; the branch ref rewinds) — follow-head
        # views must re-resolve or they'd keep serving the pre-merge state
        self._refresh_head_registrations()
        return last if last else {}


class _BranchView(SnapTable):
    """A branch of a :class:`SnapTable` — the full table interface with the
    commit log and (after an evolution) the schema scoped to the branch.
    Inherits reads, writes, time-travel, snapshot listing, incremental
    scans, and schema evolution; only the log location, the merged entry
    view, and the meta source differ. Table-wide maintenance
    (expire/orphan removal) stays on the main table."""

    def __init__(self, root: str | Path, name: str):
        super().__init__(root)
        self.branch_name = name
        self._broot = self._branch_root(name)
        self.log_dir = self._broot / "_log"

    @property
    def _ref(self) -> dict:
        return json.loads((self._broot / "branch.json").read_text())

    @property
    def meta(self) -> dict:
        main = json.loads((self.root / "table.json").read_text())
        ref = self._ref
        if "columns" in ref:
            main["columns"] = ref["columns"]
            main["next_field_id"] = ref["next_field_id"]
        return main

    def _write_meta(self, meta: dict) -> None:
        # copy-on-evolve: schema changes land in the branch ref only —
        # "readers on main see the old schema" (deep-dive.md:267-272)
        ref = self._ref
        ref["columns"] = meta.get("columns", [])
        ref["next_field_id"] = meta.get("next_field_id")
        (self._broot / "branch.json").write_text(json.dumps(ref, indent=2))

    @property
    def fq_name(self) -> str:
        return f"{super().fq_name}@{self.branch_name}"

    def _entries(self) -> list[dict]:
        fork = self._ref["fork_sequence"]
        main = [
            e for e in self._read_log(self.root / "_log") if e["sequence"] <= fork
        ]
        return main + self._read_log(self.log_dir)

    def reset(self, snapshot_id: str) -> None:
        """Move the branch pointer back to ``snapshot_id`` (rolling back bad
        changes by resetting the ref — deep-dive.md:279). Branch commits
        after the target are discarded; main is untouched."""
        target = self._snapshot_for(snapshot_id, None)
        for p in self.log_dir.glob(self._LOG_GLOB):
            if int(p.stem) > target["sequence"]:
                p.unlink()
        # head moved without a _commit — re-resolve follow-head views so a
        # registered branch view stops serving the discarded commits
        self._refresh_head_registrations()

    def _maintenance_unsupported(self, op: str):
        raise RuntimeError(
            f"{op} operates on shared data directories — run it on the main "
            f"table, not branch {self.branch_name!r}"
        )

    def expire_snapshots(self, older_than_ms: int | None = None, max_age_ms: int | None = None) -> int:
        self._maintenance_unsupported("expire_snapshots")

    def remove_orphan_files(self, older_than_ms: int | None = None, grace_ms: int = 3 * 86400 * 1000) -> list[str]:
        self._maintenance_unsupported("remove_orphan_files")

    def create_branch(self, name: str, at_snapshot_id: str | None = None) -> "SnapTable":
        raise RuntimeError("Branch a branch from the main table instead")

    def create_tag(
        self,
        name: str,
        snapshot_id: str | None = None,
        max_ref_age_ms: int | None = None,
    ) -> dict:
        # branch sequences continue from the fork and can collide with
        # later main sequences — a branch-scoped tag would pin the wrong
        # main snapshot at expire time. Tag from the main table.
        raise RuntimeError(
            "Tags are table-wide refs — create them on the main table, not "
            f"branch {self.branch_name!r}"
        )

    def evolve_partition_spec(self, new_spec: list[dict]) -> dict:
        # branch refs carry only a columns override; a branch-scoped layout
        # change would be silently dropped at merge — require it on main
        raise RuntimeError(
            "Partition-spec evolution is table-wide metadata — run it on the "
            f"main table, not branch {self.branch_name!r}"
        )

    def evolve_sort_order(self, order: list[dict]) -> dict:
        # same reason: the branch ref carries only a columns override
        raise RuntimeError(
            "Sort-order evolution is table-wide metadata — run it on the "
            f"main table, not branch {self.branch_name!r}"
        )

    def set_properties(self, props: dict) -> dict:
        raise RuntimeError(
            "Table properties are table-wide metadata — set them on the "
            f"main table, not branch {self.branch_name!r}"
        )

    def unset_properties(self, keys: list[str]) -> dict:
        raise RuntimeError(
            "Table properties are table-wide metadata — unset them on the "
            f"main table, not branch {self.branch_name!r}"
        )

    def set_identifier_fields(self, fields: list[str]) -> dict:
        raise RuntimeError(
            "Identifier fields are table-wide metadata — set them on the "
            f"main table, not branch {self.branch_name!r}"
        )
