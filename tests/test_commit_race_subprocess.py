"""Multi-PROCESS optimistic-commit race (round 8; VERDICT r7 next #5).

The in-process race test (tests/test_tables.py::
test_concurrent_commits_both_land) exercises the seq-claim under the GIL;
a real lakehouse has separate writer *processes*. The commit protocol is
plain filesystem metadata (os.link claims the next sequence slot, EEXIST
loses the race), so it needs no shared JVM or lock server — this test
drives N python subprocesses, each committing M pyarrow-written appends
against the same table root, released together by a go-file barrier.

Spark-free on purpose: the workers write parquet with pyarrow and commit
through SnapTable._commit with the same entry shape ``append`` builds
(data_dirs + delete_dirs carry-forward, cumulative row/file counts,
write-epoch stamp), so the race is on the COMMIT PROTOCOL, not on Spark
job scheduling. Retries follow the table's ``commit_num_retries``
property — the public knob (Iceberg's ``commit.retry.num-retries``).
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap
from pathlib import Path

import pyarrow.parquet as pq

from iceberg_quickstart_iac_spark.tables import SnapTable

REPO = Path(__file__).resolve().parents[1]

WORKER = textwrap.dedent(
    """
    import sys, time, uuid
    from pathlib import Path

    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_quickstart_iac_spark.tables import SnapTable

    root, wid, n_commits = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    t = SnapTable.load(root)
    go = Path(root) / "_go"
    while not go.exists():
        time.sleep(0.001)
    for i in range(n_commits):
        d = uuid.uuid4().hex
        out = t.data_dir / d
        out.mkdir(parents=True)
        pq.write_table(
            pa.table({"k": pa.array([wid * 1000 + i], type=pa.int64())}),
            out / "part-00000.parquet",
        )

        def build(entries, d=d):
            cur = entries[-1] if entries else None
            return {
                "operation": "append",
                "data_dirs": (cur["data_dirs"] if cur else []) + [d],
                "delete_dirs": (
                    list(cur.get("delete_dirs") or []) if cur else []
                ),
                "row_count": (cur["row_count"] if cur else 0) + 1,
                "file_count": (cur["file_count"] if cur else 0) + 1,
                **t._write_epoch(),
            }

        t._commit(build)
    print("ok", wid)
    """
)


def test_subprocess_writers_race_cleanly(tmp_path):
    n_workers, n_commits = 4, 6
    root = tmp_path / "race"
    t = SnapTable.create(
        root,
        {
            "name": "race", "namespace": "lakehouse",
            "columns": [{"name": "k", "type": "long"}],
            # enough retries that every loser eventually lands (the race
            # is 4 writers deep; the property is the public Iceberg knob)
            "properties": {"commit_num_retries": 60},
        },
    )
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {**os.environ, "PYTHONPATH": str(REPO)}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(root), str(w), str(n_commits)],
            env=env, cwd=str(tmp_path),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for w in range(n_workers)
    ]
    (root / "_go").touch()  # release the barrier once all workers spun up
    outs = [p.communicate(timeout=120) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, (out, err)

    total = n_workers * n_commits
    entries = t._entries()
    # every commit landed exactly once, sequences contiguous, chain intact
    assert len(entries) == total
    assert [e["sequence"] for e in entries] == list(range(total))
    for prev, e in zip(entries, entries[1:]):
        assert e["parent_id"] == prev["snapshot_id"]
    head = entries[-1]
    assert head["row_count"] == total and head["file_count"] == total
    # no lost updates: every worker's every row is in the final state
    keys = set()
    for d in head["data_dirs"]:
        for f in (t.data_dir / d).rglob("*.parquet"):
            keys.update(pq.read_table(f).column("k").to_pylist())
    assert keys == {
        w * 1000 + i for w in range(n_workers) for i in range(n_commits)
    }
    # fsck clean after the melee
    report = t.verify_integrity()
    assert report["ok"], report


def test_subprocess_writers_race_through_seeding(tmp_path):
    """Pre-upgrade table (no ``expired_sequences`` key): every worker's
    FIRST commit runs ``_seed_expired_sequences`` — a table.json rewrite —
    while its rivals concurrently READ table.json (meta for retry counts,
    write epochs, commit re-bases). The rewrite goes through temp-file +
    ``os.replace``, so no reader can ever observe a torn file; with a
    plain ``write_text`` this melee aborts otherwise-valid commits with
    JSONDecodeError."""
    import json

    n_workers, n_commits = 4, 6
    root = tmp_path / "seedrace"
    t = SnapTable.create(
        root,
        {
            "name": "seedrace", "namespace": "lakehouse",
            "columns": [{"name": "k", "type": "long"}],
            "properties": {"commit_num_retries": 60},
        },
    )
    # simulate the pre-tombstone on-disk layout the shim upgrades
    meta_path = root / "table.json"
    meta = json.loads(meta_path.read_text())
    meta.pop("expired_sequences", None)
    meta_path.write_text(json.dumps(meta, indent=2))

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {**os.environ, "PYTHONPATH": str(REPO)}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(root), str(w), str(n_commits)],
            env=env, cwd=str(tmp_path),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for w in range(n_workers)
    ]
    (root / "_go").touch()
    outs = [p.communicate(timeout=120) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, (out, err)

    total = n_workers * n_commits
    entries = t._entries()
    assert len(entries) == total
    assert [e["sequence"] for e in entries] == list(range(total))
    # the shim stamped the key (an intact, parseable table.json) and a
    # fresh table has no pre-existing gaps to grandfather
    meta = json.loads(meta_path.read_text())
    assert meta["expired_sequences"] == []
    report = t.verify_integrity()
    assert report["ok"], report
