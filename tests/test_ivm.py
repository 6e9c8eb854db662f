"""Incremental view maintenance: a changelog-fed rollup must equal the
full recompute exactly after any mix of appends/deletes/updates —
decimal accumulators make the equality bit-exact, not approximate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_quickstart_iac_spark.operators.ivm import (
    COUNT_COL,
    _aggregate,
    refresh_rollup,
    rollup_template,
)
from iceberg_quickstart_iac_spark.tables import SnapTable

MEASURES = {"total": ("amount", "sum")}


@pytest.fixture()
def src(spark, tmp_path):
    t = SnapTable.create(
        tmp_path / "src",
        {
            "name": "sales", "namespace": "lakehouse",
            "columns": [
                {"name": "region", "type": "string"},
                {"name": "amount", "type": "double"},
                {"name": "id", "type": "long"},
            ],
        },
    )
    t.append(spark.createDataFrame(
        [("eu", 10.0, 1), ("eu", 5.0, 2), ("us", 7.0, 3), (None, 2.0, 4)],
        "region STRING, amount DOUBLE, id LONG",
    ))
    return t


@pytest.fixture()
def dst(src, tmp_path):
    return SnapTable.create(
        tmp_path / "dst", rollup_template(src, "sales_rollup", ["region"], MEASURES)
    )


def _states(spark, src, dst):
    full = {tuple(r) for r in _aggregate(src.read(spark), ["region"], MEASURES).collect()}
    inc = {tuple(r) for r in dst.read(spark).collect()}
    return full, inc


def test_first_refresh_is_full_then_incremental_matches_exactly(spark, src, dst):
    r1 = refresh_rollup(spark, src, dst, ["region"], MEASURES)
    assert r1["mode"] == "full"
    full, inc = _states(spark, src, dst)
    assert full == inc

    # delete a whole group, update a row, append to existing + new groups
    src.delete_where(spark, "region = 'us'")
    src.update_where(spark, "id = 1", {"amount": "amount + 0.5"})
    src.append(spark.createDataFrame(
        [("asia", 3.0, 5), ("eu", 1.0, 6), (None, 4.0, 7)],
        "region STRING, amount DOUBLE, id LONG",
    ))
    r2 = refresh_rollup(spark, src, dst, ["region"], MEASURES)
    assert r2["mode"] == "incremental"
    full, inc = _states(spark, src, dst)
    assert full == inc  # bit-exact: decimal accumulators are order-free
    # the emptied group is GONE, not a zero-sum residue
    assert dst.read(spark).filter("region = 'us'").count() == 0
    # null group key maintained correctly (null-safe merge keys)
    null_row = dst.read(spark).filter("region IS NULL").collect()
    assert len(null_row) == 1 and null_row[0][COUNT_COL] == 2


def test_noop_when_watermark_current(spark, src, dst):
    refresh_rollup(spark, src, dst, ["region"], MEASURES)
    n_snapshots = len(dst._entries())
    r = refresh_rollup(spark, src, dst, ["region"], MEASURES)
    assert r == {
        "refreshed": False, "mode": "noop",
        "src_snapshot": src._entries()[-1]["snapshot_id"],
    }
    assert len(dst._entries()) == n_snapshots


def test_non_maintainable_aggregates_refused(src):
    with pytest.raises(ValueError, match="min/max need a base-table rescan"):
        rollup_template(src, "r", ["region"], {"m": ("amount", "max")})
    with pytest.raises(ValueError, match="not in"):
        rollup_template(src, "r", ["nope"], MEASURES)


def test_repeated_incremental_refreshes_stay_exact(spark, src, dst):
    refresh_rollup(spark, src, dst, ["region"], MEASURES)
    for i in range(3):
        src.append(spark.createDataFrame(
            [("eu", float(i), 100 + i), ("ap", 1.5, 200 + i)],
            "region STRING, amount DOUBLE, id LONG",
        ))
        if i == 1:
            src.delete_where(spark, "region = 'eu' AND id < 3")
        r = refresh_rollup(spark, src, dst, ["region"], MEASURES)
        assert r["mode"] == "incremental"
        full, inc = _states(spark, src, dst)
        assert full == inc


def test_crash_between_merge_and_watermark_write_is_idempotent(spark, src, dst):
    """The watermark rides INSIDE the refresh's commit entry, so a crash
    after the merge commit but before the properties write cannot
    double-apply the (non-idempotent) deltas on the next refresh."""
    refresh_rollup(spark, src, dst, ["region"], MEASURES)
    src.append(spark.createDataFrame(
        [("eu", 100.0, 50)], "region STRING, amount DOUBLE, id LONG"
    ))
    # simulate the crash: the incremental merge commits, but the
    # properties-cache write never lands
    dst._write_meta = lambda meta: None  # instance shadow, dst only
    r = refresh_rollup(spark, src, dst, ["region"], MEASURES)
    assert r["mode"] == "incremental"
    assert (dst.meta.get("properties", {}) or {}).get("ivm_src_snapshot") != \
        src._entries()[-1]["snapshot_id"]  # the cache really is stale
    del dst.__dict__["_write_meta"]  # "restart": un-shadow the method
    # replay: watermark is read from the commit entry -> noop, no re-apply
    r2 = refresh_rollup(spark, src, dst, ["region"], MEASURES)
    assert r2["mode"] == "noop"
    full, inc = _states(spark, src, dst)
    assert full == inc  # eu total is 115.0, not 215.0
