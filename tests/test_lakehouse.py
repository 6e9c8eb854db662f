"""Catalog-level branching (Nessie semantics lifted to the lakehouse):
branch the whole catalog, touch some tables in isolation, publish
all-or-validate-first, or drop the branch leaving main untouched."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_quickstart_iac_spark.tables import Lakehouse, SnapTable
from iceberg_quickstart_iac_spark.tables.snapstore import CommitConflictError


def _tpl(name):
    return {
        "name": name, "namespace": "lakehouse",
        "columns": [{"name": "k", "type": "long"}, {"name": "v", "type": "string"}],
    }


@pytest.fixture()
def lake(spark, tmp_path):
    lh = Lakehouse(tmp_path / "lake")
    for n in ("a", "b", "c"):
        t = lh.create_table(_tpl(n))
        t.append(spark.createDataFrame([(1, n)], "k LONG, v STRING"))
    return lh


def test_catalog_branch_isolates_and_merges(spark, lake):
    br = lake.create_branch("migration")
    assert lake.list_branches() == ["migration"]
    # touch two of three tables on the branch
    br.table("a").append(spark.createDataFrame([(2, "a2")], "k LONG, v STRING"))
    br.table("b").evolve_add_column("note", "string")
    br.table("b").append(
        spark.createDataFrame([(2, "b2", "x")], "k LONG, v STRING, note STRING")
    )
    # laziness: untouched table has no per-table branch
    assert br._touched() == ["a", "b"]
    # main unaffected
    assert lake.table("a").read(spark).count() == 1
    assert "note" not in [c["name"] for c in lake.table("b").meta["columns"]]
    # publish: both tables land, branch refs are gone
    out = br.merge()
    assert sorted(out["merged_tables"]) == ["a", "b"]
    assert lake.table("a").read(spark).count() == 2
    assert lake.table("b").read(spark).filter("note = 'x'").count() == 1
    assert lake.list_branches() == []
    assert lake.table("a").list_branches() == []


def test_catalog_branch_validation_blocks_whole_publish(spark, lake):
    br = lake.create_branch("risky")
    br.table("a").append(spark.createDataFrame([(2, "a2")], "k LONG, v STRING"))
    # conflict on b: branch evolves schema AND main evolves schema
    br.table("b").evolve_add_column("x", "string")
    lake.table("b").evolve_add_column("y", "string")
    with pytest.raises(CommitConflictError, match="nothing was merged"):
        br.merge()
    # validation-first: table a did NOT land on main
    assert lake.table("a").read(spark).count() == 1
    # the branch survives for manual resolution
    assert lake.list_branches() == ["risky"]
    assert br.table("a").read(spark).count() == 2


def test_catalog_branch_delete_abandons_cleanly(spark, lake):
    br = lake.create_branch("wap")
    br.table("a").append(spark.createDataFrame([(9, "bad")], "k LONG, v STRING"))
    br.delete()
    assert lake.list_branches() == []
    assert lake.table("a").list_branches() == []
    assert lake.table("a").read(spark).count() == 1


def test_lakehouse_table_registry(lake, tmp_path):
    assert lake.list_tables() == ["a", "b", "c"]
    with pytest.raises(ValueError, match="already exists"):
        lake.create_table(_tpl("a"))
    with pytest.raises(Exception):
        lake.table("nope")
    with pytest.raises(ValueError, match="No catalog branch"):
        lake.branch("ghost")
