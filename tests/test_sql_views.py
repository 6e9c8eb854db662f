"""Catalog views (round 10): versioned SQL text served through the
governed front door — the Iceberg view-spec analog (definition history,
invoker-rights resolution at read time)."""

from __future__ import annotations

import pytest

from iceberg_quickstart_iac_spark.tables import Lakehouse
from iceberg_quickstart_iac_spark.tables.snapstore import TableNotFoundError


@pytest.fixture()
def lake(tmp_path):
    return Lakehouse(tmp_path / "view_lake")


def _seed(spark, lake):
    lake.sql(spark, "CREATE TABLE vt (k BIGINT NOT NULL, grp STRING)")
    lake.sql(
        spark,
        "INSERT INTO vt SELECT id AS k, "
        "CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END AS grp "
        "FROM range(0, 10)",
    )


def test_view_follows_head_and_replace_versions(spark, lake):
    _seed(spark, lake)
    r = lake.sql(
        spark,
        "CREATE VIEW v_even COMMENT 'even rows' "
        "AS SELECT k FROM vt WHERE grp = 'even'",
    )
    assert r == {"operation": "create_view", "view": "v_even", "version": 0}
    assert lake.sql(spark, "SELECT COUNT(*) AS n FROM v_even").first().n == 5
    # expansion memo: a repeat read against an unchanged head re-expands
    # NOTHING (the registry entry is identical before and after)
    memo_before = dict(lake._sql_registry)
    assert lake.sql(spark, "SELECT COUNT(*) AS n FROM v_even").first().n == 5
    assert lake._sql_registry == memo_before
    # a commit to the underlying table re-expands on the next statement
    lake.sql(spark, "INSERT INTO vt SELECT id AS k, 'even' AS grp "
                    "FROM range(100, 103)")
    assert lake.sql(spark, "SELECT COUNT(*) AS n FROM v_even").first().n == 8
    # CREATE OR REPLACE appends version 1 and serves immediately
    r2 = lake.sql(
        spark,
        "CREATE OR REPLACE VIEW v_even AS "
        "SELECT k FROM vt WHERE grp = 'odd'",
    )
    assert r2["version"] == 1
    assert lake.sql(spark, "SELECT COUNT(*) AS n FROM v_even").first().n == 5
    # bare CREATE on an existing view is loud
    with pytest.raises(ValueError, match="already exists"):
        lake.sql(spark, "CREATE VIEW v_even AS SELECT 1")
    # definition history: version 0 still serves (against CURRENT data)
    n0 = lake.sql(
        spark, "SELECT COUNT(*) AS n FROM v_even FOR VERSION AS OF 0"
    ).first().n
    assert n0 == 8
    # SHOW VIEWS lists it with its current version + comment... of the
    # CURRENT version (None here — version 1 had no COMMENT clause)
    sv = lake.sql(spark, "SHOW VIEWS").collect()
    assert [(r.view_name, r.current_version) for r in sv] == [("v_even", 1)]


def test_view_on_view_and_cycle_guard(spark, lake):
    _seed(spark, lake)
    lake.sql(spark, "CREATE VIEW v1 AS SELECT k FROM vt WHERE k >= 4")
    lake.sql(spark, "CREATE VIEW v2 AS SELECT k FROM v1 WHERE k < 8")
    assert lake.sql(
        spark, "SELECT COUNT(*) AS n FROM v2"
    ).first().n == 4
    # nested freshness: a commit re-expands v2 through v1
    lake.sql(spark, "INSERT INTO vt SELECT 5 AS k, 'x' AS grp")
    assert lake.sql(
        spark, "SELECT COUNT(*) AS n FROM v2"
    ).first().n == 5
    # a definition cycle raises instead of recursing forever
    lake.create_view("c1", "SELECT * FROM c2")
    lake.create_view("c2", "SELECT * FROM c1")
    with pytest.raises(ValueError, match="cycle"):
        lake.sql(spark, "SELECT * FROM c1")


def test_view_invoker_rights_governance(spark, lake):
    # a view over a table with a restricted column serves the INVOKER'S
    # projection: the reader never sees the restricted column even
    # though an admin created the view
    lake.create_table(
        {
            "name": "gt",
            "namespace": "default",
            "columns": [
                {"name": "k", "type": "long"},
                {"name": "email", "type": "string",
                 "access_level": "restricted"},
            ],
        }
    )
    t = lake.table("gt")
    t.append(spark.sql("SELECT id AS k, CONCAT('u', id, '@x.io') AS email "
                       "FROM range(0, 4)"))
    lake.sql(spark, "CREATE VIEW gv AS SELECT * FROM gt")
    admin_cols = lake.sql(spark, "SELECT * FROM gv").columns
    assert "email" in admin_cols
    reader_cols = lake.sql(
        spark, "SELECT * FROM gv", access_level="reader"
    ).columns
    assert "email" not in reader_cols


def test_view_name_collisions_and_dml_reject(spark, lake):
    _seed(spark, lake)
    lake.sql(spark, "CREATE VIEW v3 AS SELECT k FROM vt")
    # table/view namespace is shared, both directions
    with pytest.raises(ValueError, match="is a view"):
        lake.sql(spark, "CREATE TABLE v3 (x INT)")
    with pytest.raises(ValueError, match="is a table"):
        lake.sql(spark, "CREATE VIEW vt AS SELECT 1")
    # DML against a view is a loud read-only reject
    with pytest.raises(TableNotFoundError, match="read-only"):
        lake.sql(spark, "INSERT INTO v3 SELECT 99")
    # a view is a valid DML SOURCE
    lake.sql(spark, "CREATE TABLE sink (k BIGINT)")
    lake.sql(spark, "INSERT INTO sink SELECT k FROM v3 WHERE k < 3")
    assert lake.sql(spark, "SELECT COUNT(*) AS n FROM sink").first().n == 3


def test_view_drop_and_temp_view_passthrough(spark, lake):
    _seed(spark, lake)
    lake.sql(spark, "CREATE VIEW vd AS SELECT k FROM vt")
    assert lake.sql(spark, "SELECT COUNT(*) AS n FROM vd").first().n == 10
    r = lake.sql(spark, "DROP VIEW vd")
    assert r == {"operation": "drop_view", "view": "vd", "dropped": True}
    # the drop retracts the session temp view too: a post-drop SELECT
    # errors instead of silently serving the stale expansion
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        lake.sql(spark, "SELECT COUNT(*) AS n FROM vd").collect()
    assert lake.sql(spark, "DROP VIEW IF EXISTS vd")["dropped"] is False
    with pytest.raises(TableNotFoundError):
        lake.sql(spark, "DROP VIEW vd")
    assert lake.list_views() == []
    # CREATE TEMP VIEW is NOT catalog DDL — it passes through to
    # spark.sql and lands in the session catalog, not on disk
    lake.sql(spark, "CREATE OR REPLACE TEMP VIEW tv AS SELECT 1 AS one")
    assert spark.table("tv").count() == 1
    assert lake.list_views() == []
    spark.catalog.dropTempView("tv")


def test_view_on_catalog_branch_scope(spark, lake):
    _seed(spark, lake)
    lake.sql(spark, "CREATE VIEW vb AS SELECT k FROM vt WHERE k >= 5")
    br = lake.create_branch("vbranch")
    # branch DML is isolated; the view serves per scope
    br.sql(spark, "INSERT INTO vt SELECT 50 AS k, 'even' AS grp")
    assert br.sql(spark, "SELECT COUNT(*) AS n FROM vb").first().n == 6
    assert lake.sql(spark, "SELECT COUNT(*) AS n FROM vb").first().n == 5
    # a main-catalog DROP retracts the BRANCH-SCOPE registration too —
    # the suffixed temp view must not keep serving the dropped definition
    from pyspark.errors import AnalysisException

    lake.sql(spark, "DROP VIEW vb")
    with pytest.raises(AnalysisException):
        br.sql(spark, "SELECT COUNT(*) AS n FROM vb").collect()
    with pytest.raises(AnalysisException):
        lake.sql(spark, "SELECT COUNT(*) AS n FROM vb").collect()
