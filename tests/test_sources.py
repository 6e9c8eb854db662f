"""Source-reader tests, mirroring the reference's format-dispatch and
path-security coverage (tests/test_source_assets.py:104-189) — but against
real files through the real Spark readers, not mocks."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from iceberg_quickstart_iac_spark.sources import (
    project_to_schema,
    read_source,
    validate_source_path,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)

LOCAL = ("file://",)


@pytest.fixture()
def local_dir(tmp_path):
    return tmp_path


def test_parquet_roundtrip(spark, local_dir):
    src = spark.createDataFrame([("a", 1.5), ("b", 2.5)], schema=SCHEMA)
    path = f"file://{local_dir}/pq"
    src.write.parquet(path)
    out = read_source(spark, {"path": path, "format": "parquet"}, SCHEMA, LOCAL)
    assert sorted((r.id, r.value) for r in out.collect()) == [("a", 1.5), ("b", 2.5)]
    assert out.schema["id"].dataType == T.StringType()


def test_csv_headerless_with_column_names(spark, local_dir):
    (local_dir / "data.csv").write_text("a|1.5\nb|2.5\n")
    source = {
        "path": f"file://{local_dir}/data.csv",
        "format": "csv",
        "csv_options": {"delimiter": "|", "column_names": ["id", "value"]},
    }
    out = read_source(spark, source, SCHEMA, LOCAL)
    assert sorted((r.id, r.value) for r in out.collect()) == [("a", 1.5), ("b", 2.5)]


def test_csv_column_names_reordered(spark, local_dir):
    (local_dir / "data.csv").write_text("1.5,a\n2.5,b\n")
    source = {
        "path": f"file://{local_dir}/data.csv",
        "format": "csv",
        "csv_options": {"column_names": ["value", "id"]},
    }
    out = read_source(spark, source, SCHEMA, LOCAL)
    # declared order restored by the schema projection
    assert out.columns == ["id", "value"]
    assert sorted((r.id, r.value) for r in out.collect()) == [("a", 1.5), ("b", 2.5)]


def test_csv_with_header(spark, local_dir):
    (local_dir / "data.csv").write_text("id,value\na,1.5\nb,2.5\n")
    source = {"path": f"file://{local_dir}/data.csv", "format": "csv"}
    out = read_source(spark, source, SCHEMA, LOCAL)
    assert sorted((r.id, r.value) for r in out.collect()) == [("a", 1.5), ("b", 2.5)]


def test_csv_skip_rows_before_header(spark, local_dir):
    (local_dir / "data.csv").write_text("# junk\n# more junk\nid,value\na,1.5\nb,2.5\n")
    source = {
        "path": f"file://{local_dir}/data.csv",
        "format": "csv",
        "csv_options": {"skip_rows": 2},
    }
    out = read_source(spark, source, SCHEMA, LOCAL)
    assert sorted((r.id, r.value) for r in out.collect()) == [("a", 1.5), ("b", 2.5)]


def test_csv_skip_rows_headerless_multifile(spark, local_dir):
    d = local_dir / "many"
    d.mkdir()
    (d / "f1.csv").write_text("junk\njunk\na,1.5\n")
    (d / "f2.csv").write_text("junk\njunk\nb,2.5\nc,3.5\n")
    source = {
        "path": f"file://{d}",
        "format": "csv",
        "csv_options": {"column_names": ["id", "value"], "skip_rows": 2},
    }
    out = read_source(spark, source, SCHEMA, LOCAL)
    assert sorted((r.id, r.value) for r in out.collect()) == [
        ("a", 1.5),
        ("b", 2.5),
        ("c", 3.5),
    ]


def test_json_cast_to_declared_schema(spark, local_dir):
    rows = [{"id": "a", "value": 1.5, "extra": "drop-me"}, {"id": "b", "value": 2}]
    (local_dir / "data.json").write_text("\n".join(json.dumps(r) for r in rows))
    source = {"path": f"file://{local_dir}/data.json", "format": "json"}
    out = read_source(spark, source, SCHEMA, LOCAL)
    assert out.columns == ["id", "value"]  # extra column dropped by declared schema
    assert sorted((r.id, r.value) for r in out.collect()) == [("a", 1.5), ("b", 2.0)]


def test_unsupported_format_rejected(spark):
    with pytest.raises(ValueError, match="Unsupported source format"):
        read_source(spark, {"path": "s3://b/x", "format": "avro"}, SCHEMA)


@pytest.mark.parametrize(
    "path",
    ["/etc/passwd", "file:///tmp/x", "../relative", "http://evil.example/x", "data"],
)
def test_path_schemes_rejected(path):
    with pytest.raises(ValueError, match="not allowed for security"):
        validate_source_path(path)


@pytest.mark.parametrize("path", ["s3://bucket/prefix/", "gs://bucket/x"])
def test_path_schemes_allowed(path):
    validate_source_path(path)  # no raise


def test_project_to_schema_casts_and_orders(spark):
    df = spark.createDataFrame([(1, "2.5", "x")], "value INT, id STRING, junk STRING")
    out = project_to_schema(df, SCHEMA)
    assert out.columns == ["id", "value"]
    row = out.collect()[0]
    assert (row.id, row.value) == ("2.5", 1.0)
