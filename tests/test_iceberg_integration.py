"""Guarded REAL-Iceberg integration test (VERDICT r3 next-round #8).

The sandbox ships no ``iceberg-spark-runtime`` jar, so
``tables/catalog_conf.py`` is otherwise only exercisable as a config
matrix. This test makes the real-catalog claim falsifiable: it SKIPS
unless an iceberg-spark-runtime jar is on the classpath, and when one is
present (a real cluster / a dev box with the jar dropped into pyspark's
jars dir) it drives the full catalog_conf → DDL-template → write →
time-travel lifecycle against an actual Iceberg hadoop catalog.

The lifecycle runs in a SUBPROCESS: Iceberg's session extensions must be
set before JVM start, and the suite's shared session (a process
singleton) cannot be restarted without breaking every other test.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pytest


def _find_iceberg_jar() -> str | None:
    jar_dirs = []
    try:
        import pyspark

        jar_dirs.append(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
    except ImportError:
        pass
    if os.environ.get("SPARK_HOME"):
        jar_dirs.append(os.path.join(os.environ["SPARK_HOME"], "jars"))
    if os.environ.get("ICEBERG_SPARK_JAR"):
        return os.environ["ICEBERG_SPARK_JAR"]
    for d in jar_dirs:
        hits = sorted(glob.glob(os.path.join(d, "iceberg-spark-runtime*.jar")))
        if hits:
            return hits[0]
    return None


_JAR = _find_iceberg_jar()

# Runs in a fresh interpreter: builds the Iceberg session from
# catalog_conf, creates namespace+table from the DDL templates, appends
# twice, checks snapshot history and VERSION AS OF time-travel.
_LIFECYCLE = r"""
import json, sys
warehouse, jar = sys.argv[1], sys.argv[2]

from pyspark.sql import SparkSession
from iceberg_quickstart_iac_spark.tables.catalog_conf import spark_catalog_conf
from iceberg_quickstart_iac_spark.templates.ddl import (
    create_namespace_ddl, create_table_ddl,
)

conf = spark_catalog_conf(backend="local-hadoop",
                          env={"LAKEHOUSE_WAREHOUSE": warehouse})
builder = (SparkSession.builder.master("local[2]")
           .appName("iceberg-integration")
           .config("spark.jars", jar)
           .config("spark.ui.enabled", "false"))
for k, v in conf.items():
    builder = builder.config(k, v)
spark = builder.getOrCreate()

template = {
    "name": "it_events",
    "namespace": "integration",
    "columns": [
        {"name": "event_id", "type": "string", "required": True},
        {"name": "ts", "type": "timestamptz"},
        {"name": "value", "type": "double"},
    ],
    "partition_spec": [{"column": "ts", "transform": "day"}],
}
spark.sql(create_namespace_ddl(template))
spark.sql(create_table_ddl(template))

fq = "lakehouse.integration.it_events"
spark.sql(f"INSERT INTO {fq} VALUES ('e1', timestamp'2024-01-01 10:00:00', 1.0)")
spark.sql(f"INSERT INTO {fq} VALUES ('e2', timestamp'2024-01-02 10:00:00', 2.0)")

snaps = spark.sql(f"SELECT snapshot_id FROM {fq}.snapshots ORDER BY committed_at").collect()
assert len(snaps) == 2, snaps
first = snaps[0].snapshot_id
n_now = spark.table(fq).count()
n_then = spark.sql(f"SELECT * FROM {fq} VERSION AS OF {first}").count()
assert (n_now, n_then) == (2, 1), (n_now, n_then)
print(json.dumps({"ok": True, "snapshots": len(snaps)}))
"""


@pytest.mark.skipif(
    _JAR is None,
    reason="no iceberg-spark-runtime jar on the classpath (expected in this sandbox); "
    "drop one into pyspark/jars or set ICEBERG_SPARK_JAR to enable",
)
def test_real_iceberg_lifecycle(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _LIFECYCLE, str(tmp_path / "warehouse"), _JAR],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert '"ok": true' in proc.stdout


def test_guard_detects_jar_via_env(tmp_path, monkeypatch):
    """The guard itself is testable without the jar: an explicit
    ICEBERG_SPARK_JAR short-circuits the classpath scan."""
    monkeypatch.setenv("ICEBERG_SPARK_JAR", str(tmp_path / "iceberg-spark-runtime-x.jar"))
    assert _find_iceberg_jar() == str(tmp_path / "iceberg-spark-runtime-x.jar")
