"""Spark conf for a real Iceberg catalog, dispatched on LAKEHOUSE_BACKEND.

Parity target: the reference's backend dispatch
(``dagster/lakehouse/resources/iceberg.py:18-40``): ``aws-glue`` (default),
``aws-nessie`` (REST, requires NESSIE_URI), ``gcp`` (REST), unknown backend
rejected. Here the same environment contract produces *Spark* session confs
for the ``iceberg-spark-runtime`` extension instead of PyIceberg kwargs —
plus a ``local-hadoop`` backend the reference lacks (dev/test warehouse on a
local path; no services needed).

The runtime jar is not present in this environment, so these configs are
exercised the way the reference tests its own (``tests/test_iceberg.py``):
as a pure config matrix.
"""

from __future__ import annotations

import os
from collections.abc import Mapping

CATALOG_NAME = "lakehouse"

_ICEBERG_EXTENSION = "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
_SPARK_CATALOG_IMPL = "org.apache.iceberg.spark.SparkCatalog"


def spark_catalog_conf(
    backend: str | None = None,
    env: Mapping[str, str] | None = None,
    catalog: str = CATALOG_NAME,
) -> dict[str, str]:
    """Build the Spark conf dict for the selected Iceberg backend.

    Raises ``KeyError`` for a missing required env var (aws-nessie needs
    NESSIE_URI — same contract as the reference) and ``ValueError`` for an
    unknown backend.
    """
    env = env if env is not None else os.environ
    backend = backend or env.get("LAKEHOUSE_BACKEND", "aws-glue")
    prefix = f"spark.sql.catalog.{catalog}"

    conf = {
        "spark.sql.extensions": _ICEBERG_EXTENSION,
        prefix: _SPARK_CATALOG_IMPL,
    }

    if backend == "aws-glue":
        conf.update(
            {
                f"{prefix}.catalog-impl": "org.apache.iceberg.aws.glue.GlueCatalog",
                f"{prefix}.io-impl": "org.apache.iceberg.aws.s3.S3FileIO",
                f"{prefix}.client.region": env.get("AWS_REGION", "us-east-1"),
            }
        )
    elif backend == "aws-nessie":
        conf.update(
            {
                f"{prefix}.type": "rest",
                f"{prefix}.uri": env["NESSIE_URI"],
                f"{prefix}.io-impl": "org.apache.iceberg.aws.s3.S3FileIO",
                f"{prefix}.client.region": env.get("AWS_REGION", "us-east-1"),
            }
        )
    elif backend == "gcp":
        conf.update(
            {
                f"{prefix}.type": "rest",
                f"{prefix}.uri": env.get("ICEBERG_REST_URI", ""),
                f"{prefix}.io-impl": "org.apache.iceberg.gcp.gcs.GCSFileIO",
                f"{prefix}.gcs.project-id": env.get("GCP_PROJECT_ID", ""),
            }
        )
    elif backend == "local-hadoop":
        conf.update(
            {
                f"{prefix}.type": "hadoop",
                f"{prefix}.warehouse": env.get("LAKEHOUSE_WAREHOUSE", "/tmp/lakehouse-warehouse"),
            }
        )
    else:
        raise ValueError(f"Unknown LAKEHOUSE_BACKEND: {backend}")

    return conf
