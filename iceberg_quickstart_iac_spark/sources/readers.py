"""Source readers: parquet / CSV / NDJSON with declared-schema enforcement.

Parity target: the reference's source-asset factory
(``dagster/lakehouse/assets/source_assets.py:36-80``):

- path-scheme allowlist (s3://, gs:// only — local/relative paths rejected,
  ``source_assets.py:20,37-41``);
- format dispatch parquet/csv/json, anything else rejected
  (``source_assets.py:71-72``) — Spark *could* read avro, but we keep the
  reference's contract;
- CSV honors ``csv_options``: ``delimiter``, ``column_names`` (headerless
  files), ``skip_rows`` (skipped per file);
- JSON is read with the declared schema (projection *is* the cast,
  ``source_assets.py:77-78``).

Scale notes: the parquet and csv fast paths are plain distributed file
scans (splittable, predicate/column pruning intact). ``skip_rows > 1`` has
no native Spark option, so that path reads one file per row (``wholetext``)
and parses lines JVM-side via ``posexplode`` + ``from_csv`` — exact
per-file semantics, bounded by per-task memory; fine for the header-junk
CSVs the option exists for, not for TB-scale single files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ALLOWED_SCHEMES = ("s3://", "gs://")

SUPPORTED_FORMATS = ("parquet", "csv", "json")


def validate_source_path(path: str, allowed_schemes: tuple[str, ...] = ALLOWED_SCHEMES) -> None:
    """Reject local / relative / unknown-scheme paths (path-traversal guard)."""
    if not any(path.startswith(scheme) for scheme in allowed_schemes):
        raise ValueError(
            f"Source path must start with one of {list(allowed_schemes)}, got: {path!r}. "
            "Local and arbitrary file paths are not allowed for security reasons."
        )


def project_to_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project/cast to exactly the declared columns, in declared order.

    The Spark analog of the reference's post-read cast: extra columns drop,
    declared columns cast to their declared types (missing columns raise at
    analysis time — schema enforcement, not silent nulls).
    """
    return df.select([F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields])


def _csv_read_schema(schema: T.StructType, column_names: list[str] | None) -> T.StructType:
    """Schema for the raw CSV scan: declared types matched by name; raw
    columns unknown to the declared schema read as string."""
    if not column_names:
        return schema
    by_name = {f.name: f for f in schema.fields}
    return T.StructType(
        [
            by_name.get(name, T.StructField(name, T.StringType(), True))
            for name in column_names
        ]
    )


def _read_csv_skipping(
    spark: SparkSession,
    path: str,
    read_schema: T.StructType,
    delimiter: str,
    skip_rows: int,
) -> DataFrame:
    """Exact per-file skip_rows > 1: wholetext → explode lines → from_csv."""
    raw = spark.read.text(path, wholetext=True)
    lines = raw.select(
        F.posexplode(F.split(F.col("value"), r"\r?\n")).alias("pos", "line")
    ).filter((F.col("pos") >= skip_rows) & (F.length("line") > 0))
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in read_schema.fields)
    parsed = lines.select(F.from_csv(F.col("line"), F.lit(ddl), {"sep": delimiter}).alias("rec"))
    return parsed.select("rec.*")


def read_source(
    spark: SparkSession,
    source: dict,
    schema: T.StructType,
    allowed_schemes: tuple[str, ...] = ALLOWED_SCHEMES,
) -> DataFrame:
    """Read a template ``source`` block into a DataFrame with the declared schema.

    ``source`` is the template's source dict: ``{path, format, csv_options}``
    (``table-templates/_schema.json:121-161``).
    """
    path = source["path"]
    validate_source_path(path, allowed_schemes)
    fmt = source.get("format", "parquet")

    if fmt == "parquet":
        df = spark.read.schema(schema).parquet(path)
    elif fmt == "csv":
        opts = source.get("csv_options") or {}
        delimiter = opts.get("delimiter", ",")
        column_names = opts.get("column_names")
        skip_rows = int(opts.get("skip_rows", 0))
        read_schema = _csv_read_schema(schema, column_names)
        # pyarrow semantics (reference): with column_names the file is
        # headerless; without, the first post-skip line is the header.
        header_lines = 0 if column_names else 1
        total_skip = skip_rows + header_lines
        if total_skip > 1:
            df = _read_csv_skipping(spark, path, read_schema, delimiter, total_skip)
        else:
            df = (
                spark.read.schema(read_schema)
                .options(sep=delimiter, header=(total_skip == 1))
                .csv(path)
            )
        df = project_to_schema(df, schema)
    elif fmt == "json":
        df = spark.read.schema(schema).json(path)
    else:
        raise ValueError(f"Unsupported source format: {fmt!r}. Use 'parquet', 'csv', or 'json'.")

    return df
