"""Mirror of the driver's t2 correctness gate: every catalog query with an
oracle must match DuckDB on row count, column names, and values
(order-insensitive)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from iceberg_quickstart_iac_spark.plans import oracle_sql, queries

# include_retired: queries retired from the 50-slot driver gate (capacity
# policy item 3) keep exact-value oracle coverage HERE — retirement changes
# which harness certifies them, never whether they are verified
QUERIES = queries(include_retired=True)
ORACLES = oracle_sql(include_retired=True)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), f"{name}: column names differ"
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    s, o = normalize(spark_pdf), normalize(oracle_pdf)
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                assert a == b, f"{name}.{col}[{i}]: {a!r} != {b!r} (diff {a - b!r})"
            else:
                assert str(a) == str(b), f"{name}.{col}[{i}]: {a!r} != {b!r}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    oracle_pdf = duck.sql(ORACLES[name]).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)


def test_queries_nonempty(spark, sf_dir):
    for name, fn in QUERIES.items():
        assert fn(spark, sf_dir).count() >= 0, name
