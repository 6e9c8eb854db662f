"""Deterministic sampling for dataset curation (SURVEY §2.13 extension).

Training-data pipelines need samples that are (a) reproducible across runs
and engines, (b) independent of row order / partitioning, and (c) exact in
size per stratum. ``rand(seed)`` fails (a)+(b) — it depends on task split
layout. Everything here keys off a Knuth multiplicative hash of the row id
instead: pure integer arithmetic, portable to any SQL engine, stable under
repartitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

#: Knuth's multiplicative constant (2^32 / phi); products stay < 2^63 for
#: any realistic id, so the arithmetic is ANSI-overflow-safe
KNUTH = 2654435761
MOD32 = 4294967296


def id_hash(id_col: Column | str) -> Column:
    """Order-independent pseudo-random key in [0, 2^32) from an integer id."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (c * F.lit(KNUTH)) % F.lit(MOD32)


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str,
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum, chosen by hash order.

    The pick is the first n rows per stratum ordered by (id_hash, id) — a
    deterministic pseudo-random draw with an exact per-stratum count, which
    fraction-based ``sampleBy`` cannot guarantee. Adds ``sample_rank``
    (1-based within stratum).

    Scale note: the per-stratum window sorts each stratum once. At 100 TB
    with huge strata, pre-filter with ``id_hash(id) < threshold`` sized to
    keep ~3-5x n_per_stratum rows (Chernoff-safe), THEN window — the sort
    input drops from the full stratum to a few multiples of the sample.
    """
    w = W.partitionBy(*strata_cols).orderBy(id_hash(id_col), F.col(id_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_stratum)
    )
