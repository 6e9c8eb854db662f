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


def sample_priority(id_col: Column | str, weight_col: Column | str) -> Column:
    """Efraimidis–Spirakis sampling priority: for uniform u in (0,1),
    taking the k SMALLEST ``-ln(u)/w`` draws a weight-proportional sample
    without replacement (the exponential-race formulation of A-Res,
    "Weighted random sampling with a reservoir", IPL 2006). ``u`` derives
    from the Knuth id hash instead of ``rand()`` — reproducible across
    runs, partitionings, and engines (the same expression replays in
    DuckDB for the oracle)."""
    wc = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (id_hash(id_col) + F.lit(0.5)) / F.lit(float(MOD32))
    return -F.log(u) / wc


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
    strata_cols: list[str] | None = None,
) -> DataFrame:
    """Exactly ``k`` rows drawn weight-proportionally WITHOUT replacement
    (per stratum when ``strata_cols`` is given) — quality-weighted corpus
    subsetting: sampling pretraining docs proportional to a quality score
    or length without a biased with-replacement draw. Deterministic and
    partition-independent (see :func:`sample_priority`).

    Rows with non-positive weight are excluded (zero weight = never
    sampled; the exponential race is undefined there).

    Scale: the global form plans ``TakeOrderedAndProject`` — per-partition
    top-k heaps merged on the driver, NO global sort, no single-partition
    window. The stratified form sorts per stratum (one shuffle on the
    strata keys); same pre-filter guidance as :func:`stratified_sample`
    for huge strata.
    """
    pri = sample_priority(id_col, weight_col)
    eligible = df.filter(F.col(weight_col) > 0)
    if strata_cols:
        w = W.partitionBy(*strata_cols).orderBy(pri, F.col(id_col))
        return (
            eligible.withColumn("sample_rank", F.row_number().over(w))
            .filter(F.col("sample_rank") <= k)
        )
    return eligible.orderBy(pri, F.col(id_col)).limit(k)


def temperature_mixture_sample(
    df: DataFrame,
    source_col: str,
    k: int,
    id_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled source mixing (the Gopher / LLaMA data-recipe
    op): draw ``k`` rows so each source's expected share of the sample is
    proportional to ``n_source^alpha`` — ``alpha=1`` reproduces natural
    frequency, ``alpha=0`` equalizes sources, values between down-weight
    a dominant crawl without dropping it.

    Mechanics: a per-row weight ``n_source^(alpha-1)`` (one tiny
    broadcast-joined count aggregate — |sources| rows), then the
    deterministic Efraimidis–Spirakis draw (:func:`weighted_sample`):
    source mass ∝ n_s · n_s^(alpha-1) = n_s^alpha. Inherits E-S's
    without-replacement exactness, partition independence, and
    engine-portable arithmetic (the oracle replays it); plans a
    broadcast join + TakeOrderedAndProject — no global sort, no skew
    (the weight varies per SOURCE, the heap per partition).
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n_source"))
    weighted = df.join(F.broadcast(counts), source_col).withColumn(
        "_mix_w",
        F.pow(F.col("_n_source").cast("double"), F.lit(alpha - 1.0)),
    )
    return weighted_sample(weighted, "_mix_w", k, id_col).drop(
        "_mix_w", "_n_source"
    )


def assign_training_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str,
    with_position: bool = False,
) -> DataFrame:
    """Deterministic shard assignment for training-data export — the last
    mile of a pretraining pipeline: split the curated corpus into
    ``n_shards`` reproducibly pseudo-random shards a distributed trainer
    streams independently. Adds ``shard`` (0-based).

    ``shard = id_hash(id) % n_shards``: hash-mod is the 100 TB answer —
    expected-balanced with deviation O(sqrt(n/shards)), zero global
    coordination, stable under repartitioning, and portable to any SQL
    engine (the oracle replays it). An EXACTLY-balanced split
    (ntile/global row_number) needs a total ordering — a single-task
    sort bottleneck — for ±O(sqrt) less imbalance than training ever
    notices.

    ``with_position=True`` adds ``shard_pos`` (1-based rank in
    ``(id_hash, id)`` order within the shard): a sequential reader of one
    shard then sees a reproducibly pre-shuffled sample stream with no
    global shuffle anywhere — one window per shard, external-sort
    spillable; size shards to task memory by choosing ``n_shards``.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    # pmod, not %: Spark's % follows the dividend's sign, so a NEGATIVE id
    # would land in a negative "shard" (and disagree with Python's %).
    # For non-negative ids pmod == %, which is what the SQL oracle replays.
    out = df.withColumn(
        "shard", F.pmod(id_hash(id_col), F.lit(n_shards)).cast("long")
    )
    if with_position:
        w = W.partitionBy("shard").orderBy(id_hash(id_col), F.col(id_col))
        out = out.withColumn("shard_pos", F.row_number().over(w))
    return out


def shard_manifest(df: DataFrame, n_shards: int, id_col: str) -> DataFrame:
    """Per-shard manifest of a training export: row count and id-range
    per shard (what a trainer's data loader checks before a run). One
    hash-partitioned aggregation; no sort, no window."""
    return (
        assign_training_shards(df, n_shards, id_col)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
        )
    )
