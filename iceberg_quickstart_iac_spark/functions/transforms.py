"""Iceberg partition transforms as scalar column functions (SURVEY §2.8
F2-F4, §4 "hard parts" #2).

On a real Iceberg catalog, DDL uses the engine-side transforms
(``bucket(16, c)``) and queries prune through hidden partitioning — these
scalars exist for parity *outside* DDL (e.g. computing the partition a row
would land in, or pre-bucketing a join).

Exactness matters for ``bucket``: the Iceberg spec pins it to
**Murmur3 x86 32-bit, seed 0** over a type-specific byte encoding
(int/long → 8-byte little-endian, string → UTF-8, per
https://iceberg.apache.org/spec/#appendix-b-32-bit-hash-requirements).
Spark's built-in ``hash()`` is Murmur3 with seed 42 and different int
widening — NOT compatible — so the exact hash runs as a vectorized pandas
UDF (Arrow-batched numpy mumur3; fine off the hot path, and partition
computation is a write-side concern anyway).

``year/month/day/hour`` transforms are plain Spark built-ins
(``date_trunc`` family); ``truncate[W]`` is width-truncation per type.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _murmur3_32(data: np.ndarray) -> np.ndarray:
    """Vectorized Murmur3 x86 32-bit (seed 0) over fixed 8-byte rows."""
    c1 = np.uint32(0xCC9E2D51)
    c2 = np.uint32(0x1B873593)
    h = np.zeros(len(data) // 8, dtype=np.uint32)  # seed 0, one state per 8-byte row
    # two 4-byte little-endian blocks per 8-byte value
    blocks = data.reshape(-1, 8).view("<u4")
    with np.errstate(over="ignore"):
        for i in range(2):
            k = blocks[:, i].copy()
            k *= c1
            k = (k << np.uint32(15)) | (k >> np.uint32(17))
            k *= c2
            h ^= k
            h = (h << np.uint32(13)) | (h >> np.uint32(19))
            h = h * np.uint32(5) + np.uint32(0xE6546B64)
        h ^= np.uint32(8)  # length
        h ^= h >> np.uint32(16)
        h *= np.uint32(0x85EBCA6B)
        h ^= h >> np.uint32(13)
        h *= np.uint32(0xC2B2AE35)
        h ^= h >> np.uint32(16)
    return h.view(np.int32)


def _murmur3_32_bytes(value: bytes) -> int:
    """Scalar Murmur3 x86 32-bit (seed 0) for arbitrary-length byte strings."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    mask = 0xFFFFFFFF
    h = 0
    n = len(value)
    for off in range(0, n - n % 4, 4):
        k = int.from_bytes(value[off : off + 4], "little")
        k = (k * c1) & mask
        k = ((k << 15) | (k >> 17)) & mask
        k = (k * c2) & mask
        h ^= k
        h = ((h << 13) | (h >> 19)) & mask
        h = (h * 5 + 0xE6546B64) & mask
    tail = value[n - n % 4 :]
    if tail:
        k = int.from_bytes(tail.ljust(4, b"\x00"), "little")
        k = (k * c1) & mask
        k = ((k << 15) | (k >> 17)) & mask
        k = (k * c2) & mask
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & mask
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & mask
    h ^= h >> 16
    return h - (1 << 32) if h >= 1 << 31 else h


def iceberg_bucket(col: Column | str, n: int, spark_type: str = "long") -> Column:
    """Iceberg ``bucket[n]`` — spec-exact Murmur3(seed 0) mod n.

    ``spark_type``: 'int'/'long' (hashed as 8-byte little-endian long, per
    spec int and long hash identically) or 'string' (UTF-8 bytes).
    """
    c = F.col(col) if isinstance(col, str) else col

    if spark_type in ("int", "long"):

        @F.pandas_udf(T.IntegerType())
        def bucket_long(s: pd.Series) -> pd.Series:
            vals = s.to_numpy(dtype="int64", na_value=0)
            raw = vals.astype("<i8").tobytes()
            hashes = _murmur3_32(np.frombuffer(raw, dtype=np.uint8))
            out = pd.Series((hashes & 0x7FFFFFFF) % n, dtype="Int32", index=s.index)
            out[s.isna()] = pd.NA
            return out

        return bucket_long(c.cast("long"))

    if spark_type == "string":

        @F.pandas_udf(T.IntegerType())
        def bucket_str(s: pd.Series) -> pd.Series:
            return s.map(
                lambda v: None
                if v is None
                else (_murmur3_32_bytes(str(v).encode("utf-8")) & 0x7FFFFFFF) % n
            )

        return bucket_str(c)

    raise ValueError(f"Unsupported bucket source type: {spark_type!r}")


def iceberg_truncate(col: Column | str, width: int, spark_type: str = "string") -> Column:
    """Iceberg ``truncate[W]``: strings → first W chars; integers →
    floor-to-width (``v - (((v % W) + W) % W)``, exact for negatives)."""
    c = F.col(col) if isinstance(col, str) else col
    if spark_type == "string":
        return F.substring(c, 1, width)
    if spark_type in ("int", "long"):
        return c - (((c % width) + width) % width)
    raise ValueError(f"Unsupported truncate source type: {spark_type!r}")


def transform_column(col: Column | str, transform: str, spark_type: str = "long") -> Column:
    """Apply any template partition transform as a scalar column."""
    import re

    c = F.col(col) if isinstance(col, str) else col
    if transform == "identity":
        return c
    if transform == "year":
        return F.year(c)
    if transform == "month":
        return F.month(c)
    if transform == "day":
        return F.to_date(c)
    if transform == "hour":
        return F.date_trunc("hour", c)
    m = re.match(r"^bucket\[(\d+)\]$", transform)
    if m:
        return iceberg_bucket(c, int(m.group(1)), spark_type)
    m = re.match(r"^truncate\[(\d+)\]$", transform)
    if m:
        return iceberg_truncate(c, int(m.group(1)), spark_type)
    raise ValueError(f"Unknown transform: {transform!r}")
