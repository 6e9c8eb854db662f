"""Multimodal (image/audio/video) column plumbing (SURVEY §2.13 X5).

Media travel as opaque ``binary`` columns + a typed metadata struct —
the lakehouse pattern for 100 TB multimodal corpora: bytes in parquet (or
path pointers for very large blobs), metadata queryable/partitionable
without touching the payload.

The Spark-side plumbing here is REAL and tested: schemas, Arrow-batched
``mapInPandas`` decode/feature/resize/frame-sample operators with correct
batch shapes and partitioning behavior. The codec layer itself is STUBBED —
this container ships no image/audio libraries — behind
``decoder="fake"`` (deterministic bytes-derived pseudo-decode, so pipelines
are testable end-to-end) vs ``decoder="real"`` (raises ``NotImplementedError``
naming the dependency to install on a production cluster).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: media row contract: payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime_type", T.StringType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

_FEATURE_DIM = 16


def _require_real_decoder(kind: str) -> None:
    raise NotImplementedError(
        f"Real {kind} decoding needs Pillow/torchaudio/av on the cluster "
        "(not present in this environment). Use decoder='fake' for "
        "pipeline testing — it is deterministic on the content bytes."
    )


def _fake_features(content: bytes | None, dim: int = _FEATURE_DIM) -> list[float]:
    """Deterministic pseudo-features from a SHA-256 of the bytes."""
    if content is None:
        return [0.0] * dim
    digest = hashlib.sha256(content).digest()
    return [digest[i] / 255.0 for i in range(dim)]


def attach_byte_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Fill meta.n_bytes from the payload (cheap, JVM-side)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
            F.length(F.col(content_col)).cast("long").alias("n_bytes"),
        ),
    )


def extract_features(
    df: DataFrame,
    decoder: str = "fake",
    content_col: str = "content",
    id_col: str = "media_id",
    dim: int = _FEATURE_DIM,
) -> DataFrame:
    """Decode + feature-extract each media payload → (media_id, features).

    Arrow-batched ``mapInPandas``: the decode loop sees pandas batches, not
    rows — swap ``_fake_features`` for a real model/codec call and the
    partitioning, schema, and batch shape stay identical.
    """
    if decoder == "real":
        _require_real_decoder("media")
    if decoder != "fake":
        raise ValueError(f"Unknown decoder {decoder!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [_fake_features(c, dim) for c in pdf[content_col]],
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        run, schema=f"{id_col} long, features array<double>"
    )


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    decoder: str = "fake",
    content_col: str = "content",
) -> DataFrame:
    """Resize every image payload; fake mode passes bytes through and
    rewrites the declared dimensions (plumbing-faithful: output schema,
    meta update, batch shape all real)."""
    if decoder == "real":
        _require_real_decoder("image")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pdf

    resized = df.mapInPandas(run, schema=df.schema)
    return resized.withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
            F.col("meta.n_bytes").alias("n_bytes"),
        ),
    )


def sample_frames(
    df: DataFrame,
    every_ms: int,
    decoder: str = "fake",
    id_col: str = "media_id",
) -> DataFrame:
    """Explode each video row into frame rows every ``every_ms``.

    Fake mode emits one row per sampled instant with a bytes-derived frame
    id; real mode would decode actual frames at those instants. The fan-out
    shape (posexplode on a JVM-computed instant sequence) is the real
    production plan either way.
    """
    if decoder == "real":
        _require_real_decoder("video")
    instants = F.sequence(
        F.lit(0).cast("long"),
        F.coalesce(F.col("meta.duration_ms"), F.lit(0)).cast("long"),
        F.lit(every_ms).cast("long"),
    )
    return (
        df.select(id_col, "content", F.posexplode(instants).alias("frame_index", "frame_ms"))
        .withColumn("frame_fingerprint", F.xxhash64(F.col("content"), F.col("frame_ms")))
        .drop("content")
    )
