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


# ---------------------------------------------------------------------------
# REAL header-metadata parsing — no codec library involved. Container
# headers (PNG/GIF/WAV) put dimensions/rates at FIXED offsets, so width,
# height, and duration are plain byte arithmetic: substring the binary,
# hex it, conv(16→10). Pure JVM expressions in whole-stage codegen — at
# 100 TB this backfills metadata for the entire corpus without a single
# Python invocation or a decoded pixel. JPEG needs a marker SCAN (variable
# offset), so it runs as an Arrow-batched stdlib-only parser — still zero
# external codecs. The STUB boundary is thereby only the pixel/sample
# decode itself (extract_features/resize real mode), not metadata.
# ---------------------------------------------------------------------------


def _be_int(col, pos: int, nbytes: int):
    """Big-endian unsigned int from `nbytes` bytes at 1-based `pos`."""
    return F.conv(F.hex(F.substring(col, pos, nbytes)), 16, 10).cast("long")


def _le_int(col, pos: int, nbytes: int):
    """Little-endian unsigned int: reassemble the hex byte pairs reversed."""
    parts = [F.hex(F.substring(col, pos + i, 1)) for i in range(nbytes - 1, -1, -1)]
    return F.conv(F.concat(*parts), 16, 10).cast("long")


def png_meta(col):
    """(width, height) struct for PNG payloads, NULL if the signature
    doesn't match. IHDR is mandatory-first: width at byte 17 (1-based),
    height at 21, both 4-byte big-endian. try_cast, not cast: the PNG
    spec caps dimensions at 2^31-1, so a larger field is a MALFORMED
    header — it must read as NULL, not throw CAST_OVERFLOW under ANSI
    and kill the task (found by the round-9 untrusted-bytes fuzz)."""
    is_png = F.hex(F.substring(col, 1, 8)) == F.lit("89504E470D0A1A0A")
    return F.when(
        is_png,
        F.struct(
            _be_int(col, 17, 4).try_cast("int").alias("width"),
            _be_int(col, 21, 4).try_cast("int").alias("height"),
        ),
    )


def gif_meta(col):
    """(width, height) for GIF87a/GIF89a: 2-byte little-endian at 7 and 9
    (2-byte fields cannot overflow int; try_cast for symmetry/safety)."""
    sig = F.substring(col, 1, 6).cast("string")
    return F.when(
        sig.isin("GIF87a", "GIF89a"),
        F.struct(
            _le_int(col, 7, 2).try_cast("int").alias("width"),
            _le_int(col, 9, 2).try_cast("int").alias("height"),
        ),
    )


def wav_duration_ms(col):
    """Duration of a canonical RIFF/WAVE payload from the fmt byte-rate
    field (offset 29, 4-byte LE) and the payload size — no sample decoded."""
    is_wav = (F.substring(col, 1, 4).cast("string") == "RIFF") & (
        F.substring(col, 9, 4).cast("string") == "WAVE"
    )
    byte_rate = _le_int(col, 29, 4)
    data_bytes = F.length(col) - F.lit(44)
    # length guard: a RIFF/WAVE blob truncated INSIDE the 44-byte header
    # must read NULL, not a negative duration
    return F.when(
        is_wav & (byte_rate > 0) & (data_bytes >= 0),
        (data_bytes * 1000 / byte_rate).try_cast("long"),
    )


def _parse_jpeg_dims(b) -> tuple[int, int] | None:
    """(width, height) from a JPEG SOF0/1/2 marker scan, or None for
    non-JPEG/malformed bytes. Module-level (not closed over by the udf)
    so the untrusted-bytes fuzz tests drive it without a SparkSession."""
    if b is None or len(b) < 4 or b[0:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 9 < len(b):
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
            h = int.from_bytes(b[i + 5 : i + 7], "big")
            w = int.from_bytes(b[i + 7 : i + 9], "big")
            return (w, h)
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers carry no length
            continue
        seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
        if seg_len < 2:
            return None
        i += 2 + seg_len
    return None


def jpeg_meta_udf():
    """Arrow-batched JPEG dimension parser — stdlib-only marker scan
    (SOF0/1/2: height then width, big-endian, 2 bytes each after the
    precision byte). Variable marker offsets rule out fixed-substring
    expressions; everything else is still plain byte parsing."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<width:int,height:int>")
    def parse(contents: pd.Series) -> pd.DataFrame:
        dims = [_parse_jpeg_dims(c) for c in contents]
        return pd.DataFrame(
            {
                "width": [d[0] if d else None for d in dims],
                "height": [d[1] if d else None for d in dims],
            }
        )

    return parse


def parse_media_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Backfill meta.width/height/duration_ms from the raw bytes, dispatched
    on mime_type — fixed-offset containers (PNG/GIF/WAV) entirely JVM-side,
    JPEG via the Arrow marker scan; other types keep their declared meta."""
    c = F.col(content_col)
    jpeg = jpeg_meta_udf()(c)
    dims = (
        F.when(F.col("mime_type") == "image/png", png_meta(c))
        .when(F.col("mime_type") == "image/gif", gif_meta(c))
        .when(F.col("mime_type") == "image/jpeg", jpeg)
    )
    duration = F.when(F.col("mime_type") == "audio/wav", wav_duration_ms(c))
    return df.withColumn(
        "meta",
        F.struct(
            F.coalesce(dims["width"], F.col("meta.width")).alias("width"),
            F.coalesce(dims["height"], F.col("meta.height")).alias("height"),
            F.coalesce(duration, F.col("meta.duration_ms")).alias("duration_ms"),
            F.length(c).cast("long").alias("n_bytes"),
        ),
    )


# ---------------------------------------------------------------------------
# REAL sample/pixel decode for the codec-FREE formats (round 8). RIFF/WAVE
# PCM and uncompressed 24-bit BMP are containers, not codecs: their payloads
# decode with byte arithmetic + one numpy frombuffer — no Pillow/torchaudio.
# This moves the stub boundary inward again: only COMPRESSED codecs
# (JPEG pixels, MP3/AAC samples, video) still raise the real-decoder error.
# Stats are INTEGER-exact (peak, sum of squared samples, channel sums) so
# an engine-portable oracle can replay them without float-order hazards.
# ---------------------------------------------------------------------------


def build_pcm_wav(
    samples: list[int], sample_rate: int = 8000, channels: int = 1
) -> bytes:
    """Canonical 16-bit PCM RIFF/WAVE bytes from integer samples
    (interleaved when channels > 1) — the synthesis half tests and
    fixtures use; the decode half is :func:`decode_wav_samples`."""
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _parse_wav_pcm(b: bytes | None) -> tuple | None:
    """(n_channels, sample_rate, n_samples, peak, sum_sq) from PCM WAV
    bytes; None for non-WAV; NotImplementedError for compressed formats."""
    import numpy as np

    if b is None or len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = int.from_bytes(b[pos + 4 : pos + 8], "little")
        if cid == b"fmt ":
            fmt = b[pos + 8 : pos + 8 + size]
        elif cid == b"data":
            data = b[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1:
        _require_real_decoder(f"audio (WAVE format tag {audio_format})")
    if bits == 16:
        arr = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2").astype(
            np.int64
        )
    elif bits == 8:
        arr = np.frombuffer(data, dtype="u1").astype(np.int64) - 128
    else:
        _require_real_decoder(f"audio ({bits}-bit PCM)")
    n_samples = len(arr) // max(channels, 1)
    peak = int(np.max(np.abs(arr))) if len(arr) else 0
    sum_sq = int(np.sum(arr * arr)) if len(arr) else 0
    return (channels, rate, n_samples, peak, sum_sq)


def decode_wav_samples(
    df: DataFrame, content_col: str = "content", id_col: str = "media_id"
) -> DataFrame:
    """REAL PCM sample decode, Arrow-batched: walk the RIFF chunk list,
    read fmt, frombuffer the data chunk. Integer-exact per-media stats
    (peak amplitude, sum of squared samples) so a SQL oracle can replay
    the decode. Compressed WAVE payloads (format tag != 1) raise the
    real-decoder error — honestly, not silently."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [_parse_wav_pcm(c) for c in pdf[content_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_channels": [p[0] if p else None for p in parsed],
                    "sample_rate": [p[1] if p else None for p in parsed],
                    "n_samples": [p[2] if p else None for p in parsed],
                    "peak": [p[3] if p else None for p in parsed],
                    "sum_sq": [p[4] if p else None for p in parsed],
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        run,
        schema=(
            f"{id_col} long, n_channels long, sample_rate long, "
            "n_samples long, peak long, sum_sq long"
        ),
    )


def build_bmp(pixels) -> bytes:
    """Canonical bottom-up 24-bit uncompressed BMP from an HxWx3 RGB
    array-like of 0-255 ints."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    body = b"".join(
        px[y, :, ::-1].tobytes() + b"\x00" * pad  # BGR, bottom-up
        for y in range(h - 1, -1, -1)
    )
    header = (
        b"BM"
        + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 14 + 40)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return header + body


def _parse_bmp_pixels(b: bytes | None) -> tuple | None:
    """(width, height, sum_r, sum_g, sum_b) from 24-bit uncompressed BMP
    bytes; None for non-BMP; NotImplementedError for compressed/other
    depths."""
    import numpy as np

    if b is None or len(b) < 54 or b[0:2] != b"BM":
        return None
    off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    compression = int.from_bytes(b[30:34], "little")
    if bpp != 24 or compression != 0:
        _require_real_decoder(f"image (BMP bpp={bpp} compression={compression})")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        # the width field is signed but a BMP width is never negative (only
        # the height sign encodes orientation) — a w<=0 header is malformed,
        # and letting it through would pass the bounds check with a negative
        # byte count and reshape into nonsense stats. Parse contract: None.
        return None
    row = w * 3
    stride = (row + 3) // 4 * 4
    if len(b) < off + stride * h:
        return None
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=off)
    rows = rows.reshape(h, stride)[:, :row].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    bgr = rows.astype(np.int64).sum(axis=(0, 1))  # file order is BGR
    return (w, h, int(bgr[2]), int(bgr[1]), int(bgr[0]))


def decode_bmp_pixels(
    df: DataFrame, content_col: str = "content", id_col: str = "media_id"
) -> DataFrame:
    """REAL pixel decode for uncompressed 24-bit BMP, Arrow-batched:
    header arithmetic + one frombuffer/reshape (stride-padded, bottom-up
    or top-down). Integer-exact per-channel sums; compressed or other
    bit depths raise the real-decoder error."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [_parse_bmp_pixels(c) for c in pdf[content_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": [p[0] if p else None for p in parsed],
                    "height": [p[1] if p else None for p in parsed],
                    "sum_r": [p[2] if p else None for p in parsed],
                    "sum_g": [p[3] if p else None for p in parsed],
                    "sum_b": [p[4] if p else None for p in parsed],
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        run,
        schema=(
            f"{id_col} long, width long, height long, "
            "sum_r long, sum_g long, sum_b long"
        ),
    )
