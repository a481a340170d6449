"""Multimodal-column suite queries, backed by
c3dc_etl_spark.operators.multimodal.

Two layers of verification:

- plumbing checks (multimodal_metadata / _features / _frame_sample):
  arbitrary payloads through the fake byte-statistics kernel, whose
  arithmetic is restatable in SQL — value-hash checks the Arrow/
  mapInPandas path itself on any bytes;
- the REAL decode path (multimodal_decode_real): genuine BMP / WAV /
  C3DV payloads built deterministically per doc, pushed through the
  real pure-stdlib codecs (encode -> decode -> features -> resize ->
  re-decode); the oracle recomputes every feature in closed form from
  the pixel/sample formulas, so a codec bug (header, padding, row
  order, channel order, resampling) breaks the value hash.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c3dc_etl_spark.operators import multimodal as M
from c3dc_etl_spark.suite.registry import load, query


@query(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           'image' AS media_type,
           MD5(text) AS content_md5,
           CAST(STRLEN(text) AS BIGINT) AS n_bytes
    FROM documents
    """,
    tags=("multimodal",),
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column with typed metadata: payloads as opaque
    binary, md5 + byte length computed JVM-side (documents' text bytes
    stand in for image payloads)."""
    docs = load(spark, sf_dir, "documents")
    media = M.to_media_table(docs, "doc_id", "text", "image")
    return media.select("media_id", "media_type", "content_md5", "n_bytes")


# The fake decode kernel's features are pure byte arithmetic over the
# UTF-8 payload; the corpus is ASCII, so byte == character and the
# kernel is restatable in SQL — giving the mapInPandas PATH (batch
# boundaries, Arrow conversion, schema) a real value-hash check even
# though the real codec kernel stays stubbed.
_FEATURES_ORACLE = """
WITH f AS (
    SELECT doc_id AS media_id, 'image' AS media_type,
           CAST(LENGTH(text) AS BIGINT) AS n_bytes,
           LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT),
               LIST_TRANSFORM(RANGE(1, LEAST(LENGTH(text), 64) + 1),
                   i -> CAST(ASCII(SUBSTR(text, i, 1)) AS BIGINT))),
               (a, x) -> a + x) AS s,
           CASE WHEN LENGTH(text) > 0 THEN ASCII(SUBSTR(text, 1, 1)) ELSE 0 END AS fb
    FROM documents
)
SELECT media_id, media_type, n_bytes, CAST(4 AS BIGINT) AS feat_dim,
       MD5(printf('%.1f', CAST(n_bytes AS DOUBLE)) || ','
           || printf('%.1f', CAST(n_bytes % 251 AS DOUBLE)) || ','
           || printf('%.1f', CAST(s % 509 AS DOUBLE)) || ','
           || printf('%.1f', CAST(fb AS DOUBLE))) AS feat_checksum
FROM f
"""


@query("multimodal_features", oracle=_FEATURES_ORACLE, tags=("multimodal", "udf"))
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction via mapInPandas over the binary
    column, using the fake byte-statistics kernel: its arithmetic is
    mirrored in the oracle, so the Python-batch plumbing is value-hash
    checked on ARBITRARY payloads (text bytes here). The real codec
    path on genuine media bytes is multimodal_decode_real."""
    docs = load(spark, sf_dir, "documents")
    media = M.to_media_table(docs, "doc_id", "text", "image")
    return M.extract_features(media, fake=True)


# Every payload_sum below is the closed-form restatement of what the
# Spark side obtains by DECODING real bytes: image = sum of the 96 RGB
# bytes of an 8x4 BMP with pixel byte i = (doc_id*31 + i) % 256;
# resized = the 4x2 nearest-neighbor subsample (source pixel (2x, 2y),
# byte index ((j//4)*16 + (j%4)*2)*3 + c); audio = sum|sample| of 64
# 16-bit PCM samples ((doc_id*7 + 11k) % 2048) - 1024; video = two
# identical BMP frames in the C3DV container.
_DECODE_REAL_ORACLE = """
WITH d AS (SELECT doc_id FROM documents),
img AS (
    SELECT doc_id AS media_id, 'image' AS media_type,
           CAST(8 AS BIGINT) AS dim_a, CAST(4 AS BIGINT) AS dim_b,
           CAST(32 AS BIGINT) AS n_units,
           CAST((SELECT SUM((d.doc_id*31 + t.i) % 256)
                 FROM range(96) t(i)) AS BIGINT) AS payload_sum
    FROM d),
aud AS (
    SELECT doc_id, 'audio', CAST(1 AS BIGINT), CAST(8000 AS BIGINT),
           CAST(64 AS BIGINT),
           CAST((SELECT SUM(ABS(((d.doc_id*7 + 11*t.k) % 2048) - 1024))
                 FROM range(64) t(k)) AS BIGINT)
    FROM d),
rz AS (
    SELECT doc_id, 'image_resized', CAST(4 AS BIGINT), CAST(2 AS BIGINT),
           CAST(8 AS BIGINT),
           CAST((SELECT SUM((d.doc_id*31 + ((t.j//4)*16 + (t.j%4)*2)*3 + u.c) % 256)
                 FROM range(8) t(j), range(3) u(c)) AS BIGINT)
    FROM d),
vid AS (
    SELECT doc_id, 'video', CAST(2 AS BIGINT), CAST(8 AS BIGINT),
           CAST(4 AS BIGINT),
           CAST(2*(SELECT SUM((d.doc_id*31 + t.i) % 256)
                   FROM range(96) t(i)) AS BIGINT)
    FROM d)
SELECT * FROM img
UNION ALL SELECT * FROM aud
UNION ALL SELECT * FROM rz
UNION ALL SELECT * FROM vid
"""

_DECODE_REAL_SCHEMA = (
    "media_id long, media_type string, dim_a long, dim_b long, "
    "n_units long, payload_sum long"
)


@query("multimodal_decode_real", oracle=_DECODE_REAL_ORACLE, tags=("multimodal", "udf"))
def multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T25 real decode path, end to end through the REAL codecs — no
    fake kernel anywhere: per document build an 8x4 24bpp BMP, a 64-
    sample 16-bit PCM WAV, and a 2-frame C3DV video whose bytes derive
    deterministically from doc_id; encode with media_codecs, decode
    through decode_kernel(fake=False), nearest-neighbor resize through
    resize_kernel(fake=False) and re-decode the resized BMP. Emits the
    4-dim decoded features as typed columns; the oracle recomputes them
    in closed form, so any codec defect (padding, bottom-up rows, BGR
    order, RIFF framing, resample indexing) is a value-hash mismatch.
    Arrow-batched mapInPandas — the sanctioned shape for batch decode
    kernels; at scale the binary payloads stay executor-side and only
    narrow features shuffle."""
    docs = load(spark, sf_dir, "documents").select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from c3dc_etl_spark.operators import media_codecs as mc
        from c3dc_etl_spark.operators.multimodal import decode_kernel, resize_kernel

        for pdf in batches:
            out: list[tuple] = []
            for raw_id in pdf["doc_id"]:
                d = int(raw_id)
                px = bytes((d * 31 + i) % 256 for i in range(8 * 4 * 3))
                bmp = mc.encode_bmp(8, 4, px)
                fi = decode_kernel(bmp, "image", fake=False)
                out.append((d, "image", *[int(x) for x in fi]))
                wav = mc.encode_wav(
                    [((d * 7 + 11 * k) % 2048) - 1024 for k in range(64)], 8000
                )
                fa = decode_kernel(wav, "audio", fake=False)
                out.append((d, "audio", *[int(x) for x in fa]))
                rz = resize_kernel(bmp, 4, 2, fake=False)
                fr = decode_kernel(rz, "image", fake=False)
                out.append((d, "image_resized", *[int(x) for x in fr]))
                vid = mc.encode_video([bmp, bmp])
                fv = decode_kernel(vid, "video", fake=False)
                out.append((d, "video", *[int(x) for x in fv]))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "media_type", "dim_a", "dim_b",
                    "n_units", "payload_sum",
                ],
            )

    return docs.mapInPandas(run, _DECODE_REAL_SCHEMA)


# Video frames are 4x2 BMPs; frame f of doc d has pixel byte
# i = (d*31 + f*97 + i) % 256; frame count = 2 + d % 3; sampling stride
# 2 keeps indices 0, 2 (GENERATE_SERIES stop is inclusive -> stop at
# n_frames - 1). The Spark side decodes REAL bytes; the oracle restates
# the construction in closed form.
_VIDEO_FRAMES_ORACLE = """
WITH d AS (SELECT doc_id, 2 + doc_id % 3 AS n_frames FROM documents),
sampled AS (
    SELECT doc_id, UNNEST(GENERATE_SERIES(0, n_frames - 1, 2)) AS frame_index
    FROM d
)
SELECT doc_id AS media_id, CAST(frame_index AS BIGINT) AS frame_index,
       CAST(4 AS BIGINT) AS frame_w, CAST(2 AS BIGINT) AS frame_h,
       CAST((SELECT SUM((s.doc_id*31 + s.frame_index*97 + t.i) % 256)
             FROM range(24) t(i)) AS BIGINT) AS frame_sum
FROM sampled s
"""


@query("multimodal_video_frames", oracle=_VIDEO_FRAMES_ORACLE, tags=("multimodal", "udf"))
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling end to end: per document build a C3DV
    container of 2-4 genuine 4x2 BMP frames (bytes derived from doc_id
    and the frame number), then decode the container, take every 2nd
    frame, decode each sampled frame with the real BMP codec and emit
    its dimensions + pixel sum. Complements multimodal_frame_sample
    (which fans out indices JVM-side but decodes nothing): here the
    per-frame decode actually runs. Arrow-batched mapInPandas; only
    doc_id enters the kernel and only narrow frame features leave."""
    docs = load(spark, sf_dir, "documents").select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from c3dc_etl_spark.operators import media_codecs as mc

        for pdf in batches:
            out: list[tuple] = []
            for raw_id in pdf["doc_id"]:
                d = int(raw_id)
                n_frames = 2 + d % 3
                frames = [
                    mc.encode_bmp(
                        4, 2,
                        bytes((d * 31 + f * 97 + i) % 256 for i in range(24)),
                    )
                    for f in range(n_frames)
                ]
                container = mc.encode_video(frames)
                decoded = mc.decode_video(container)
                for f in range(0, len(decoded), 2):
                    w, h, px = mc.decode_bmp(decoded[f])
                    out.append((d, f, w, h, sum(px)))
            yield pd.DataFrame(
                out,
                columns=["media_id", "frame_index", "frame_w", "frame_h",
                         "frame_sum"],
            )

    return docs.mapInPandas(
        run,
        "media_id long, frame_index long, frame_w long, frame_h long, "
        "frame_sum long",
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id AS media_id, 'video' AS media_type, UNNEST(
               GENERATE_SERIES(0, GREATEST(CAST(FLOOR(STRLEN(text) / 100) AS BIGINT), 1) - 1, 10)
           ) AS frame_index
    FROM documents
    """,
    tags=("multimodal",),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled frame index,
    fanned out with a JVM-side explode(sequence(...)) — the decode of
    each frame is the stubbed kernel."""
    docs = load(spark, sf_dir, "documents")
    media = M.to_media_table(docs, "doc_id", "text", "video")
    return M.frame_sample_plan(media, every_n=10)
