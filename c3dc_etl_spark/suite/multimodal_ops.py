"""Multimodal-column suite queries, backed by
c3dc_etl_spark.operators.multimodal. The decode kernel is stubbed
(container has no codec libs) but the Spark plumbing — binary columns,
metadata expressions, Arrow-batched mapInPandas, frame-sample fan-out —
is real and checked.
"""

from __future__ import annotations

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
    column. The real codec decode is stubbed (NotImplementedError); the
    deterministic fake kernel's byte arithmetic is mirrored in the
    oracle, so the Python-batch plumbing itself is value-hash checked."""
    docs = load(spark, sf_dir, "documents")
    media = M.to_media_table(docs, "doc_id", "text", "image")
    return M.extract_features(media, fake=True)


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
