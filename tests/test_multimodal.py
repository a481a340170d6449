"""Unit tests for the multimodal binary-column plumbing."""

from __future__ import annotations

import pytest

from c3dc_etl_spark.operators import multimodal as M


def _media(spark):
    df = spark.createDataFrame(
        [(1, "payload-one"), (2, "payload-two-longer")], ["id", "payload"]
    )
    return M.to_media_table(df, "id", "payload", "image")


def test_to_media_table_schema_and_metadata(spark):
    media = _media(spark)
    # nullability differs between createDataFrame input and the declared
    # schema; names and types are the contract
    assert [(f.name, f.dataType) for f in media.schema.fields] == [
        (f.name, f.dataType) for f in M.MEDIA_SCHEMA.fields
    ]
    rows = {r["media_id"]: r for r in media.collect()}
    assert rows[1]["n_bytes"] == len(b"payload-one")
    assert rows[1]["media_type"] == "image"
    assert len(rows[1]["content_md5"]) == 32


def test_extract_features_deterministic_fake_kernel(spark):
    media = _media(spark)
    out = {r["media_id"]: r for r in M.extract_features(media, fake=True).collect()}
    assert out[1]["feat_dim"] == 4
    # deterministic: same input -> same checksum on a second run
    again = {r["media_id"]: r for r in M.extract_features(media, fake=True).collect()}
    assert out[1]["feat_checksum"] == again[1]["feat_checksum"]
    assert out[1]["feat_checksum"] != out[2]["feat_checksum"]


def test_real_kernel_is_clearly_stubbed():
    with pytest.raises(NotImplementedError):
        M.decode_kernel(b"bytes", "image", fake=False)


def test_frame_sample_plan_fanout(spark):
    media = _media(spark)
    out = M.frame_sample_plan(media, every_n=1).groupBy("media_id").count().collect()
    counts = {r["media_id"]: r["count"] for r in out}
    # n_frames = max(floor(n_bytes/100), 1) -> tiny payloads give 1 frame
    assert counts == {1: 1, 2: 1}
