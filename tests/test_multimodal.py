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


def test_real_kernel_decodes_real_formats():
    from c3dc_etl_spark.operators import media_codecs as mc

    px = bytes(range(2 * 2 * 3))
    bmp = mc.encode_bmp(2, 2, px)
    assert M.decode_kernel(bmp, "image", fake=False) == [
        2.0, 2.0, 4.0, float(sum(px))
    ]
    wav = mc.encode_wav([100, -200, 300], 16000)
    assert M.decode_kernel(wav, "audio", fake=False) == [1.0, 16000.0, 3.0, 600.0]
    vid = mc.encode_video([bmp, bmp, bmp])
    assert M.decode_kernel(vid, "video", fake=False) == [
        3.0, 2.0, 2.0, float(3 * sum(px))
    ]
    # garbage bytes are rejected loudly, not silently featurized
    with pytest.raises(ValueError):
        M.decode_kernel(b"not-a-bmp", "image", fake=False)
    with pytest.raises(ValueError):
        M.decode_kernel(bmp, "hologram", fake=False)


def test_frame_sample_plan_fanout(spark):
    media = _media(spark)
    out = M.frame_sample_plan(media, every_n=1).groupBy("media_id").count().collect()
    counts = {r["media_id"]: r["count"] for r in out}
    # n_frames = max(floor(n_bytes/100), 1) -> tiny payloads give 1 frame
    assert counts == {1: 1, 2: 1}


def test_resize_plumbing(spark):
    from c3dc_etl_spark.operators import multimodal as M

    df = spark.createDataFrame(
        [(1, "payload-one"), (2, "")], "id long, payload string"
    )
    media = M.to_media_table(df, "id", "payload", "image")
    out = {r["media_id"]: r for r in M.resize_images(media, width=8, height=4).collect()}
    assert all(r["n_bytes"] == 32 for r in out.values())  # w*h bytes
    assert out[1]["target_w"] == 8 and out[1]["target_h"] == 4
    # deterministic: same input -> same checksum
    again = {r["media_id"]: r["content_md5"]
             for r in M.resize_images(media, width=8, height=4).collect()}
    assert again == {k: v["content_md5"] for k, v in out.items()}


def test_resize_real_kernel_nearest_neighbor():
    from c3dc_etl_spark.operators import media_codecs as mc
    from c3dc_etl_spark.operators.multimodal import resize_kernel

    # 4x2 image, distinct per-pixel colors; downsample to 2x1 keeps
    # source pixels (0,0) and (2,0)
    px = bytes(range(4 * 2 * 3))
    bmp = mc.encode_bmp(4, 2, px)
    out = resize_kernel(bmp, 2, 1, fake=False)
    w, h, got = mc.decode_bmp(out)
    assert (w, h) == (2, 1)
    assert got == px[0:3] + px[6:9]
    # upscale duplicates pixels, still a valid BMP roundtrip
    up = resize_kernel(bmp, 8, 4, fake=False)
    w2, h2, got2 = mc.decode_bmp(up)
    assert (w2, h2) == (8, 4)
    assert got2[0:3] == px[0:3]


def test_frame_violations_unique_items(spark):
    from c3dc_etl_spark.schema.registry import SchemaRegistry
    from c3dc_etl_spark.validate import frame_violations

    df = spark.createDataFrame(
        [("d1", ["C42.1 : Bone marrow", "C42.1 : Bone marrow"],
          "8000/0 : Neoplasm, benign", "Primary"),
         ("d2", ["C42.1 : Bone marrow"],
          "8000/0 : Neoplasm, benign", "Primary")],
        ["diagnosis_id", "anatomic_site", "diagnosis", "tumor_classification"],
    )
    viol = frame_violations(df, "diagnosis", SchemaRegistry()).collect()
    assert [(v["record_id"], v["error"]) for v in viol
            if v["property"] == "anatomic_site"] == [("d1", "array items not unique")]
