"""Unit tests for the pure-stdlib media codecs (BMP / WAV / C3DV)."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from c3dc_etl_spark.operators import media_codecs as mc


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    data=st.data(),
)
def test_bmp_roundtrip_any_dims(w, h, data):
    px = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        )
    )
    assert mc.decode_bmp(mc.encode_bmp(w, h, px)) == (w, h, px)


def test_bmp_row_padding_is_real():
    # width 1 -> 3 raw bytes/row -> 1 pad byte; the file must be larger
    # than the naive pixel count and still roundtrip
    px = bytes([10, 20, 30, 40, 50, 60])
    bmp = mc.encode_bmp(1, 2, px)
    assert len(bmp) == 14 + 40 + 2 * 4  # header + info + 2 padded rows
    assert mc.decode_bmp(bmp) == (1, 2, px)


def test_bmp_top_down_negative_height_decodes():
    px = bytes(range(2 * 2 * 3))
    bmp = bytearray(mc.encode_bmp(2, 2, px))
    # rewrite height to -2 and reorder the two stored rows to top-down
    struct.pack_into("<i", bmp, 14 + 8, -2)
    off = 14 + 40
    stride = 8  # 2 px * 3 B + 2 pad
    r0, r1 = bmp[off : off + stride], bmp[off + stride : off + 2 * stride]
    bmp[off : off + 2 * stride] = r1 + r0
    assert mc.decode_bmp(bytes(bmp)) == (2, 2, px)


def test_bmp_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError):
        mc.decode_bmp(b"PNG....definitely not a bmp..............................")
    px = bytes(range(3))
    bmp = bytearray(mc.encode_bmp(1, 1, px))
    struct.pack_into("<H", bmp, 14 + 14, 8)  # claim 8bpp
    with pytest.raises(ValueError):
        mc.decode_bmp(bytes(bmp))
    with pytest.raises(ValueError):
        mc.encode_bmp(2, 2, b"\x00" * 5)  # wrong pixel length


@settings(max_examples=30, deadline=None)
@given(
    rate=st.sampled_from([8000, 16000, 44100]),
    samples=st.lists(st.integers(-32768, 32767), min_size=0, max_size=200),
)
def test_wav_roundtrip(rate, samples):
    assert mc.decode_wav(mc.encode_wav(samples, rate)) == (1, rate, samples)


def test_video_container_roundtrip_and_magic():
    f1 = mc.encode_bmp(1, 1, bytes([1, 2, 3]))
    f2 = mc.encode_bmp(2, 1, bytes([4, 5, 6, 7, 8, 9]))
    vid = mc.encode_video([f1, f2])
    assert mc.decode_video(vid) == [f1, f2]
    assert mc.decode_video(mc.encode_video([])) == []
    with pytest.raises(ValueError):
        mc.decode_video(b"AVI?" + vid[4:])
    with pytest.raises(ValueError):
        mc.decode_video(vid[:-3])  # truncated last frame


def test_resize_nearest_identity_and_downsample():
    px = bytes(range(4 * 4 * 3))
    assert mc.resize_nearest(4, 4, px, 4, 4) == px
    half = mc.resize_nearest(4, 4, px, 2, 2)
    expect = bytes(
        px[((2 * y) * 4 + 2 * x) * 3 + c]
        for y in range(2)
        for x in range(2)
        for c in range(3)
    )
    assert half == expect


def test_video_truncation_always_valueerror():
    f1 = mc.encode_bmp(2, 2, bytes(range(12)))
    vid = mc.encode_video([f1, f1])
    # cut at every byte boundary: the codec's validation contract is a
    # ValueError (never struct.error / silent short frame)
    for cut in range(8, len(vid)):
        try:
            frames = mc.decode_video(vid[:cut])
        except ValueError:
            continue
        # a successful parse must return complete frames only
        assert all(len(f) == len(f1) for f in frames)
