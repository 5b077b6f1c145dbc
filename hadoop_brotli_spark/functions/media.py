"""Media decode helpers for multimodal binary columns.

Two tiers:

- **Real header parsing** (no external libs needed): PNG and GIF
  dimensions live at fixed offsets in the container header, so
  ``parse_image_header`` genuinely decodes width/height/format from
  raw bytes (struct.unpack — the q90 decode path is NOT a stub).
  ``build_png``/``build_gif`` synthesize byte-exact headers for
  testing, standing in for real image files the test corpus lacks.
- **Pixel/sample decode** is environment-gated: the container ships
  no image/audio libraries, so ``decode_image``/``decode_audio``
  raise ``NotImplementedError`` unless a real backend (PIL /
  soundfile) is importable; ``fake_decode_meta`` provides
  deterministic metadata for the plumbing-only queries (q91/q93).
"""

from __future__ import annotations

import struct
import zlib

import pandas as pd

try:  # real decoders, if the environment has them
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

PNG_SIG = b"\x89PNG\r\n\x1a\n"
PNG_HEADER_LEN = 33  # 8 signature + 25 IHDR chunk (4 len + 4 type + 13 + 4 crc)
GIF_HEADER_LEN = 13  # 6 signature+version + 7 logical screen descriptor


def build_png(width: int, height: int, body: bytes = b"") -> bytes:
    """Byte-exact PNG prefix (signature + IHDR) followed by ``body``.

    IHDR per the PNG spec: big-endian u32 width/height, bit depth 8,
    color type 2 (truecolor), then compression/filter/interlace 0,
    with a real CRC32 over type+data.
    """
    data = struct.pack(">II", width, height) + bytes([8, 2, 0, 0, 0])
    chunk = b"IHDR" + data
    return (
        PNG_SIG
        + struct.pack(">I", len(data))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
        + body
    )


def build_gif(width: int, height: int, body: bytes = b"") -> bytes:
    """GIF89a header + logical screen descriptor (little-endian u16
    dims) followed by ``body``."""
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00" + body


def parse_image_header(payload: bytes) -> tuple[str | None, int | None, int | None]:
    """REAL image header decode (no external libraries): sniff the
    magic bytes and unpack (format, width, height) from the fixed
    header offsets — PNG IHDR big-endian u32 at byte 16, GIF logical
    screen little-endian u16 at byte 6. Returns (None, None, None)
    for unrecognized payloads (poison-row safe, never raises on
    arbitrary bytes)."""
    b = bytes(payload)
    if b[:8] == PNG_SIG and len(b) >= 24 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return ("png", w, h)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return ("gif", w, h)
    return (None, None, None)


def fake_decode_meta(payload: pd.Series) -> pd.DataFrame:
    """Deterministic fake media metadata from an opaque blob column.

    Stands in for an image/video header parse; keep the formula in
    sync with the q90/q91 oracles.
    """
    n = payload.map(len).astype("int64")
    return pd.DataFrame(
        {
            "n_bytes": n,
            "width": 64 + n % 576,
            "height": 48 + (n * 7) % 432,
            "n_frames": 1 + n % 15,
        }
    )


def decode_image(payload: bytes) -> "Image.Image":
    """Decode an image blob. STUB: requires PIL, absent in this
    container."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL; this environment has no image "
            "libraries — use fake_decode_meta for metadata plumbing"
        )
    import io

    return Image.open(io.BytesIO(payload))


def decode_audio(payload: bytes):
    """Decode an audio blob to samples. STUB: no audio backend in
    this container."""
    raise NotImplementedError(
        "audio decode requires soundfile/librosa; absent in this environment"
    )
