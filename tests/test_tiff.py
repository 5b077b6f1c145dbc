"""Adversarial unit tests for the TIFF 6.0 baseline codec
(``functions/media.py``: build_tiff / decode_tiff_pixels /
packbits_encode / packbits_decode) — the q439 bridge. Same policy as
the fingerprint and JPEG suites: the encoder and decoder share no
code, so every test here is a cross-implementation check, and the
decoder must also read FOREIGN layouts (big-endian, multi-row
strips, inline tag values, shuffled tag order) it never writes.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hadoop_brotli_spark.functions.media import (
    build_tiff,
    decode_tiff_pixels,
    packbits_decode,
    packbits_encode,
)


def _card(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


# ------------------------------------------------------------ PackBits


@pytest.mark.parametrize(
    "row",
    [
        b"",
        b"a",
        b"ab",
        b"aaa",
        b"a" * 128,  # run exactly at the cap
        b"a" * 129,  # cap + 1 -> run + literal tail
        b"a" * 300,  # multiple capped runs
        bytes(range(128)),  # literal exactly at the cap
        bytes(range(200)),  # literal split
        b"ab" * 70,  # alternating, never a run
        b"xxzzzzyy",  # run sandwiched in literals
        b"aabbbccccdddddd",
    ],
    ids=lambda r: f"n{len(r)}",
)
def test_packbits_round_trip(row):
    assert packbits_decode(packbits_encode(row), len(row)) == row


def test_packbits_run_actually_compresses():
    assert len(packbits_encode(b"z" * 120)) == 2


def test_packbits_accepts_foreign_noop_flag():
    # -128 (0x80) is a legal no-op a foreign encoder may emit
    assert packbits_decode(b"\x80\x02abc\x80", 3) == b"abc"


def test_packbits_truncation_raises():
    enc = packbits_encode(b"hello world, hello world")
    with pytest.raises(ValueError):
        packbits_decode(enc[:-2], 24)


def test_packbits_overrun_raises():
    # a run that would overshoot the expected row length
    with pytest.raises(ValueError):
        packbits_decode(bytes([257 - 10, 0x41]), 5)


# ------------------------------------------------------- round trips


@pytest.mark.parametrize("comp", [1, 32773], ids=["none", "packbits"])
@pytest.mark.parametrize(
    "wh", [(1, 1), (1, 7), (9, 1), (17, 9), (64, 33)], ids=str
)
def test_tiff_round_trip(comp, wh):
    w, h = wh
    px = _card(w, h, seed=w * 100 + h)
    # plant runs so PackBits exercises both group kinds
    px[:, : w // 2, :] = 200
    dw, dh, out = decode_tiff_pixels(build_tiff(px, comp))
    assert (dw, dh) == (w, h)
    assert (out == px).all()


def test_tiff_one_row_uses_inline_strip_values():
    """h=1 makes StripOffsets/ByteCounts 4-byte values — TIFF §2
    requires them INLINE in the IFD entry, not behind an offset (the
    bug class a pointer-always encoder hits on foreign readers)."""
    px = _card(5, 1)
    blob = build_tiff(px, 1)
    (ifd_off,) = struct.unpack_from("<I", blob, 4)
    (n,) = struct.unpack_from("<H", blob, ifd_off)
    entries = {}
    for k in range(n):
        tag, typ, cnt, val = struct.unpack_from(
            "<HHII", blob, ifd_off + 2 + 12 * k
        )
        entries[tag] = (typ, cnt, val)
    assert entries[273] == (4, 1, 8)  # strip data starts right after header
    assert entries[279] == (4, 1, 15)  # 5 px * 3 bytes
    assert decode_tiff_pixels(blob)[2].tobytes() == px.tobytes()


# ------------------------------------- foreign layouts (decode-only)


def _build_foreign(px, endian, rows_per_strip, shuffle_tags=False):
    """A minimal SECOND encoder with layouts build_tiff never emits:
    either endianness, multi-row strips, IFD before the data, inline
    SHORT compression, tags optionally in reverse order."""
    e = "<" if endian == "II" else ">"
    h, w, _ = px.shape
    strips = [
        px[y : y + rows_per_strip].tobytes()
        for y in range(0, h, rows_per_strip)
    ]
    ns = len(strips)
    SHORT, LONG = 3, 4

    # layout: header | IFD | bits array | offset/count arrays | strips
    ifd_off = 8
    ifd_size = 2 + 12 * 9 + 4
    bits_off = ifd_off + ifd_size
    so_off = bits_off + 6
    sc_off = so_off + 4 * ns
    data_off = sc_off + 4 * ns
    offs = []
    o = data_off
    for s in strips:
        offs.append(o)
        o += len(s)

    def entry(tag, typ, cnt, val):
        # TIFF §2: inline values are LEFT-justified in the 4-byte
        # field — a big-endian SHORT occupies the FIRST two bytes
        if typ == SHORT and cnt == 1:
            field = struct.pack(e + "H", val) + b"\x00\x00"
        else:
            field = struct.pack(e + "I", val)
        return struct.pack(e + "HHI", tag, typ, cnt) + field

    entries = [
        entry(256, LONG, 1, w),
        entry(257, LONG, 1, h),
        entry(258, SHORT, 3, bits_off),
        entry(259, SHORT, 1, 1),
        entry(262, SHORT, 1, 2),
        entry(273, LONG, ns, offs[0] if ns == 1 else so_off),
        entry(277, SHORT, 1, 3),
        entry(278, LONG, 1, rows_per_strip),
        entry(279, LONG, ns, len(strips[0]) if ns == 1 else sc_off),
    ]
    if shuffle_tags:
        entries = entries[::-1]  # tag order is NOT guaranteed sorted here

    out = bytearray()
    out += endian.encode() + struct.pack(e + "H", 42)
    out += struct.pack(e + "I", ifd_off)
    out += struct.pack(e + "H", len(entries))
    for x in entries:
        out += x
    out += struct.pack(e + "I", 0)
    out += struct.pack(e + "HHH", 8, 8, 8)
    out += struct.pack(e + f"{ns}I", *offs)
    out += struct.pack(e + f"{ns}I", *(len(s) for s in strips))
    for s in strips:
        out += s
    return bytes(out)


@pytest.mark.parametrize("endian", ["II", "MM"])
@pytest.mark.parametrize("rps", [1, 4, 999])
def test_decode_foreign_layouts(endian, rps):
    px = _card(11, 9, seed=3)
    w, h, out = decode_tiff_pixels(_build_foreign(px, endian, rps))
    assert (w, h) == (11, 9)
    assert (out == px).all()


def test_decode_reversed_tag_order():
    px = _card(6, 5, seed=9)
    blob = _build_foreign(px, "MM", 2, shuffle_tags=True)
    assert (decode_tiff_pixels(blob)[2] == px).all()


# ----------------------------------------------------- failure modes


def test_bad_magic_rejected():
    with pytest.raises(ValueError):
        decode_tiff_pixels(b"PK\x03\x04" + b"\x00" * 32)
    with pytest.raises(ValueError):
        decode_tiff_pixels(b"II\x2b\x00" + b"\x00" * 32)  # BigTIFF magic 43


def test_truncated_strip_rejected():
    blob = build_tiff(_card(9, 4), 1)
    # chop mid-strip-data: decoder must see the short chunk
    with pytest.raises(ValueError):
        decode_tiff_pixels(blob[:20])


def test_corrupt_packbits_strip_rejected():
    blob = bytearray(build_tiff(np.full((2, 40, 3), 7, np.uint8), 32773))
    # strip data starts at 8: flip the first control byte into a huge
    # literal header so the strip overruns
    blob[8] = 127
    with pytest.raises(ValueError):
        decode_tiff_pixels(bytes(blob))


def test_unsupported_shape_rejected():
    px = _card(4, 4)
    blob = bytearray(build_tiff(px, 1))
    (ifd_off,) = struct.unpack_from("<I", blob, 4)
    (n,) = struct.unpack_from("<H", blob, ifd_off)
    for k in range(n):
        base = ifd_off + 2 + 12 * k
        tag, typ, cnt = struct.unpack_from("<HHI", blob, base)
        if tag == 262:  # Photometric RGB -> palette
            struct.pack_into("<I", blob, base + 8, 3)
    with pytest.raises(ValueError):
        decode_tiff_pixels(bytes(blob))
