"""Real image-header codec tests (pure-Python PNG/GIF parse —
round-1 VERDICT task 8)."""

from __future__ import annotations

from hadoop_brotli_spark.functions.media import (
    GIF_HEADER_LEN,
    PNG_HEADER_LEN,
    build_gif,
    build_png,
    parse_image_header,
)


def test_png_roundtrip():
    b = build_png(640, 481, b"pixels")
    assert len(b) == PNG_HEADER_LEN + 6
    assert parse_image_header(b) == ("png", 640, 481)


def test_png_large_dims_big_endian():
    # a little-endian parser bug would mangle asymmetric values
    assert parse_image_header(build_png(1, 70000)) == ("png", 1, 70000)


def test_gif_roundtrip():
    b = build_gif(320, 200, b"frames")
    assert len(b) == GIF_HEADER_LEN + 6
    assert parse_image_header(b) == ("gif", 320, 200)


def test_gif87a_also_recognized():
    b = b"GIF87a" + bytes([64, 0, 32, 0]) + b"\x00\x00\x00"
    assert parse_image_header(b) == ("gif", 64, 32)


def test_unrecognized_payloads_return_none():
    for junk in (b"", b"x", b"not an image at all", b"\x89PNGxxxx",
                 bytes(100)):
        assert parse_image_header(junk) == (None, None, None)


def test_real_png_fixture_parses():
    # 1x1 red pixel PNG produced by a reference encoder (byte literal)
    real = bytes.fromhex(
        "89504e470d0a1a0a0000000d49484452000000010000000108020000009077"
        "3df80000000c49444154789c63f8cfc0000000030001"
        "4f0fbbc30000000049454e44ae426082"
    )
    fmt, w, h = parse_image_header(real)
    assert (fmt, w, h) == ("png", 1, 1)
