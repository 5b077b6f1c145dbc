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


# ----------------------------------------------------- WAV (RIFF/PCM16)


def test_wav_roundtrip_signed_samples():
    from hadoop_brotli_spark.functions.media import build_wav, parse_wav

    samples = [-32768, -1, 0, 1, 255, 256, 32767]
    b = build_wav(samples, 16000)
    rate, channels, n_frames, decoded = parse_wav(b)
    assert (rate, channels, n_frames) == (16000, 1, len(samples))
    assert list(decoded) == samples  # int16 signedness must round-trip


def test_wav_stereo_frame_count():
    from hadoop_brotli_spark.functions.media import build_wav, parse_wav

    b = build_wav([1, 2, 3, 4, 5, 6], 8000, channels=2)
    rate, channels, n_frames, decoded = parse_wav(b)
    assert (rate, channels, n_frames) == (8000, 2, 3)
    assert len(decoded) == 6


def test_wav_skips_unknown_chunks():
    import struct

    from hadoop_brotli_spark.functions.media import build_wav, parse_wav

    b = build_wav([7, -7], 44100)
    # splice a LIST chunk between fmt and data (odd length: exercises
    # RIFF word-alignment in the chunk walk)
    extra = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"
    spliced = b[:36] + extra + b[36:]
    rate, _c, n, decoded = parse_wav(spliced)
    assert (rate, n, list(decoded)) == (44100, 2, [7, -7])


def test_wav_rejects_garbage_and_non_pcm16():
    import struct

    from hadoop_brotli_spark.functions.media import build_wav, parse_wav

    for junk in (b"", b"RIFF", b"RIFFxxxxWAVE", bytes(100),
                 b"not audio " * 10):
        assert parse_wav(junk) == (None, None, None, None)
    # 8-bit PCM (bits=8) must be refused, not mis-decoded
    b = bytearray(build_wav([1, 2], 8000))
    struct.pack_into("<H", b, 34, 8)
    assert parse_wav(bytes(b)) == (None, None, None, None)


def test_decode_audio_real_for_wav():
    from hadoop_brotli_spark.functions.media import build_wav, decode_audio

    rate, samples = decode_audio(build_wav([10, -10], 22050))
    assert rate == 22050
    assert list(samples) == [10, -10]


def test_bmp_roundtrip_padding_and_orientation():
    """build_bmp -> decode_bmp_pixels round-trips pixels exactly,
    including 4-byte row padding (w=21) and the bottom-up row
    order / BGR channel order."""
    import numpy as np

    from hadoop_brotli_spark.functions.media import (
        BMP_HEADER_LEN,
        build_bmp,
        decode_bmp_pixels,
    )

    px = np.arange(21 * 13 * 3, dtype=np.uint8).reshape(13, 21, 3)
    data = build_bmp(21, 13, px)
    stride = 21 * 3 + (4 - (21 * 3) % 4) % 4
    assert len(data) == BMP_HEADER_LEN + stride * 13
    w, h, back = decode_bmp_pixels(data)
    assert (w, h) == (21, 13)
    assert (back == px).all()
    # corrupting the magic must fail loudly
    try:
        decode_bmp_pixels(b"XX" + data[2:])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


# --------------------------------------------------------------- PNG pixels


class TestPngPixels:
    def test_roundtrip_every_filter_type(self):
        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_png_pixels,
            decode_png_pixels,
            parse_image_header,
        )

        rng = np.random.default_rng(7)
        for h, w in [(1, 1), (5, 3), (9, 16), (23, 31)]:
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for filt in [None, 0, 1, 2, 3, 4]:
                data = build_png_pixels(px, filt)
                assert parse_image_header(data) == ("png", w, h)
                dw, dh, rgb = decode_png_pixels(data)
                assert (dw, dh) == (w, h)
                assert (rgb == px).all()

    def test_filter_bytes_match_spec_formulas(self):
        """Guard against symmetric encoder/decoder bugs: recompute the
        filtered scanlines with INDEPENDENT scalar spec formulas
        (PNG spec §9.2) and compare against the encoder's IDAT."""
        import zlib

        import numpy as np

        from hadoop_brotli_spark.functions.media import build_png_pixels

        rng = np.random.default_rng(3)
        h, w, bpp = 6, 5, 3
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)

        def paeth(a, b, c):
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

        for ftype in [0, 1, 2, 3, 4]:
            data = build_png_pixels(px, ftype)
            # IDAT = chunk 2 (after IHDR); offset: 8 sig + 25 IHDR + 8
            (ilen,) = __import__("struct").unpack_from(">I", data, 33)
            scan = zlib.decompress(data[41 : 41 + ilen])
            expect = bytearray()
            prior = bytes(w * bpp)
            for y in range(h):
                raw = px[y].tobytes()
                expect.append(ftype)
                for i in range(len(raw)):
                    a = raw[i - bpp] if i >= bpp else 0
                    b = prior[i]
                    c = prior[i - bpp] if i >= bpp else 0
                    pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2,
                            4: paeth(a, b, c)}[ftype]
                    expect.append((raw[i] - pred) & 0xFF)
                prior = raw
            assert bytes(scan) == bytes(expect), f"filter {ftype}"

    def test_gray_and_rgba_color_types(self):
        """Decoder handles color types 0 and 6 (hand-built streams)."""
        import struct
        import zlib

        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            PNG_SIG,
            _png_chunk,
            decode_png_pixels,
        )

        # gray 2x2, filter 0 rows
        gray = np.array([[10, 200], [55, 99]], dtype=np.uint8)
        ihdr = struct.pack(">II", 2, 2) + bytes([8, 0, 0, 0, 0])
        scan = b"\x00" + gray[0].tobytes() + b"\x00" + gray[1].tobytes()
        data = (PNG_SIG + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", zlib.compress(scan))
                + _png_chunk(b"IEND", b""))
        w, h, rgb = decode_png_pixels(data)
        assert (w, h) == (2, 2)
        assert (rgb[:, :, 0] == gray).all() and (rgb[:, :, 2] == gray).all()

        # RGBA 1x2: alpha dropped
        ihdr = struct.pack(">II", 2, 1) + bytes([8, 6, 0, 0, 0])
        scan = b"\x00" + bytes([1, 2, 3, 255, 4, 5, 6, 128])
        data = (PNG_SIG + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", zlib.compress(scan))
                + _png_chunk(b"IEND", b""))
        w, h, rgb = decode_png_pixels(data)
        assert rgb.tolist() == [[[1, 2, 3], [4, 5, 6]]]

    def test_corruption_and_unsupported_fail_loudly(self):
        import numpy as np
        import pytest

        from hadoop_brotli_spark.functions.media import (
            build_png_pixels,
            decode_png_pixels,
        )

        px = np.zeros((4, 4, 3), dtype=np.uint8)
        data = bytearray(build_png_pixels(px))
        data[50] ^= 0xFF  # inside IDAT → chunk crc mismatch
        with pytest.raises(ValueError, match="crc"):
            decode_png_pixels(bytes(data))
        with pytest.raises(ValueError, match="not a PNG"):
            decode_png_pixels(b"JFIF....")

    def test_decode_image_dispatch(self):
        """decode_image natively handles PNG and BMP without PIL."""
        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_bmp,
            build_png_pixels,
            decode_image,
        )

        px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
        for blob in (build_png_pixels(px), build_bmp(3, 2, px)):
            w, h, rgb = decode_image(blob)
            assert (w, h) == (3, 2)
            assert (rgb == px).all()


# --------------------------------------------------------------- GIF pixels


class TestGifPixels:
    def test_roundtrip_palette_sizes(self):
        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_gif_pixels,
            decode_gif_pixels,
            parse_image_header,
        )

        rng = np.random.default_rng(11)
        for h, w, ncol in [(1, 1, 2), (6, 9, 4), (17, 13, 256)]:
            pal = [tuple(int(v) for v in rng.integers(0, 256, 3))
                   for _ in range(ncol)]
            idx = rng.integers(0, ncol, h * w, dtype=np.uint8)
            data = build_gif_pixels(idx, pal, w, h)
            assert parse_image_header(data) == ("gif", w, h)
            dw, dh, rgb = decode_gif_pixels(data)
            assert (dw, dh) == (w, h)
            expect = np.array(pal, dtype=np.uint8)[idx.reshape(h, w)]
            assert (rgb == expect).all()

    def test_decodes_table_building_lzw(self):
        """The decoder must handle REAL compressing LZW streams (our
        encoder only emits the CLEAR-code stored profile) — encode
        here with an independent table-BUILDING LZW implementation
        and decode with the product code. Covers code-width growth
        and the KwKwK case (aaaa... patterns)."""
        import struct

        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            _gif_lzw_decode,
            decode_gif_pixels,
        )

        def lzw_encode_building(indices, root_bits):
            clear, eoi = 1 << root_bits, (1 << root_bits) + 1
            out = bytearray()
            acc = [0, 0]  # acc, nbits

            def put(code, width):
                acc[0] |= code << acc[1]
                acc[1] += width
                while acc[1] >= 8:
                    out.append(acc[0] & 0xFF)
                    acc[0] >>= 8
                    acc[1] -= 8

            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = root_bits + 1
            put(clear, width)
            buf = ()
            for sym in indices:
                cand = buf + (sym,)
                if cand in table:
                    buf = cand
                    continue
                put(table[buf], width)
                if next_code < 4096:
                    table[cand] = next_code
                    if next_code == (1 << width) and width < 12:
                        width += 1
                    next_code += 1
                buf = (sym,)
            if buf:
                put(table[buf], width)
            put(eoi, width)
            if acc[1]:
                out.append(acc[0] & 0xFF)
            return bytes(out)

        rng = np.random.default_rng(3)
        # runs + repeats force table growth and KwKwK
        seq = []
        for _ in range(300):
            v = int(rng.integers(0, 8))
            seq.extend([v] * int(rng.integers(1, 9)))
        enc = lzw_encode_building(seq, root_bits=3)
        assert list(_gif_lzw_decode(enc, 3)) == seq

        # full-file path: splice the compressed stream into a GIF
        w, h = 25, len(seq) // 25
        seq = seq[: w * h]
        enc = lzw_encode_building(seq, root_bits=3)
        pal = [(i * 31 % 256, i * 7 % 256, i * 3 % 256) for i in range(8)]
        gif = bytearray()
        gif += b"GIF89a" + struct.pack("<HH", w, h)
        gif += bytes([0x80 | 2, 0, 0])  # GCT 8 entries (2^(2+1))
        for r, g, b in pal:
            gif += bytes([r, g, b])
        gif += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        gif.append(3)  # LZW root bits
        for off in range(0, len(enc), 255):
            chunk = enc[off : off + 255]
            gif.append(len(chunk))
            gif += chunk
        gif += b"\x00\x3b"
        dw, dh, rgb = decode_gif_pixels(bytes(gif))
        expect = np.array(pal, dtype=np.uint8)[
            np.array(seq, dtype=np.uint8).reshape(h, w)
        ]
        assert (dw, dh) == (w, h)
        assert (rgb == expect).all()

    def test_interlaced_rows_reordered(self):
        """Hand-build an interlaced GIF (flag 0x40): decoder must
        undo the 4-pass row order."""
        import struct

        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            _gif_lzw_encode_uncompressed,
            decode_gif_pixels,
        )

        h, w = 10, 3
        rows = np.arange(h, dtype=np.uint8).repeat(w).reshape(h, w)
        order = (list(range(0, h, 8)) + list(range(4, h, 8))
                 + list(range(2, h, 4)) + list(range(1, h, 2)))
        transmitted = rows[order]  # rows as stored in the file
        pal = [(i, i, i) for i in range(16)]
        gif = bytearray()
        gif += b"GIF89a" + struct.pack("<HH", w, h)
        gif += bytes([0x80 | 3, 0, 0])
        for r, g, b in pal:
            gif += bytes([r, g, b])
        gif += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([0x40])
        gif.append(4)
        enc = _gif_lzw_encode_uncompressed(transmitted.ravel(), 4)
        for off in range(0, len(enc), 255):
            chunk = enc[off : off + 255]
            gif.append(len(chunk))
            gif += chunk
        gif += b"\x00\x3b"
        _, _, rgb = decode_gif_pixels(bytes(gif))
        assert (rgb[:, :, 0] == rows).all()

    def test_malformed_fails_loudly(self):
        import pytest

        from hadoop_brotli_spark.functions.media import decode_gif_pixels

        with pytest.raises(ValueError, match="not a GIF"):
            decode_gif_pixels(b"PNG?")
        with pytest.raises(ValueError):
            decode_gif_pixels(b"GIF89a" + b"\x00" * 20)

    def test_decode_image_dispatches_gif(self):
        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_gif_pixels,
            decode_image,
        )

        idx = np.zeros(6, dtype=np.uint8)
        blob = build_gif_pixels(idx, [(9, 8, 7), (1, 2, 3)], 3, 2)
        w, h, rgb = decode_image(blob)
        assert (w, h) == (3, 2)
        assert rgb.tolist()[0][0] == [9, 8, 7]


class TestJpegPixels:
    """Baseline JPEG codec (build_jpeg_ycbcr / decode_jpeg_pixels):
    the last image-format environment gate, now library-free."""

    def _dc_chain(self, v, q00):
        import numpy as np

        qv = np.floor((8.0 * (v - 128.0)) / q00 + 0.5)
        return np.clip(np.floor(qv * q00 / 8.0 + 128.0 + 0.5), 0, 255)

    def test_block_constant_exact_dc_arithmetic(self):
        """Block-constant cards decode EXACTLY per the integer
        quantize->dequantize->IDCT chain (the q364 oracle contract),
        across dims and content seeds."""
        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_jpeg_ycbcr,
            decode_jpeg_pixels,
        )

        for seed in range(8):
            rng = np.random.default_rng(seed)
            h, w = 8 * (1 + seed % 3), 8 * (1 + (seed + 1) % 4)
            yb, cbb, crb = (
                rng.integers(0, 256, (h // 8, w // 8)) for _ in range(3)
            )
            up = lambda a: np.kron(a, np.ones((8, 8), int)).astype(np.uint8)
            dw, dh, rgb = decode_jpeg_pixels(
                build_jpeg_ycbcr(up(yb), up(cbb), up(crb))
            )
            assert (dw, dh) == (w, h)
            y2 = self._dc_chain(yb, 16.0)
            cb2 = self._dc_chain(cbb, 17.0)
            cr2 = self._dc_chain(crb, 17.0)
            r = np.clip(np.floor(y2 + 1.402 * (cr2 - 128.0) + 0.5), 0, 255)
            g = np.clip(
                np.floor(
                    y2
                    - 0.344136 * (cb2 - 128.0)
                    - 0.714136 * (cr2 - 128.0)
                    + 0.5
                ),
                0,
                255,
            )
            b = np.clip(np.floor(y2 + 1.772 * (cb2 - 128.0) + 0.5), 0, 255)
            exp = np.kron(
                np.stack([r, g, b], -1).astype(int), np.ones((8, 8, 1), int)
            )
            assert (rgb == exp).all()

    def test_general_content_within_quant_tolerance(self):
        """Non-constant blocks exercise the AC huffman path (runs,
        ZRL, EOB) and the full IDCT; decode must track the source
        within quantization error."""
        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_jpeg_ycbcr,
            decode_jpeg_pixels,
        )

        xs = np.arange(32)
        yy = (np.add.outer(np.arange(32) * 4, xs * 3) % 256).astype(np.uint8)
        flat = np.full((32, 32), 128, np.uint8)
        _, _, rgb = decode_jpeg_pixels(build_jpeg_ycbcr(yy, flat, flat))
        # Cb=Cr=128 -> G channel equals Y up to rounding
        err = np.abs(rgb[:, :, 1].astype(int) - yy.astype(int))
        assert err.max() <= 12  # smooth ramp stays within quant error
        # hard checkerboard: highest-frequency AC coefficient only
        chk = np.where(np.indices((16, 16)).sum(0) % 2, 200, 55).astype(
            np.uint8
        )
        flat16 = np.full((16, 16), 128, np.uint8)
        _, _, rgb2 = decode_jpeg_pixels(build_jpeg_ycbcr(chk, flat16, flat16))
        assert rgb2.shape == (16, 16, 3)

    def test_interop_markers_and_tables_are_spec_shaped(self):
        """The emitted stream is a REAL JFIF file: marker walk finds
        SOI/APP0/DQTx2/SOF0/DHTx4/SOS/EOI with spec-correct lengths
        (any standard decoder could read it — tables ride in-band)."""
        import struct

        import numpy as np

        from hadoop_brotli_spark.functions.media import build_jpeg_ycbcr

        blob = build_jpeg_ycbcr(*(np.full((8, 8), 128, np.uint8),) * 3)
        assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
        pos, seen = 2, []
        while pos + 4 <= len(blob):
            assert blob[pos] == 0xFF
            m = blob[pos + 1]
            seen.append(m)
            pos += 2
            ln = struct.unpack(">H", blob[pos : pos + 2])[0]
            if m == 0xDA:
                break
            pos += ln
        assert seen == [0xE0, 0xDB, 0xDB, 0xC0, 0xC4, 0xC4, 0xC4, 0xC4, 0xDA]

    def test_corruption_and_unsupported_fail_loudly(self):
        import numpy as np
        import pytest

        from hadoop_brotli_spark.functions.media import (
            build_jpeg_ycbcr,
            decode_jpeg_pixels,
        )

        blob = bytearray(build_jpeg_ycbcr(*(np.full((8, 8), 99, np.uint8),) * 3))
        with pytest.raises(ValueError):
            decode_jpeg_pixels(b"\x00\x01" + bytes(blob[2:]))
        # flip SOF0 -> SOF2: progressive decode is now REAL (r4), and
        # a baseline full-band scan is ILLEGAL under SOF2 (a DC scan
        # must have Se=0, T.81 B.2.3) -> clean ValueError, not a gate
        sof = bytes(blob).find(b"\xff\xc0")
        blob2 = bytearray(blob)
        blob2[sof + 1] = 0xC2
        with pytest.raises(ValueError):
            decode_jpeg_pixels(bytes(blob2))

    def test_decode_image_dispatches_jpeg(self):
        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_jpeg_ycbcr,
            decode_image,
        )

        up = np.full((8, 16), 200, np.uint8)
        flat = np.full((8, 16), 128, np.uint8)
        w, h, rgb = decode_image(build_jpeg_ycbcr(up, flat, flat))
        assert (w, h) == (16, 8)
        assert rgb.shape == (8, 16, 3)

    def test_pil_cross_decode_if_available(self):
        """Self-activating interop proof: when PIL exists, its decoder
        must read our stream and agree on block-constant pixels."""
        import numpy as np
        import pytest

        from hadoop_brotli_spark.functions import media

        if not media._HAS_PIL:
            pytest.skip("PIL absent (self-activating interop check)")
        import io

        from PIL import Image

        up = lambda a: np.kron(a, np.ones((8, 8), int)).astype(np.uint8)
        yb = np.array([[40, 200], [128, 90]])
        blob = media.build_jpeg_ycbcr(
            up(yb), up(np.full((2, 2), 128)), up(np.full((2, 2), 128))
        )
        img = Image.open(io.BytesIO(blob)).convert("RGB")
        ours = media.decode_jpeg_pixels(blob)[2]
        theirs = np.asarray(img)
        assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 1


class TestJpeg420:
    """4:2:0 subsampled baseline JPEG (r3 verdict task 6): encoder
    emits interleaved 4-Y + Cb + Cr MCUs; the generalized decoder
    handles per-component sampling factors + nearest upsampling."""

    def _dc_chain(self, v, q00):
        import numpy as np

        qv = np.floor((8.0 * (v - 128.0)) / q00 + 0.5)
        return np.clip(np.floor(qv * q00 / 8.0 + 128.0 + 0.5), 0, 255)

    def test_mcu_constant_exact_dc_arithmetic(self):
        """MCU-constant 4:2:0 cards decode EXACTLY per the q379
        oracle contract, across MCU grids and seeds — a wrong MCU
        block order or broken per-component DC predictor shifts
        values here."""
        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_jpeg_ycbcr_420,
            decode_jpeg_pixels,
        )

        for seed in range(8):
            rng = np.random.default_rng(100 + seed)
            hm, wm = 1 + seed % 2, 1 + (seed + 1) % 3
            ym, cbm, crm = (
                rng.integers(0, 256, (hm, wm)) for _ in range(3)
            )
            up16 = lambda a: np.kron(a, np.ones((16, 16), int)).astype(
                np.uint8
            )
            up8 = lambda a: np.kron(a, np.ones((8, 8), int)).astype(np.uint8)
            dw, dh, rgb = decode_jpeg_pixels(
                build_jpeg_ycbcr_420(up16(ym), up8(cbm), up8(crm))
            )
            assert (dw, dh) == (wm * 16, hm * 16)
            y2 = self._dc_chain(ym, 16.0)
            cb2 = self._dc_chain(cbm, 17.0)
            cr2 = self._dc_chain(crm, 17.0)
            r = np.clip(np.floor(y2 + 1.402 * (cr2 - 128.0) + 0.5), 0, 255)
            g = np.clip(
                np.floor(
                    y2
                    - 0.344136 * (cb2 - 128.0)
                    - 0.714136 * (cr2 - 128.0)
                    + 0.5
                ),
                0,
                255,
            )
            b = np.clip(np.floor(y2 + 1.772 * (cb2 - 128.0) + 0.5), 0, 255)
            exp = np.kron(
                np.stack([r, g, b], -1).astype(int),
                np.ones((16, 16, 1), int),
            )
            assert (rgb == exp).all()

    def test_chroma_upsampling_is_sample_replication(self):
        """Distinct chroma per 8x8 chroma block: each chroma sample
        must cover exactly a 2x2 luma area (nearest upsampling), so
        tile boundaries land on 16-pixel edges."""
        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_jpeg_ycbcr_420,
            decode_jpeg_pixels,
        )

        y = np.full((16, 32), 128, np.uint8)
        cb = np.kron(np.array([[60, 190]]), np.ones((8, 8), int)).astype(
            np.uint8
        )
        cr = np.full((8, 16), 128, np.uint8)
        _, _, rgb = decode_jpeg_pixels(build_jpeg_ycbcr_420(y, cb, cr))
        left, right = rgb[:, :16, 2], rgb[:, 16:, 2]
        assert (left == left[0, 0]).all() and (right == right[0, 0]).all()
        assert left[0, 0] != right[0, 0]  # boundary exactly at x=16

    def test_ac_path_within_quant_tolerance(self):
        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_jpeg_ycbcr_420,
            decode_jpeg_pixels,
        )

        yg = (np.add.outer(np.arange(32) * 4, np.arange(32) * 3) % 256).astype(
            np.uint8
        )
        flat = np.full((16, 16), 128, np.uint8)
        _, _, rgb = decode_jpeg_pixels(build_jpeg_ycbcr_420(yg, flat, flat))
        err = np.abs(rgb[:, :, 1].astype(int) - yg.astype(int))
        assert err.max() <= 12

    def test_dim_validation(self):
        import numpy as np
        import pytest

        from hadoop_brotli_spark.functions.media import build_jpeg_ycbcr_420

        with pytest.raises(ValueError):
            build_jpeg_ycbcr_420(
                np.zeros((8, 16), np.uint8),
                np.zeros((4, 8), np.uint8),
                np.zeros((4, 8), np.uint8),
            )
        with pytest.raises(ValueError):
            build_jpeg_ycbcr_420(
                np.zeros((16, 16), np.uint8),
                np.zeros((16, 16), np.uint8),
                np.zeros((16, 16), np.uint8),
            )

    def test_pil_cross_decode_if_available(self):
        """Self-activating: PIL (libjpeg) must read our 4:2:0 stream
        and agree on MCU-constant pixels (libjpeg's fancy chroma
        upsampling equals replication on constant tiles)."""
        import numpy as np
        import pytest

        from hadoop_brotli_spark.functions import media

        if not media._HAS_PIL:
            pytest.skip("PIL absent (self-activating interop check)")
        import io

        from PIL import Image

        ym = np.array([[40, 200]])
        up16 = lambda a: np.kron(a, np.ones((16, 16), int)).astype(np.uint8)
        up8 = lambda a: np.kron(a, np.ones((8, 8), int)).astype(np.uint8)
        blob = media.build_jpeg_ycbcr_420(
            up16(ym), up8(np.full((1, 2), 128)), up8(np.full((1, 2), 128))
        )
        img = Image.open(io.BytesIO(blob)).convert("RGB")
        ours = media.decode_jpeg_pixels(blob)[2]
        theirs = np.asarray(img)
        assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 1


class TestMulaw:
    def test_expansion_landmarks_and_symmetry(self):
        import numpy as np

        from hadoop_brotli_spark.functions.media import mulaw_expand

        codes = np.arange(256, dtype=np.uint8)
        pcm = mulaw_expand(codes)
        # spec landmarks: 0xFF/0x7F are the two zero codes; 0x00/0x80
        # are the extremes
        assert pcm[0xFF] == 0 and pcm[0x7F] == 0
        assert pcm[0x00] == -32124 and pcm[0x80] == 32124
        # sign symmetry: code and code|0x80 mirror around zero
        assert (pcm[:128] == -pcm[128:]).all()
        # monotone decreasing magnitude within the negative half
        mags = -pcm[:128]
        assert (np.diff(mags) <= 0).all()

    def test_wav_container_roundtrip_and_dispatch(self):
        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_mulaw_wav,
            decode_audio,
            mulaw_expand,
            parse_wav,
        )

        codes = np.array([0, 0x55, 0x7F, 0x80, 0xAA, 0xFF], dtype=np.uint8)
        blob = build_mulaw_wav(codes, 8000)
        rate, ch, n, samples = parse_wav(blob)
        assert (rate, ch, n) == (8000, 1, 6)
        assert (samples == mulaw_expand(codes)).all()
        rate2, samples2 = decode_audio(blob)
        assert rate2 == 8000 and (samples2 == samples).all()

    def test_pcm16_still_refuses_8bit(self):
        import struct

        from hadoop_brotli_spark.functions.media import build_wav, parse_wav

        b = bytearray(build_wav([1, 2], 8000))
        struct.pack_into("<H", b, 34, 8)  # tag stays 1, bits -> 8
        assert parse_wav(bytes(b)) == (None, None, None, None)


class TestAdpcm:
    def test_decode_matches_reference_recurrence(self):
        """Spot-check known IMA behavior: code 0 decays toward the
        predictor (diff = step>>3), code 8+ moves negative, the
        step index walks the table and clamps at both ends."""
        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            _IMA_INDEX,
            _IMA_STEPS,
            ima_adpcm_decode,
        )

        out = ima_adpcm_decode([0], 100, 0)
        assert list(out) == [100, 100 + (_IMA_STEPS[0] >> 3)]
        out = ima_adpcm_decode([8], 100, 0)
        assert list(out) == [100, 100 - (_IMA_STEPS[0] >> 3)]
        # index clamps at 0 (codes 0-3 decrement) and at 88
        out = ima_adpcm_decode([0] * 5, 0, 0)
        assert len(out) == 6
        out = ima_adpcm_decode([7] * 30, 0, 80)  # +8 per step, clamp 88
        assert out[-1] <= 32767
        # predictor clamps into int16
        out = ima_adpcm_decode([7] * 60, 32000, 88)
        assert out.max() == 32767

    def test_wav_container_roundtrip(self):
        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_adpcm_wav,
            ima_adpcm_decode,
            parse_adpcm_wav,
        )

        codes = np.array([1, 14, 7, 8, 0, 15, 3], dtype=np.int64)
        blob = build_adpcm_wav(codes, -512, 12, 16000)
        rate, samples = parse_adpcm_wav(blob, n_codes=len(codes))
        assert rate == 16000
        assert (samples == ima_adpcm_decode(codes, -512, 12)).all()
        # odd code count: padding nibble must be trimmed, not decoded
        assert len(samples) == len(codes) + 1

    def test_rejects_wrong_containers(self):
        import pytest

        from hadoop_brotli_spark.functions.media import (
            build_wav,
            parse_adpcm_wav,
        )

        with pytest.raises(ValueError):
            parse_adpcm_wav(b"junk")
        with pytest.raises(ValueError):
            parse_adpcm_wav(build_wav([1, 2], 8000))  # PCM16, tag 1


class TestDecoderFuzz:
    """Adversarial-input fuzz for the real media decoders (r3 verdict
    task 8): the decode paths are now genuine parsers over untrusted
    bytes, so hypothesis-generated truncations and bit flips must
    yield a CLEAN error (ValueError family / NotImplementedError for
    honestly-gated variants) or a still-valid decode — never a hang,
    an unbounded loop, or a non-decode exception class. Each decoder
    fuzzes a REAL valid stream produced by its own builder, which
    puts the corruption past the magic checks and into the parsing
    machinery (filters, LZW, huffman, chunk walks, recurrences)."""

    N_CASES = 60  # truncations + bit flips per decoder (seeded RNG)

    def _fuzz(self, blob: bytes, decode, seed: int) -> None:
        import random

        rng = random.Random(seed)
        cases = []
        for _ in range(self.N_CASES // 2):
            cases.append(blob[: rng.randrange(len(blob))])
        for _ in range(self.N_CASES // 2):
            pos = rng.randrange(len(blob))
            bad = bytearray(blob)
            bad[pos] ^= 1 << rng.randrange(8)
            cases.append(bytes(bad))
        for payload in cases:
            try:
                decode(payload)  # valid-but-different decodes are OK
            except (ValueError, NotImplementedError):
                continue  # the clean-failure contract

    def test_png_fuzz(self):
        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_png_pixels,
            decode_png_pixels,
        )

        rng = np.random.default_rng(5)
        blob = build_png_pixels(rng.integers(0, 256, (9, 7, 3)).astype("uint8"))
        self._fuzz(blob, decode_png_pixels, 101)

    def test_gif_fuzz(self):
        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_gif_pixels,
            decode_gif_pixels,
        )

        rng = np.random.default_rng(6)
        idx = rng.integers(0, 8, 48).astype("uint8")
        pal = [(i * 31 % 256, i * 17 % 256, i * 7 % 256) for i in range(8)]
        blob = build_gif_pixels(idx, pal, 8, 6)
        self._fuzz(blob, decode_gif_pixels, 102)

    def test_jpeg_fuzz_444_and_420(self):
        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_jpeg_ycbcr,
            build_jpeg_ycbcr_420,
            decode_jpeg_pixels,
        )

        rng = np.random.default_rng(7)
        planes = [
            rng.integers(0, 256, (16, 16)).astype("uint8") for _ in range(3)
        ]
        self._fuzz(build_jpeg_ycbcr(*planes), decode_jpeg_pixels, 103)
        y = rng.integers(0, 256, (16, 32)).astype("uint8")
        cbcr = [
            rng.integers(0, 256, (8, 16)).astype("uint8") for _ in range(2)
        ]
        self._fuzz(
            build_jpeg_ycbcr_420(y, *cbcr), decode_jpeg_pixels, 104
        )

    def test_jpeg_progressive_fuzz(self):
        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_jpeg_ycbcr_progressive,
            decode_jpeg_pixels,
        )

        rng = np.random.default_rng(17)
        planes = [
            rng.integers(0, 256, (16, 16)).astype("uint8") for _ in range(3)
        ]
        self._fuzz(
            build_jpeg_ycbcr_progressive(*planes), decode_jpeg_pixels, 106
        )

    def test_jpeg_restart_fuzz(self):
        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_jpeg_ycbcr_restart,
            decode_jpeg_pixels,
        )

        rng = np.random.default_rng(19)
        planes = [
            rng.integers(0, 256, (16, 24)).astype("uint8") for _ in range(3)
        ]
        self._fuzz(
            build_jpeg_ycbcr_restart(*planes, interval=2),
            decode_jpeg_pixels,
            107,
        )

    def test_adpcm_fuzz(self):
        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_adpcm_wav,
            parse_adpcm_wav,
        )

        rng = np.random.default_rng(8)
        codes = rng.integers(0, 16, 48)
        blob = build_adpcm_wav(codes, 100, 30, 8000)
        self._fuzz(blob, parse_adpcm_wav, 105)

    def test_wav_and_bmp_fuzz(self):
        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_bmp,
            build_wav,
            decode_bmp_pixels,
            parse_wav,
        )

        rng = np.random.default_rng(9)
        self._fuzz(
            build_wav(rng.integers(-3000, 3000, 64).astype("int16"), 8000),
            parse_wav,
            106,
        )
        self._fuzz(
            build_bmp(7, 5, rng.integers(0, 256, (5, 7, 3)).astype("uint8")),
            decode_bmp_pixels,
            107,
        )


class TestJpegProgressive:
    """Progressive (SOF2) JPEG codec (r4): 4-phase successive-
    approximation scan script — interleaved DC first/refine, per-
    component AC first/refine. The load-bearing invariant: the
    progressive encoder emits the SAME quantized coefficients as the
    baseline encoder, so a correct multi-scan decode is BIT-IDENTICAL
    to the baseline decode of the same planes — every scan type
    (EOB runs, ZRL-in-refinement, correction bits) is certified by
    pixel equality, not tolerance."""

    def test_progressive_equals_baseline_pixelwise(self):
        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_jpeg_ycbcr,
            build_jpeg_ycbcr_progressive,
            decode_jpeg_pixels,
        )

        rng = np.random.default_rng(42)
        for trial in range(8):
            h = 8 * int(rng.integers(1, 4))
            w = 8 * int(rng.integers(1, 4))
            y = rng.integers(0, 256, (h, w))
            cb = rng.integers(0, 256, (h, w))
            cr = rng.integers(0, 256, (h, w))
            wb, hb, base = decode_jpeg_pixels(build_jpeg_ycbcr(y, cb, cr))
            wp, hp, prog = decode_jpeg_pixels(
                build_jpeg_ycbcr_progressive(y, cb, cr)
            )
            assert (wb, hb) == (wp, hp) == (w, h)
            assert np.array_equal(base, prog), f"trial {trial} diverged"

    def test_flat_and_extreme_planes(self):
        """Flat planes exercise the all-EOB path; extreme values the
        clipping and the widest DC successive-approximation split."""
        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_jpeg_ycbcr,
            build_jpeg_ycbcr_progressive,
            decode_jpeg_pixels,
        )

        for fill in (0, 128, 255):
            planes = [np.full((16, 24), fill)] * 3
            base = decode_jpeg_pixels(build_jpeg_ycbcr(*planes))[2]
            prog = decode_jpeg_pixels(
                build_jpeg_ycbcr_progressive(*planes)
            )[2]
            assert np.array_equal(base, prog)

    def test_scan_script_shape(self):
        """The progressive stream carries SOF2 and the 8-scan script
        (2 DC + 3 AC first + 3 AC refine)."""
        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_jpeg_ycbcr_progressive,
        )

        blob = build_jpeg_ycbcr_progressive(
            *(np.full((8, 8), 128),) * 3
        )
        assert b"\xff\xc2" in blob and b"\xff\xc0" not in blob
        # count SOS markers outside entropy data is fiddly; the
        # encoder never emits a bare FF DA inside entropy (stuffing),
        # so a raw count is exact
        assert blob.count(b"\xff\xda") == 8

    def test_refinement_correction_bits_exercised(self):
        """A plane with one strong and one weak AC coefficient per
        block forces both newly-significant AND correction-bit paths
        in the AC refinement scan."""
        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_jpeg_ycbcr,
            build_jpeg_ycbcr_progressive,
            decode_jpeg_pixels,
        )

        xs = np.arange(32)[None, :]
        ys = np.arange(24)[:, None]
        # smooth gradient + high-frequency checker: odd/even quantized
        # AC magnitudes -> refinement emits 0 and 1 correction bits
        y = (4 * xs + 3 * ys + 37 * ((xs + ys) % 2)) % 256
        cb = ((255 - 5 * xs) + 0 * ys) % 256
        cr = (7 * ys + 19 * ((xs // 2 + ys // 3) % 2) + 0 * xs) % 256
        base = decode_jpeg_pixels(build_jpeg_ycbcr(y, cb, cr))[2]
        prog = decode_jpeg_pixels(build_jpeg_ycbcr_progressive(y, cb, cr))[2]
        assert np.array_equal(base, prog)

    def test_pil_cross_decode_if_available(self):
        """Self-activating: when PIL exists, its progressive decoder
        must read our SOF2 stream and agree on block-constant pixels."""
        import numpy as np
        import pytest

        from hadoop_brotli_spark.functions import media

        if not media._HAS_PIL:
            pytest.skip("PIL absent (self-activating interop check)")
        import io

        from PIL import Image

        up = lambda a: np.kron(a, np.ones((8, 8), int)).astype(np.uint8)
        yb = np.array([[40, 200], [128, 90]])
        blob = media.build_jpeg_ycbcr_progressive(
            up(yb), up(np.full((2, 2), 128)), up(np.full((2, 2), 128))
        )
        img = Image.open(io.BytesIO(blob)).convert("RGB")
        ours = media.decode_jpeg_pixels(blob)[2]
        theirs = np.asarray(img)
        assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 1


class TestJpegRestart:
    """Restart markers (DRI + RSTn, r4): byte-aligned raw markers
    every N MCUs with DC-predictor resets — the error-resilience /
    parallel-decode feature. Coefficients match the plain baseline
    encoder, so restart-aware decode must be pixel-equal."""

    def test_restart_equals_baseline_across_intervals(self):
        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_jpeg_ycbcr,
            build_jpeg_ycbcr_restart,
            decode_jpeg_pixels,
        )

        rng = np.random.default_rng(11)
        for interval in (1, 2, 3, 7):
            h = 8 * int(rng.integers(2, 5))
            w = 8 * int(rng.integers(2, 5))
            y, cb, cr = (rng.integers(0, 256, (h, w)) for _ in range(3))
            base = decode_jpeg_pixels(build_jpeg_ycbcr(y, cb, cr))[2]
            rst = decode_jpeg_pixels(
                build_jpeg_ycbcr_restart(y, cb, cr, interval)
            )[2]
            assert np.array_equal(base, rst), f"interval {interval}"

    def test_stream_carries_dri_and_cycling_rst_markers(self):
        import struct

        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_jpeg_ycbcr_restart,
        )

        planes = [np.full((8, 80), 99)] * 3  # 10 MCUs, interval 1
        blob = build_jpeg_ycbcr_restart(*planes, interval=1)
        i = blob.find(b"\xff\xdd")
        assert i > 0 and struct.unpack(">H", blob[i + 4 : i + 6])[0] == 1
        # 9 restarts for 10 MCUs, m cycling 0..7 then wrapping
        seen = [blob.count(bytes((0xFF, 0xD0 + m))) for m in range(8)]
        assert sum(seen) == 9 and seen[0] == 2 and seen[7] == 1

    def test_corrupt_restart_fails_loudly(self):
        import numpy as np
        import pytest

        from hadoop_brotli_spark.functions.media import (
            build_jpeg_ycbcr_restart,
            decode_jpeg_pixels,
        )

        planes = [np.full((8, 32), 70)] * 3
        blob = bytearray(build_jpeg_ycbcr_restart(*planes, interval=1))
        i = bytes(blob).find(bytes((0xFF, 0xD0)))
        assert i > 0
        blob[i + 1] = 0xD9  # RST0 -> EOI mid-stream
        with pytest.raises(ValueError):
            decode_jpeg_pixels(bytes(blob))

    def test_progressive_with_restarts_equals_baseline(self):
        """Progressive + DRI (r4, gate removed): restart markers
        inside every scan type — DC predictor resets, EOBRUN cleared,
        per-scan RSTm cycling — still pixel-equal to baseline."""
        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_jpeg_ycbcr,
            build_jpeg_ycbcr_progressive,
            decode_jpeg_pixels,
        )

        rng = np.random.default_rng(23)
        for interval in (1, 2, 5):
            h = 8 * int(rng.integers(2, 5))
            w = 8 * int(rng.integers(2, 5))
            y, cb, cr = (rng.integers(0, 256, (h, w)) for _ in range(3))
            base = decode_jpeg_pixels(build_jpeg_ycbcr(y, cb, cr))[2]
            prog = decode_jpeg_pixels(
                build_jpeg_ycbcr_progressive(y, cb, cr, interval=interval)
            )[2]
            assert np.array_equal(base, prog), f"interval {interval}"


class TestJpeg12Bit:
    """12-bit sample precision (r4 — the LAST JPEG gate): level shift
    2048, 0..4095 clamp, floor-scaled to the 8-bit output domain;
    wider-category Kraft-complete huffman tables embedded via DHT."""

    def test_flat_card_exact_dc_arithmetic(self):
        import math

        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_jpeg_ycbcr_12bit,
            decode_jpeg_pixels,
        )

        for v in (0, 777, 2048, 3000, 4095):
            blob = build_jpeg_ycbcr_12bit(*(np.full((8, 8), v),) * 3)
            _, _, rgb = decode_jpeg_pixels(blob)

            def chain(q):
                dc = math.floor(8 * (v - 2048) / q + 0.5)
                px = math.floor(dc * q / 8 + 2048 + 0.5)
                return min(max(px, 0), 4095) // 16

            y2, c2 = chain(16), chain(17)
            r = min(max(math.floor(y2 + 1.402 * (c2 - 128) + 0.5), 0), 255)
            g = min(
                max(
                    math.floor(
                        y2
                        - 0.344136 * (c2 - 128)
                        - 0.714136 * (c2 - 128)
                        + 0.5
                    ),
                    0,
                ),
                255,
            )
            b = min(max(math.floor(y2 + 1.772 * (c2 - 128) + 0.5), 0), 255)
            assert tuple(rgb[0, 0]) == (r, g, b), f"v={v}"
            assert (rgb == rgb[0, 0]).all()

    def test_large_magnitudes_roundtrip(self):
        """Extreme-contrast 12-bit blocks force DC categories beyond
        the 8-bit Annex K range — the reason the custom tables exist."""
        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_jpeg_ycbcr_12bit,
            decode_jpeg_pixels,
        )

        y = np.zeros((8, 16), dtype=np.int64)
        y[:, 8:] = 4095  # max-swing step edge
        flat = np.full((8, 16), 2048)
        w, h, rgb = decode_jpeg_pixels(build_jpeg_ycbcr_12bit(y, flat, flat))
        assert (w, h) == (16, 8)
        # left half dark, right half bright (ringing aside, means differ)
        assert rgb[:, :4, 0].mean() < 80 and rgb[:, 12:, 0].mean() > 175

    def test_rejects_out_of_range_and_odd_precision(self):
        import struct

        import numpy as np
        import pytest

        from hadoop_brotli_spark.functions.media import (
            build_jpeg_ycbcr,
            build_jpeg_ycbcr_12bit,
            decode_jpeg_pixels,
        )

        with pytest.raises(ValueError):
            build_jpeg_ycbcr_12bit(*(np.full((8, 8), 5000),) * 3)
        # precision 10 stays honestly gated
        blob = bytearray(build_jpeg_ycbcr(*(np.full((8, 8), 50),) * 3))
        sof = bytes(blob).find(b"\xff\xc0")
        struct.pack_into(">B", blob, sof + 4, 10)
        with pytest.raises(NotImplementedError):
            decode_jpeg_pixels(bytes(blob))

    def test_12bit_fuzz(self):
        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_jpeg_ycbcr_12bit,
            decode_jpeg_pixels,
        )

        rng = np.random.default_rng(31)
        planes = [rng.integers(0, 4096, (16, 16)) for _ in range(3)]
        TestDecoderFuzz()._fuzz(
            build_jpeg_ycbcr_12bit(*planes), decode_jpeg_pixels, 108
        )

    def test_12bit_progressive_equals_12bit_baseline(self):
        """12-bit x progressive (r4 — the FINAL JPEG gate): SOF2 at
        precision 12 with the wide-category tables, optionally with
        restart markers, pixel-equal to the 12-bit baseline decode."""
        import numpy as np

        from hadoop_brotli_spark.functions.media import (
            build_jpeg_ycbcr_12bit,
            build_jpeg_ycbcr_progressive,
            decode_jpeg_pixels,
        )

        rng = np.random.default_rng(41)
        for interval in (0, 2):
            y, cb, cr = (rng.integers(0, 4096, (16, 24)) for _ in range(3))
            base = decode_jpeg_pixels(build_jpeg_ycbcr_12bit(y, cb, cr))[2]
            prog = decode_jpeg_pixels(
                build_jpeg_ycbcr_progressive(
                    y, cb, cr, interval=interval, precision=12
                )
            )[2]
            assert np.array_equal(base, prog), f"interval {interval}"
