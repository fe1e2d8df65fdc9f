"""Pure-NumPy BMP/WAV codec contracts (extensions/multimodal.py): real
byte-level round trips, padding/row-order handling, and rejection of
formats the parsers don't claim to support."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from nshm2022db_spark.extensions.multimodal import (
    _bmp_pixels,
    _jpeg_pixels,
    _png_pixels,
    _wav_samples,
    decode_bmp,
    decode_image_real,
    decode_jpeg,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_bmp16,
    encode_bmp32,
    encode_bmp_palette,
    encode_bmp_rle4,
    encode_bmp_rle8,
    encode_jpeg,
    encode_jpeg_progressive,
    encode_png,
    encode_png_gray_subbyte,
    encode_png_palette,
    encode_wav,
)


class TestBMP:
    @pytest.mark.parametrize("w", [4, 5, 6, 7])  # every row-pad residue
    def test_roundtrip_all_pad_residues(self, w):
        rng = np.random.default_rng(w)
        img = rng.integers(0, 256, (9, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)

    def test_roundtrip_deterministic_test_image(self):
        img = _bmp_pixels(12345)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)

    def test_topdown_negative_height(self):
        # Hand-build a top-down file: same bytes, negative height, rows
        # NOT flipped. The decoder must return it unflipped.
        img = _bmp_pixels(7)
        data = bytearray(encode_bmp(img))
        h, w = img.shape[:2]
        struct.pack_into("<i", data, 22, -h)  # biHeight < 0 → top-down
        stride = (w * 3 + 3) // 4 * 4
        pixoff = len(data) - stride * h
        rows = np.frombuffer(bytes(data), np.uint8, stride * h, pixoff).reshape(
            h, stride
        )
        flipped = bytes(np.ascontiguousarray(rows[::-1]))
        data[pixoff:] = flipped
        assert np.array_equal(decode_bmp(bytes(data)), img)

    def test_rejects_non_bmp_and_unsupported(self):
        with pytest.raises(ValueError, match="not a BMP"):
            decode_bmp(b"PNG?" + bytes(64))
        data = bytearray(encode_bmp(_bmp_pixels(1)))
        struct.pack_into("<I", data, 30, 4)  # comp=4 (BI_JPEG)
        with pytest.raises(ValueError, match="compression"):
            decode_bmp(bytes(data))
        data = bytearray(encode_bmp(_bmp_pixels(1)))
        struct.pack_into("<H", data, 28, 2)  # bpp=2 is not a BMP depth
        with pytest.raises(ValueError, match="bit depth"):
            decode_bmp(bytes(data))

    def test_decode_image_real_handles_bmp_stubs_rest(self):
        img = _bmp_pixels(3)
        w, h, fmt = decode_image_real(encode_bmp(img))
        assert (w, h, fmt) == (img.shape[1], img.shape[0], "BMP")
        # a PNG-signature blob with garbage chunks fails CRC in the
        # NATIVE decoder now (r10) — ValueError, not NotImplemented
        with pytest.raises(ValueError, match="CRC"):
            decode_image_real(b"\x89PNG\r\n\x1a\n" + bytes(32))
        # baseline JPEG decodes natively now (r11); a truncated
        # SOI+APP0 blob is a malformed stream — ValueError, not
        # NotImplemented
        with pytest.raises(ValueError):
            decode_image_real(b"\xff\xd8\xff\xe0" + bytes(32))


class TestBMPVariants:
    """r12 (VERDICT r11 missing #3, BMP leg): palettized, RLE8/RLE4,
    16-bit (555/565 bitfields) and 32-bit BGRX decode natively — round
    trips against the in-repo encoders plus a hand-assembled RLE stream
    exercising the delta escape the encoder never emits."""

    @pytest.mark.parametrize("bpp", [1, 4, 8])
    @pytest.mark.parametrize("w", [4, 5, 6, 7, 13])
    def test_palettized_all_depths_and_pad_residues(self, bpp, w):
        rng = np.random.default_rng(bpp * 100 + w)
        n = 1 << bpp
        pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
        idx = rng.integers(0, n, (6, w), dtype=np.uint8)
        out = decode_bmp(encode_bmp_palette(idx, pal, bpp))
        assert np.array_equal(out, pal[idx])

    def test_rle8_runs_and_literals(self):
        rng = np.random.default_rng(8)
        pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
        # mix long runs (encoded-run path) with singletons (absolute-
        # mode literals) in one image
        idx = np.repeat(
            rng.integers(0, 256, (8, 9), dtype=np.uint8),
            [1, 4, 1, 2, 7, 1, 1, 3, 1], axis=1,
        )
        out = decode_bmp(encode_bmp_rle8(idx, pal))
        assert np.array_equal(out, pal[idx])

    def test_rle4_alternating_nibble_runs(self):
        rng = np.random.default_rng(4)
        pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        idx = rng.integers(0, 16, (7, 11), dtype=np.uint8)
        idx[2, 2:9] = 5  # constant run
        idx[3, 1:8] = np.tile([3, 9], 4)[:7]  # a/b alternating run
        out = decode_bmp(encode_bmp_rle4(idx, pal))
        assert np.array_equal(out, pal[idx])

    def test_rle8_delta_escape_hand_assembled(self):
        """Delta (0x00 0x02 dx dy) jumps the cursor; skipped pixels
        stay palette index 0. The in-repo encoder never emits deltas,
        so this pins the decoder against the spec, not the encoder."""
        pal = np.array(
            [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8
        )
        # 4x3 image decoded bottom-up: a run on the bottom row, a delta
        # jump to (3, row 1), one literal there, EOL, a full run row.
        stream = bytes(
            [2, 1,        # two pixels of index 1 at (0..1, row 0)
             0, 2, 1, 1,  # delta: dx=1 dy=1 → cursor (3, row 1)
             1, 2,        # one pixel of index 2 at (3, row 1)
             0, 0,        # EOL → row 2
             4, 3,        # full row of index 3
             0, 1]        # EOB
        )
        from nshm2022db_spark.extensions.multimodal import _bmp_assemble

        blob = _bmp_assemble(4, 3, 8, 1, stream, pal)
        out = decode_bmp(blob)
        exp_idx = np.array(  # bottom-up grid, flipped to image order
            [[3, 3, 3, 3],
             [0, 0, 0, 2],
             [1, 1, 0, 0]], np.uint8
        )
        assert np.array_equal(out, pal[exp_idx])

    def test_16bit_555_and_565(self):
        rng = np.random.default_rng(16)
        img = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
        out = decode_bmp(encode_bmp16(img, "555"))
        exp = np.stack(
            [(img[..., i].astype(np.int64) >> 3) * 255 // 31
             for i in range(3)], -1,
        ).astype(np.uint8)
        assert np.array_equal(out, exp)
        out = decode_bmp(encode_bmp16(img, "565"))
        exp = np.stack(
            [(img[..., 0].astype(np.int64) >> 3) * 255 // 31,
             (img[..., 1].astype(np.int64) >> 2) * 255 // 63,
             (img[..., 2].astype(np.int64) >> 3) * 255 // 31], -1,
        ).astype(np.uint8)
        assert np.array_equal(out, exp)

    def test_32bit_exact_roundtrip(self):
        rng = np.random.default_rng(32)
        img = rng.integers(0, 256, (4, 9, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp32(img)), img)

    def test_decode_image_real_reports_variant_dims(self):
        rng = np.random.default_rng(99)
        pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        idx = rng.integers(0, 16, (6, 8), dtype=np.uint8)
        w, h, fmt = decode_image_real(encode_bmp_rle4(idx, pal))
        assert (w, h, fmt) == (8, 6, "BMP")
        img = rng.integers(0, 256, (3, 5, 3), dtype=np.uint8)
        w, h, fmt = decode_image_real(encode_bmp16(img, "565"))
        assert (w, h, fmt) == (5, 3, "BMP")


class TestPNG:
    """Pure stdlib-zlib + NumPy PNG codec (r10, VERDICT r09 #5): full
    filter coverage, both color types, CRC validation, multi-IDAT
    reassembly, and rejection of variants the parser doesn't claim."""

    @pytest.mark.parametrize("shape", [(1, 1, 3), (5, 3, 3), (12, 17, 4),
                                       (6, 1, 4), (8, 200, 3)])
    def test_roundtrip(self, shape):
        rng = np.random.RandomState(7)
        img = rng.randint(0, 256, shape, dtype=np.uint8)
        back = decode_png(encode_png(img))
        assert back.shape == img.shape and (back == img).all()

    def test_roundtrip_deterministic_test_images(self):
        for mid in (0, 1, 2, 3, 9, 100):  # mixes RGB and RGBA
            img = _png_pixels(mid)
            assert (decode_png(encode_png(img)) == img).all()

    def test_every_filter_type_appears_and_decodes(self):
        """The encoder rotates filters per scanline (y % 5); an image
        with >= 5 rows therefore carries all five filter types, and the
        round trip proves every unfilter (the property that lets the
        corpus-level checksum oracle pin the whole filter matrix)."""
        import zlib

        img = np.arange(9 * 7 * 3, dtype=np.uint8).reshape(9, 7, 3) * 31 % 256
        blob = encode_png(img)
        # reassemble the zlib stream and read each scanline's filter tag
        pos, idat = 8, b""
        while pos + 12 <= len(blob):
            (ln,) = struct.unpack_from(">I", blob, pos)
            if blob[pos + 4:pos + 8] == b"IDAT":
                idat += blob[pos + 8:pos + 8 + ln]
            pos += 12 + ln
        raw = zlib.decompress(idat)
        stride = 1 + 7 * 3
        tags = {raw[y * stride] for y in range(9)}
        assert tags == {0, 1, 2, 3, 4}
        assert (decode_png(blob) == img).all()

    def test_multi_idat_and_crc_tamper(self):
        blob = bytearray(encode_png(_png_pixels(9)))
        assert blob.count(b"IDAT") == 2  # reassembly exercised
        blob[40] ^= 0xFF
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(blob))

    def test_truncated_chunk_raises_valueerror(self):
        """r10 review #8: a truncated/corrupt chunk length must keep
        the ValueError contract (decode_image_real's PIL-tier fallback
        catches ValueError, not struct.error)."""
        blob = encode_png(_png_pixels(1))
        with pytest.raises(ValueError, match="truncated"):
            decode_png(blob[: len(blob) // 2])
        bad = bytearray(blob)
        bad[8:12] = (2 ** 31).to_bytes(4, "big")  # absurd IHDR length
        with pytest.raises(ValueError, match="truncated"):
            decode_png(bytes(bad))

    def test_rejects_illegal_variants(self):
        """Every LEGAL variant now decodes natively (r12); only
        spec-illegal combos and non-PNG bytes are rejected."""
        import zlib

        def chunk(t, b):
            return (
                struct.pack(">I", len(b)) + t + b
                + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
            )

        sig = b"\x89PNG\r\n\x1a\n"
        # RGB at depth 4 is spec-illegal (ctype 2 allows 8/16 only)
        bad = sig + chunk(
            b"IHDR", struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0)
        ) + chunk(b"IDAT", zlib.compress(bytes(20))) + chunk(b"IEND", b"")
        with pytest.raises(ValueError, match="illegal"):
            decode_png(bad)
        # unknown color type 7
        bad = sig + chunk(
            b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 7, 0, 0, 0)
        ) + chunk(b"IDAT", zlib.compress(bytes(20))) + chunk(b"IEND", b"")
        with pytest.raises(ValueError, match="illegal"):
            decode_png(bad)
        # palette file without PLTE
        bad = sig + chunk(
            b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
        ) + chunk(b"IDAT", zlib.compress(bytes(6))) + chunk(b"IEND", b"")
        with pytest.raises(ValueError, match="PLTE"):
            decode_png(bad)
        with pytest.raises(ValueError, match="not a PNG"):
            decode_png(b"BM" + bytes(32))

    def test_filter0_only_external_construction(self):
        """A PNG assembled independently of encode_png (filter 0 only,
        single IDAT) decodes identically — the decoder is not merely
        the encoder's inverse."""
        import zlib

        img = _png_pixels(9)
        h, w = img.shape[:2]

        def chunk(t, b):
            return (
                struct.pack(">I", len(b)) + t + b
                + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
            )

        lines = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
        blob = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(lines))
            + chunk(b"IEND", b"")
        )
        assert (decode_png(blob) == img).all()


class TestPNGVariants:
    """r12 (VERDICT r11 missing #3, PNG leg): gray/GA/16-bit/sub-byte/
    palette/Adam7 all decode natively — exact round trips against the
    in-repo encoders, plus an externally-assembled interlaced file so
    the decoder is not merely the encoder's inverse."""

    def test_grayscale_8_and_16_bit(self):
        rng = np.random.RandomState(3)
        g8 = rng.randint(0, 256, (11, 7), dtype=np.uint8)
        out = decode_png(encode_png(g8))
        assert out.shape == (11, 7) and np.array_equal(out, g8)
        g16 = rng.randint(0, 65536, (10, 6)).astype(np.uint16)
        out = decode_png(encode_png(g16))
        assert out.dtype == np.uint16 and np.array_equal(out, g16)

    def test_gray_alpha_and_16bit_color(self):
        rng = np.random.RandomState(5)
        ga = rng.randint(0, 256, (9, 5, 2), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(ga)), ga)
        rgb16 = rng.randint(0, 65536, (8, 12, 3)).astype(np.uint16)
        assert np.array_equal(decode_png(encode_png(rgb16)), rgb16)
        rgba16 = rng.randint(0, 65536, (17, 3, 4)).astype(np.uint16)
        out = decode_png(encode_png(rgba16))
        assert out.dtype == np.uint16 and np.array_equal(out, rgba16)

    @pytest.mark.parametrize("depth", [1, 2, 4, 8])
    def test_palette_depths_with_and_without_trns(self, depth):
        rng = np.random.RandomState(depth)
        n = 1 << depth
        pal = rng.randint(0, 256, (n, 3), dtype=np.uint8)
        idx = rng.randint(0, n, (14, 10), dtype=np.uint8)
        assert np.array_equal(
            decode_png(encode_png_palette(idx, pal, depth)), pal[idx]
        )
        trns = rng.randint(0, 256, n // 2 + 1, dtype=np.uint8)
        out = decode_png(encode_png_palette(idx, pal, depth, trns=trns))
        alpha = np.full(n, 255, np.uint8)
        alpha[: len(trns)] = trns
        exp = np.concatenate([pal[idx], alpha[idx][..., None]], -1)
        assert out.shape[-1] == 4 and np.array_equal(out, exp)

    @pytest.mark.parametrize("depth", [1, 2, 4])
    def test_subbyte_grayscale_rescales(self, depth):
        rng = np.random.RandomState(depth)
        g = rng.randint(0, 1 << depth, (15, 11), dtype=np.uint8)
        out = decode_png(encode_png_gray_subbyte(g, depth))
        exp = (g.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(
            np.uint8
        )
        assert np.array_equal(out, exp)

    @pytest.mark.parametrize(
        "shape", [(1, 1, 3), (2, 2, 3), (3, 5, 4), (1, 9, 3), (9, 1, 3),
                  (13, 9, 3), (16, 16, 4)]
    )
    def test_adam7_interlace_roundtrip_all_pass_shapes(self, shape):
        """Interlaced round trip including tiny images where some Adam7
        passes are EMPTY (1x1 has only pass 1) — the pass-geometry edge
        cases where off-by-ones live."""
        rng = np.random.RandomState(sum(shape))
        img = rng.randint(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img, interlace=True)), img)

    def test_adam7_palette_and_16bit(self):
        rng = np.random.RandomState(77)
        pal = rng.randint(0, 256, (16, 3), dtype=np.uint8)
        idx = rng.randint(0, 16, (12, 14), dtype=np.uint8)
        blob = encode_png_palette(idx, pal, 4, interlace=True)
        assert np.array_equal(decode_png(blob), pal[idx])
        g16 = rng.randint(0, 65536, (9, 9)).astype(np.uint16)
        assert np.array_equal(
            decode_png(encode_png(g16, interlace=True)), g16
        )

    def test_interlaced_external_construction(self):
        """An Adam7 file assembled by hand (filter 0 only, explicit
        per-pass scanline layout) decodes identically — pins the pass
        geometry against the spec, not against encode_png."""
        import zlib

        rng = np.random.RandomState(11)
        img = rng.randint(0, 256, (5, 6, 3), dtype=np.uint8)
        passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                  (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
        lines = b""
        for x0, y0, dx, dy in passes:
            sub = img[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            for row in sub:
                lines += b"\x00" + row.tobytes()

        def chunk(t, b):
            return (
                struct.pack(">I", len(b)) + t + b
                + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
            )

        blob = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 2, 0, 0, 1))
            + chunk(b"IDAT", zlib.compress(lines))
            + chunk(b"IEND", b"")
        )
        assert np.array_equal(decode_png(blob), img)

    def test_decode_image_real_reports_variant_dims(self):
        rng = np.random.RandomState(13)
        pal = rng.randint(0, 256, (4, 3), dtype=np.uint8)
        idx = rng.randint(0, 4, (6, 8), dtype=np.uint8)
        w, h, fmt = decode_image_real(encode_png_palette(idx, pal, 2))
        assert (w, h, fmt) == (8, 6, "PNG")
        g16 = rng.randint(0, 65536, (4, 7)).astype(np.uint16)
        w, h, fmt = decode_image_real(encode_png(g16, interlace=True))
        assert (w, h, fmt) == (7, 4, "PNG")


class TestWAV:
    def test_roundtrip(self):
        s = _wav_samples(4321)
        rate, out = decode_wav(encode_wav(s, 22_050))
        assert rate == 22_050
        assert np.array_equal(out, s)

    def test_chunk_walk_skips_extra_chunks(self):
        # Insert a LIST chunk (odd size → padded) between fmt and data.
        s = np.array([1, -2, 3, -4], np.int16)
        data = encode_wav(s)
        fmt_end = 12 + 8 + 16
        extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
        patched = data[:fmt_end] + extra + data[fmt_end:]
        patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
        rate, out = decode_wav(patched)
        assert rate == 16_000
        assert np.array_equal(out, s)

    def test_rejects_non_wav_and_non_pcm(self):
        with pytest.raises(ValueError, match="RIFF"):
            decode_wav(b"OggS" + bytes(32))
        data = bytearray(encode_wav(np.array([0, 1], np.int16)))
        struct.pack_into("<H", data, 20, 3)  # format tag: IEEE float
        with pytest.raises(ValueError, match="PCM16"):
            decode_wav(bytes(data))


class TestJPEG:
    """Baseline-sequential JPEG, pure NumPy (VERDICT r10 stretch #8):
    exact round trip on the DC-only oracle corpus, bounded error on
    AC-bearing real content, restart-marker resync, marker-walk
    rejection of non-baseline variants."""

    def test_dc_exact_roundtrip_even_constant_blocks(self):
        rng = np.random.default_rng(11)
        bv = (rng.integers(0, 128, (3, 5)) * 2).astype(np.uint8)
        img = bv.repeat(8, 0).repeat(8, 1)
        out = decode_jpeg(encode_jpeg(img))
        assert out.dtype == np.uint8 and np.array_equal(out, img)

    def test_oracle_corpus_pixels_exact(self):
        for mid in (0, 1, 2, 3, 7, 41, 123):
            img = _jpeg_pixels(mid)
            out = decode_jpeg(
                encode_jpeg(img, restart_interval=2 if mid % 3 == 0 else 0)
            )
            assert np.array_equal(out, img), mid

    def test_gray_gradient_bounded_error_any_padding(self):
        # non-multiple-of-8 dims exercise edge padding + cropping
        for h, w in [(24, 32), (17, 21), (9, 40)]:
            x, y = np.meshgrid(np.arange(w), np.arange(h))
            img = ((x * 3 + y * 2) % 256).astype(np.uint8)
            out = decode_jpeg(encode_jpeg(img))
            assert out.shape == img.shape
            assert np.abs(out.astype(int) - img.astype(int)).max() <= 4

    def test_rgb_444_and_420_bounded_error(self):
        x, y = np.meshgrid(np.arange(32), np.arange(24))
        img = np.stack(
            [(x * 5 + y) % 256, (x + y * 7) % 256, (x * 2 + y * 3) % 256], -1
        ).astype(np.uint8)
        out444 = decode_jpeg(encode_jpeg(img))
        assert out444.shape == img.shape
        assert np.abs(out444.astype(int) - img.astype(int)).max() <= 10
        # 4:2:0 on odd dims: subsampled chroma loses high-frequency
        # chroma detail by design — bound the MEAN error instead
        odd = img[:17, :21]
        out420 = decode_jpeg(encode_jpeg(odd, subsample=True))
        assert out420.shape == odd.shape
        assert np.abs(out420.astype(int) - odd.astype(int)).mean() <= 6.0

    def test_restart_markers_resync_and_reset_predictors(self):
        x, y = np.meshgrid(np.arange(40), np.arange(24))
        img = ((x * 3 + y * 2) % 256).astype(np.uint8)
        data = encode_jpeg(img, restart_interval=2)
        assert b"\xff\xdd" in data  # DRI segment
        assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
        out = decode_jpeg(data)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 4
        # byte stream equality with the no-restart encode FAILS (the
        # predictors reset), but the decoded pixels agree
        out0 = decode_jpeg(encode_jpeg(img))
        assert np.array_equal(out, out0)

    def test_decode_image_real_handles_baseline_jpeg(self):
        img = _jpeg_pixels(5)
        w, h = img.shape[1], img.shape[0]
        assert decode_image_real(encode_jpeg(img)) == (w, h, "JPEG")

    def test_rejects_unsupported_variants(self):
        with pytest.raises(ValueError, match="not a JPEG"):
            decode_jpeg(b"\x89PNG" + bytes(16))
        data = bytearray(encode_jpeg(_jpeg_pixels(1)))
        sof = data.find(b"\xff\xc0")
        data[sof + 1] = 0xC9  # arithmetic-coded sequential
        with pytest.raises(ValueError, match="natively"):
            decode_jpeg(bytes(data))
        data = bytearray(encode_jpeg(_jpeg_pixels(1)))
        sof = data.find(b"\xff\xc0")
        data[sof + 4] = 10  # precision 10 exists nowhere in T.81
        with pytest.raises(ValueError, match="8/12-bit"):
            decode_jpeg(bytes(data))

    def test_progressive_decodes_identically_to_baseline(self):
        """r12 (VERDICT r11 missing #3, JPEG leg): a progressive file
        carries the SAME quantized coefficients as its baseline
        counterpart, just re-ordered across scans — so after full scan
        accumulation the decode must be BIT-IDENTICAL to the baseline
        decode. One equality pins every progressive path: DC initial/
        refinement, both AC spectral bands, successive approximation,
        and EOB runs."""
        rng = np.random.RandomState(42)
        for shape in [(8, 8), (16, 24), (13, 21), (7, 5)]:
            img = rng.randint(0, 256, shape).astype(np.uint8)
            base = decode_jpeg(encode_jpeg(img))
            prog = decode_jpeg(encode_jpeg_progressive(img))
            assert np.array_equal(base, prog), shape

    def test_progressive_color_444_and_420(self):
        rng = np.random.RandomState(7)
        for shape in [(17, 9, 3), (24, 16, 3)]:
            img = rng.randint(0, 256, shape).astype(np.uint8)
            assert np.array_equal(
                decode_jpeg(encode_jpeg(img)),
                decode_jpeg(encode_jpeg_progressive(img)),
            ), shape
        # 4:2:0 with non-MCU-multiple dims: the component's TRUE block
        # grid (AC scan iteration space) differs from the MCU-padded
        # grid — the geometry edge progressive decode must get right
        for shape in [(17, 25, 3), (23, 9, 3)]:
            img = rng.randint(0, 256, shape).astype(np.uint8)
            assert np.array_equal(
                decode_jpeg(encode_jpeg(img, subsample=True)),
                decode_jpeg(encode_jpeg_progressive(img, subsample=True)),
            ), shape

    def test_progressive_dc_exact_oracle_corpus(self):
        """Block-constant even-valued images round-trip EXACTLY through
        the progressive pipeline too (all AC scans are pure EOB runs,
        exercising the multi-block EOBn symbols)."""
        for mid in (0, 1, 7, 42, 99):
            img = _jpeg_pixels(mid)
            assert np.array_equal(
                decode_jpeg(encode_jpeg_progressive(img)), img
            )

    def test_12bit_extended_sequential(self):
        """r12: 12-bit precision (SOF1, level shift 2048, the wider
        Huffman tables) decodes natively to uint16. Block-constant
        values with even offsets from 2048 round-trip EXACTLY (DC quant
        step 16 divides 8*(v-2048)); a gradient is tolerance-pinned."""
        rng = np.random.RandomState(12)
        vals = (rng.randint(0, 2048, (2, 3)) * 2).astype(np.int64)
        img = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint16)
        blob = encode_jpeg(img, precision=12)
        assert b"\xff\xc1" in blob  # SOF1, not baseline
        out = decode_jpeg(blob)
        assert out.dtype == np.uint16 and np.array_equal(out, img)
        xx, yy = np.meshgrid(np.arange(24), np.arange(16))
        grad = ((xx * 150 + yy * 90) % 4096).astype(np.uint16)
        out = decode_jpeg(encode_jpeg(grad, precision=12))
        assert np.abs(out.astype(int) - grad.astype(int)).max() < 200

    def test_16bit_quant_table_accepted(self):
        """A DQT with 16-bit values (precision nibble 1) must parse —
        hand-patch the 8-bit table into the wide layout."""
        img = _jpeg_pixels(5)
        blob = encode_jpeg(img)
        dqt = blob.find(b"\xff\xdb")
        # original segment: marker(2) len(2) id(1) 64 bytes
        vals = blob[dqt + 5 : dqt + 5 + 64]
        wide = b"".join(bytes([0, v]) for v in vals)
        newseg = b"\xff\xdb" + struct.pack(">H", 2 + 1 + 128) + bytes([0x10]) + wide
        patched = blob[:dqt] + newseg + blob[dqt + 4 + 65 :]
        assert np.array_equal(decode_jpeg(patched), decode_jpeg(blob))

    def test_12bit_baseline_marker_rejected(self):
        blob = bytearray(encode_jpeg(
            np.full((8, 8), 2048, np.uint16), precision=12
        ))
        sof = bytes(blob).find(b"\xff\xc1")
        blob[sof + 1] = 0xC0  # claim baseline with 12-bit precision
        with pytest.raises(ValueError, match="not legal baseline"):
            decode_jpeg(bytes(blob))

    def test_progressive_stream_contains_eobn_and_sof2(self):
        blob = encode_jpeg_progressive(_jpeg_pixels(3))
        assert b"\xff\xc2" in blob  # SOF2 marker
        assert blob.count(b"\xff\xda") == 6  # 6 scans for grayscale
        w, h, fmt = decode_image_real(blob)
        assert fmt == "JPEG"

    def test_app_and_comment_segments_skipped(self):
        img = _jpeg_pixels(2)
        data = encode_jpeg(img)
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(9)
        com = b"\xff\xfe" + struct.pack(">H", 7) + b"hello"
        patched = data[:2] + app0 + com + data[2:]
        assert np.array_equal(decode_jpeg(patched), img)


class TestAVIMJPEG:
    """r12: Motion-JPEG AVI — RIFF container walk + per-frame JPEG
    decode. Frames round-trip exactly on the DC-exact corpus; the
    header cross-check and non-AVI rejection are pinned."""

    def test_roundtrip_deterministic_corpus(self):
        from nshm2022db_spark.extensions.multimodal import (
            _video_frames, decode_avi_mjpeg, encode_avi_mjpeg,
        )

        for mid in (0, 1, 5, 13, 42):
            frames = _video_frames(mid)
            fps, out = decode_avi_mjpeg(encode_avi_mjpeg(frames))
            assert fps == 10 and len(out) == len(frames)
            for a, b in zip(frames, out):
                assert np.array_equal(a, b)

    def test_header_count_cross_check(self):
        from nshm2022db_spark.extensions.multimodal import (
            _video_frames, decode_avi_mjpeg, encode_avi_mjpeg,
        )

        blob = bytearray(encode_avi_mjpeg(_video_frames(1)))
        i = bytes(blob).find(b"avih")
        struct.pack_into("<I", blob, i + 8 + 16, 99)  # wrong total_frames
        with pytest.raises(ValueError, match="frame count"):
            decode_avi_mjpeg(bytes(blob))

    def test_rejects_non_avi_and_empty(self):
        from nshm2022db_spark.extensions.multimodal import (
            decode_avi_mjpeg, encode_avi_mjpeg,
        )

        with pytest.raises(ValueError, match="not a RIFF/AVI"):
            decode_avi_mjpeg(b"RIFF" + bytes(8) + b"WAVE")
        with pytest.raises(ValueError, match="at least one frame"):
            encode_avi_mjpeg([])

    def test_mismatched_frame_sizes_rejected(self):
        from nshm2022db_spark.extensions.multimodal import encode_avi_mjpeg

        a = np.zeros((8, 8), np.uint8)
        b = np.zeros((8, 16), np.uint8)
        with pytest.raises(ValueError, match="share one size"):
            encode_avi_mjpeg([a, b])

    def test_odd_sized_jpeg_chunks_pad_correctly(self):
        """RIFF chunks are 2-byte aligned; an odd-length JPEG payload
        must not desync the walk. Force odd lengths by trying several
        contents until one encodes odd."""
        from nshm2022db_spark.extensions.multimodal import (
            decode_avi_mjpeg, encode_avi_mjpeg, encode_jpeg,
        )

        rng = np.random.RandomState(3)
        frames = None
        for _ in range(50):
            cand = [rng.randint(0, 256, (8, 8)).astype(np.uint8)
                    for _ in range(3)]
            if any(len(encode_jpeg(f)) % 2 for f in cand):
                frames = cand
                break
        assert frames is not None
        _, out = decode_avi_mjpeg(encode_avi_mjpeg(frames))
        assert len(out) == 3  # walk stayed aligned through odd chunks


class TestMalformedInputHardening:
    """r12 hardening sweep: crafted headers with absurd dimensions or
    pathological nesting must fail with the ValueError contract
    decode_image_real's fallback catches — never MemoryError (huge
    allocation before any payload check) or RecursionError."""

    def test_png_absurd_dims_valueerror_before_alloc(self):
        import zlib

        def chunk(t, b):
            return (
                struct.pack(">I", len(b)) + t + b
                + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
            )

        sig = b"\x89PNG\r\n\x1a\n"
        bad = sig + chunk(
            b"IHDR", struct.pack(">IIBBBBB", 2**24, 2**24, 8, 2, 0, 0, 0)
        ) + chunk(b"IDAT", zlib.compress(bytes(10))) + chunk(b"IEND", b"")
        with pytest.raises(ValueError, match="implausible|payload size"):
            decode_png(bad)

    def test_jpeg_absurd_dims_valueerror(self):
        data = bytearray(encode_jpeg(_jpeg_pixels(1)))
        sof = bytes(data).find(b"\xff\xc0")
        struct.pack_into(">HH", data, sof + 5, 60000, 60000)
        with pytest.raises(ValueError, match="implausible"):
            decode_jpeg(bytes(data))

    def test_rle_bmp_absurd_dims_valueerror(self):
        from nshm2022db_spark.extensions.multimodal import _bmp_assemble

        pal = np.zeros((256, 3), np.uint8)
        blob = bytearray(_bmp_assemble(4, 3, 8, 1, b"\x00\x01", pal))
        struct.pack_into("<ii", blob, 18, 2**20, 2**20)
        with pytest.raises(ValueError, match="implausible"):
            decode_bmp(bytes(blob))

    def test_avi_deep_nesting_valueerror(self):
        from nshm2022db_spark.extensions.multimodal import decode_avi_mjpeg

        deep = b""
        for _ in range(40):
            deep = b"LIST" + struct.pack("<I", len(deep) + 4) + b"xxxx" + deep
        avi = b"RIFF" + struct.pack("<I", 4 + len(deep)) + b"AVI " + deep
        with pytest.raises(ValueError, match="nesting too deep"):
            decode_avi_mjpeg(avi)


class TestR12ReviewFindings:
    """Regressions for the r12 post-landing review: V4-header mask
    offset, the ValueError boundary on every decoder, the PNG inflate
    cap, and the AVI fps guard."""

    def test_bitfields_masks_read_from_v4_header(self):
        """A 565 BMP with a 108-byte BITMAPV4HEADER must decode the
        same pixels as the 40-byte-header file — the masks sit at file
        offset 54 in BOTH layouts (the old code read them at
        14+biSize, i.e. pixel data, and returned silently wrong
        colors)."""
        rng = np.random.default_rng(4)
        img = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
        blob = encode_bmp16(img, "565")
        exp = decode_bmp(blob)
        # rebuild with biSize=108: header + 68 extra zero bytes after
        # the masks, pixel offset shifted accordingly
        pixoff = struct.unpack_from("<I", blob, 10)[0]
        masks = blob[54:66]
        v4 = bytearray(blob[:14])
        info = bytearray(blob[14:54])
        struct.pack_into("<I", info, 0, 108)  # biSize
        payload = blob[pixoff:]
        new_pixoff = 14 + 108
        struct.pack_into("<I", v4, 10, new_pixoff)
        v4blob = bytes(v4) + bytes(info) + masks + bytes(108 - 40 - 12) + payload
        assert np.array_equal(decode_bmp(v4blob), exp)

    @pytest.mark.parametrize(
        "blob",
        [b"\xff\xd8\xff\xdb",              # truncated segment header
         b"\xff\xd8\xff\xdb\x00\x40" + bytes(8),  # truncated body
         b"\xff\xd8\xff\xc0\x00\x0b" + bytes(9)],  # short SOF
    )
    def test_truncated_jpeg_raises_valueerror(self, blob):
        with pytest.raises(ValueError):
            decode_jpeg(blob)

    def test_two_component_jpeg_rejected(self):
        data = bytearray(encode_jpeg(_jpeg_pixels(1)))
        sof = data.find(b"\xff\xc0")
        data[sof + 9] = 2  # claim 2 components
        with pytest.raises(ValueError):
            decode_jpeg(bytes(data))

    def test_png_inflate_capped_at_expected_payload(self):
        """A 1x1 PNG whose IDAT inflates to far more than the expected
        payload must be rejected without materializing the bomb."""
        import zlib

        def chunk(t, b):
            return (
                struct.pack(">I", len(b)) + t + b
                + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
            )

        bomb = zlib.compress(bytes(50_000_000))  # ~50 MB of zeros
        blob = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", bomb)
            + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="payload size"):
            decode_png(blob)

    def test_truncated_idat_zlib_error_becomes_valueerror(self):
        import zlib

        def chunk(t, b):
            return (
                struct.pack(">I", len(b)) + t + b
                + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
            )

        g = np.arange(64, dtype=np.uint8).reshape(8, 8)
        blob = encode_png(g)
        # corrupt the deflate payload of the first IDAT (keep CRC valid
        # by rebuilding the chunk)
        i = blob.find(b"IDAT")
        ln = struct.unpack_from(">I", blob, i - 4)[0]
        body = bytearray(blob[i + 4 : i + 4 + ln])
        body[2:] = body[2:][::-1]  # scramble past the zlib header
        rebuilt = blob[: i - 4] + chunk(b"IDAT", bytes(body)) + blob[i + 8 + ln :]
        with pytest.raises(ValueError):
            decode_png(rebuilt)

    def test_rle_truncated_delta_valueerror(self):
        from nshm2022db_spark.extensions.multimodal import _bmp_assemble

        pal = np.zeros((256, 3), np.uint8)
        blob = _bmp_assemble(4, 3, 8, 1, b"\x00\x02", pal)  # delta, no operands
        with pytest.raises(ValueError):
            decode_bmp(blob)

    def test_avi_missing_vids_header_valueerror(self):
        from nshm2022db_spark.extensions.multimodal import (
            decode_avi_mjpeg, encode_avi_mjpeg, _video_frames,
        )

        blob = bytearray(encode_avi_mjpeg(_video_frames(1)))
        i = bytes(blob).find(b"strh") + 8
        blob[i : i + 4] = b"auds"  # no video stream header remains
        with pytest.raises(ValueError, match="vids"):
            decode_avi_mjpeg(bytes(blob))

    def test_truncated_avih_valueerror(self):
        from nshm2022db_spark.extensions.multimodal import (
            decode_avi_mjpeg,
        )

        deep = b"avih" + struct.pack("<I", 8) + bytes(8)  # too short
        body = b"AVI " + b"LIST" + struct.pack("<I", 4 + len(deep)) + b"hdrl" + deep
        avi = b"RIFF" + struct.pack("<I", len(body)) + body
        with pytest.raises(ValueError):
            decode_avi_mjpeg(avi)


class TestGIF:
    """r12: pure-Python/NumPy GIF — LZW with variable code widths and
    mid-stream resets, 4-pass interlace, GIF89a animation."""

    @pytest.mark.parametrize("n,shape", [(4, (7, 9)), (16, (16, 16)),
                                         (256, (40, 60)), (3, (1, 1)),
                                         (2, (5, 3))])
    @pytest.mark.parametrize("interlace", [False, True])
    def test_single_frame_roundtrip(self, n, shape, interlace):
        from nshm2022db_spark.extensions.multimodal import (
            decode_gif, encode_gif,
        )

        rng = np.random.default_rng(n + shape[0])
        pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
        idx = rng.integers(0, n, shape, dtype=np.uint8)
        frames, delay = decode_gif(encode_gif(idx, pal, interlace=interlace))
        assert len(frames) == 1 and delay == 0
        assert np.array_equal(frames[0], pal[idx])

    def test_animated_frames_and_delay(self):
        from nshm2022db_spark.extensions.multimodal import (
            decode_gif, encode_gif,
        )

        rng = np.random.default_rng(5)
        pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        fr = [rng.integers(0, 16, (12, 10), dtype=np.uint8)
              for _ in range(4)]
        frames, delay = decode_gif(encode_gif(fr, pal, delay_cs=7))
        assert len(frames) == 4 and delay == 7
        for a, b in zip(fr, frames):
            assert np.array_equal(b, pal[a])

    def test_lzw_width_growth_and_table_reset(self):
        """A 2-color 60k-pixel image drives the code width to 12 bits
        and forces the 4096-entry table reset; a 256-color image starts
        at width 9 — both must round-trip exactly."""
        from nshm2022db_spark.extensions.multimodal import (
            decode_gif, encode_gif,
        )

        rng = np.random.default_rng(12)
        idx = rng.integers(0, 2, (200, 300), dtype=np.uint8)
        pal2 = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
        frames, _ = decode_gif(encode_gif(idx, pal2))
        assert np.array_equal(frames[0], pal2[idx])
        idx = rng.integers(0, 256, (120, 150), dtype=np.uint8)
        pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
        frames, _ = decode_gif(encode_gif(idx, pal))
        assert np.array_equal(frames[0], pal[idx])

    def test_rejects_malformed(self):
        from nshm2022db_spark.extensions.multimodal import (
            decode_gif, encode_gif,
        )

        with pytest.raises(ValueError, match="not a GIF"):
            decode_gif(b"RIFF" + bytes(16))
        pal = np.zeros((4, 3), np.uint8)
        blob = bytearray(encode_gif(np.zeros((4, 4), np.uint8), pal))
        blob = blob[: len(blob) // 2]  # truncate mid-stream
        with pytest.raises(ValueError):
            decode_gif(bytes(blob))
        # absurd dims
        bad = bytearray(encode_gif(np.zeros((4, 4), np.uint8), pal))
        struct.pack_into("<HH", bad, 6, 65535, 65535)
        with pytest.raises(ValueError, match="implausible"):
            decode_gif(bytes(bad))

    def test_decode_image_real_reports_gif(self):
        from nshm2022db_spark.extensions.multimodal import encode_gif

        pal = np.arange(12, dtype=np.uint8).reshape(4, 3)
        idx = np.zeros((6, 9), np.uint8)
        w, h, fmt = decode_image_real(encode_gif(idx, pal))
        assert (w, h, fmt) == (9, 6, "GIF")


class TestTIFF:
    """r12: baseline TIFF — IFD tag walk in both byte orders, strips,
    none/LZW/PackBits, the horizontal predictor, palette colormap."""

    @pytest.mark.parametrize("be", [False, True])
    @pytest.mark.parametrize("comp", [1, 5, 32773])
    def test_gray_and_rgb_roundtrip(self, be, comp):
        from nshm2022db_spark.extensions.multimodal import (
            decode_tiff, encode_tiff,
        )

        rng = np.random.default_rng(comp + be)
        for shape in [(9, 7), (16, 5, 3), (1, 1), (30, 40, 3)]:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            out = decode_tiff(
                encode_tiff(img, compression=comp, big_endian=be)
            )
            assert np.array_equal(out, img), shape

    def test_lzw_with_horizontal_predictor(self):
        from nshm2022db_spark.extensions.multimodal import (
            decode_tiff, encode_tiff,
        )

        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (13, 21, 3), dtype=np.uint8)
        blob = encode_tiff(img, compression=5, predictor=True)
        assert np.array_equal(decode_tiff(blob), img)
        # smooth gradients are where the predictor actually shrinks
        # the stream — verify it still round-trips there too
        xx, yy = np.meshgrid(np.arange(40), np.arange(30))
        smooth = ((xx + yy) % 256).astype(np.uint8)
        blob = encode_tiff(smooth, compression=5, predictor=True)
        assert np.array_equal(decode_tiff(blob), smooth)

    def test_palette_colormap_16bit(self):
        from nshm2022db_spark.extensions.multimodal import (
            decode_tiff, encode_tiff,
        )

        rng = np.random.default_rng(7)
        pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        idx = rng.integers(0, 16, (11, 6), dtype=np.uint8)
        for be in (False, True):
            out = decode_tiff(
                encode_tiff(idx, compression=5, palette=pal, big_endian=be)
            )
            assert np.array_equal(out, pal[idx]), be

    def test_multi_strip_layout(self):
        from nshm2022db_spark.extensions.multimodal import (
            decode_tiff, encode_tiff,
        )

        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (23, 9), dtype=np.uint8)
        # rows_per_strip 4 -> 6 strips incl. a short last one
        blob = encode_tiff(img, compression=32773, rows_per_strip=4)
        assert np.array_equal(decode_tiff(blob), img)

    def test_rejects_malformed(self):
        from nshm2022db_spark.extensions.multimodal import (
            decode_tiff, encode_tiff,
        )

        with pytest.raises(ValueError, match="not a TIFF"):
            decode_tiff(b"GIF89a" + bytes(16))
        blob = bytearray(encode_tiff(np.zeros((4, 4), np.uint8)))
        struct.pack_into("<H", blob, 2, 43)  # BigTIFF magic
        with pytest.raises(ValueError, match="magic"):
            decode_tiff(bytes(blob))
        blob = encode_tiff(np.zeros((8, 8), np.uint8), compression=5)
        with pytest.raises(ValueError):
            decode_tiff(blob[: len(blob) - 6])  # truncated strip

    def test_decode_image_real_reports_tiff(self):
        from nshm2022db_spark.extensions.multimodal import encode_tiff

        img = np.arange(48, dtype=np.uint8).reshape(6, 8)
        for be in (False, True):
            w, h, fmt = decode_image_real(encode_tiff(img, big_endian=be))
            assert (w, h, fmt) == (8, 6, "TIFF")


class TestGIFTIFFReviewFindings:
    """Second review sweep over the GIF/TIFF legs: missing-tag
    KeyErrors, the per-frame GIF dimension bomb, silent sub-rectangle
    mis-decodes, SHORT-typed inline strip arrays, and the empty-encode
    guard."""

    def test_tiff_missing_required_tags_valueerror(self):
        from nshm2022db_spark.extensions.multimodal import decode_tiff

        blob = b"II*\x00\x08\x00\x00\x00\x00\x00"  # empty IFD
        with pytest.raises(ValueError, match="required tag"):
            decode_tiff(blob)
        with pytest.raises((ValueError, NotImplementedError)):
            decode_image_real(blob)  # falls through, never KeyError

    def test_gif_frame_dims_bomb_rejected(self):
        from nshm2022db_spark.extensions.multimodal import (
            decode_gif, encode_gif,
        )

        pal = np.zeros((4, 3), np.uint8)
        g = bytearray(encode_gif(np.zeros((4, 4), np.uint8), pal))
        i = bytes(g).find(b",")
        struct.pack_into("<HH", g, i + 5, 65535, 65535)
        with pytest.raises(ValueError, match="implausible GIF frame"):
            decode_gif(bytes(g))

    def test_gif_frame_rect_exceeding_screen_raises(self):
        """r13 (compositing landed): an out-of-bounds frame rectangle
        must raise, never write past the canvas."""
        from nshm2022db_spark.extensions.multimodal import (
            decode_gif, encode_gif,
        )

        pal = np.zeros((4, 3), np.uint8)
        g = bytearray(encode_gif(np.zeros((6, 6), np.uint8), pal))
        i = bytes(g).find(b",")
        struct.pack_into("<HH", g, i + 1, 3, 3)  # 6x6 frame at (3,3)
        with pytest.raises(ValueError, match="exceeds the screen"):
            decode_gif(bytes(g))

    def test_tiff_short_typed_inline_strip_arrays(self):
        """TIFF 6.0 allows SHORT for StripOffsets/ByteCounts; with two
        strips the pair fits INLINE in the value field — legal output
        of older writers that the typed arr() must parse."""
        from nshm2022db_spark.extensions.multimodal import (
            decode_tiff, encode_tiff,
        )

        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        blob = bytearray(encode_tiff(img, rows_per_strip=4))
        (nent,) = struct.unpack_from("<H", blob, 8)
        for j in range(nent):
            off = 10 + 12 * j
            tag, typ, count, raw = struct.unpack_from("<HHI4s", blob, off)
            if tag in (273, 279):
                (aoff,) = struct.unpack("<I", raw)
                v1, v2 = struct.unpack_from("<2I", blob, aoff)
                struct.pack_into("<HHIHH", blob, off, tag, 3, 2, v1, v2)
        assert np.array_equal(decode_tiff(bytes(blob)), img)

    def test_encode_tiff_empty_rejected(self):
        from nshm2022db_spark.extensions.multimodal import encode_tiff

        with pytest.raises(ValueError, match="non-empty"):
            encode_tiff(np.zeros((0, 5), np.uint8))


class TestR13AdviceHardening:
    """ADVICE r12: (1) cumulative decoded-size budgets for multi-frame
    containers, (2) T.81 fill bytes before JPEG markers, (3) explicit
    RLE-BMP comp/bpp pairing."""

    def test_gif_cumulative_budget_trips(self, monkeypatch):
        from nshm2022db_spark.extensions import multimodal as mm

        rng = np.random.default_rng(3)
        pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
        fr = [rng.integers(0, 4, (20, 20), dtype=np.uint8)
              for _ in range(3)]
        blob = mm.encode_gif(fr, pal)
        frames, _ = mm.decode_gif(blob)  # fine at the real budget
        assert len(frames) == 3
        # 2 frames fit (2*1200 bytes), the third trips the cumulative cap
        monkeypatch.setattr(mm, "_DECODE_TOTAL_BUDGET", 2 * 20 * 20 * 3)
        with pytest.raises(ValueError, match="total decoded size"):
            mm.decode_gif(blob)

    def test_avi_cumulative_budget_trips(self, monkeypatch):
        from nshm2022db_spark.extensions import multimodal as mm

        frames = mm._video_frames(1)  # 3 gray frames
        blob = mm.encode_avi_mjpeg(frames, fps=10)
        fps, out = mm.decode_avi_mjpeg(blob)
        assert len(out) == len(frames)
        monkeypatch.setattr(
            mm, "_DECODE_TOTAL_BUDGET", sum(f.nbytes for f in frames[:-1])
        )
        with pytest.raises(ValueError, match="total decoded size"):
            mm.decode_avi_mjpeg(blob)

    def test_jpeg_fill_bytes_before_markers(self):
        """T.81 B.1.1.2: runs of 0xFF fill bytes may precede any
        marker — a conforming third-party file must decode, including
        fill bytes ahead of EOI after the entropy-coded scan."""
        from nshm2022db_spark.extensions.multimodal import (
            decode_jpeg, encode_jpeg,
        )

        img = _jpeg_pixels(7)
        blob = encode_jpeg(img)
        ref = decode_jpeg(blob)
        assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
        # fill bytes after SOI (before the first table marker) and
        # before EOI
        padded = (
            blob[:2] + b"\xff" * 5 + blob[2:-2] + b"\xff" * 3 + blob[-2:]
        )
        out = decode_jpeg(padded)
        assert np.array_equal(out, ref)

    def test_rle4_wrong_bpp_rejected_upfront(self):
        from nshm2022db_spark.extensions.multimodal import (
            _bmp_assemble, decode_bmp,
        )

        pal = np.zeros((16, 3), np.uint8)
        # comp=2 (RLE4) with bpp=1: must fail the pairing check, not
        # wander into the nibble decoder
        blob = bytearray(_bmp_assemble(4, 3, 1, 2, b"\x00\x01", pal))
        with pytest.raises(ValueError, match="bpp/compression mismatch"):
            decode_bmp(bytes(blob))


class TestGIFCompositing:
    """r13: the last native-GIF boundary erased — sub-rectangle frame
    deltas composite onto the logical screen with transparency and the
    GCE disposal methods; every emitted frame is the full composited
    canvas (what a viewer shows)."""

    @staticmethod
    def _codec():
        from nshm2022db_spark.extensions.multimodal import (
            decode_gif, encode_gif,
        )

        return decode_gif, encode_gif

    def test_subrect_delta_composites_onto_canvas(self):
        decode_gif, encode_gif = self._codec()
        rng = np.random.default_rng(1)
        pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
        base = rng.integers(0, 8, (10, 12), dtype=np.uint8)
        delta = rng.integers(0, 8, (4, 5), dtype=np.uint8)
        blob = encode_gif(
            [base, delta], pal, boxes=[(0, 0), (3, 2)]
        )
        frames, _ = decode_gif(blob)
        assert len(frames) == 2
        assert np.array_equal(frames[0], pal[base])
        want = pal[base].copy()
        want[2:6, 3:8] = pal[delta]
        assert np.array_equal(frames[1], want)

    def test_transparent_index_shows_canvas_through(self):
        decode_gif, encode_gif = self._codec()
        pal = np.array(
            [[10, 10, 10], [200, 0, 0], [0, 200, 0], [9, 9, 9]], np.uint8
        )
        base = np.full((6, 6), 1, np.uint8)
        delta = np.array([[2, 3], [3, 2]], np.uint8)  # 3 = transparent
        blob = encode_gif(
            [base, delta], pal, boxes=[(0, 0), (2, 2)], transparent=3
        )
        frames, _ = decode_gif(blob)
        want = pal[base].copy()
        want[2, 2] = pal[2]
        want[3, 3] = pal[2]  # transparent cells keep the base color
        assert np.array_equal(frames[1], want)

    def test_disposal_background_and_previous(self):
        decode_gif, encode_gif = self._codec()
        pal = np.array(
            [[5, 6, 7], [200, 0, 0], [0, 200, 0], [0, 0, 200]], np.uint8
        )
        base = np.full((5, 5), 1, np.uint8)
        d2 = np.full((2, 2), 2, np.uint8)  # disposal 2: then background
        d3 = np.full((2, 2), 3, np.uint8)  # disposal 3: then previous
        blob = encode_gif(
            [base, d2, d3, d3], pal,
            boxes=[(0, 0), (1, 1), (3, 3), (0, 0)],
            disposals=[0, 2, 3, 0],
        )
        frames, _ = decode_gif(blob)
        # frame 1: d2 painted over base
        want1 = pal[base].copy()
        want1[1:3, 1:3] = pal[2]
        assert np.array_equal(frames[1], want1)
        # frame 2: d2's rect restored to BACKGROUND (palette[0] — the
        # screen descriptor's background index), d3 painted at (3,3)
        want2 = pal[base].copy()
        want2[1:3, 1:3] = pal[0]
        want2[3:5, 3:5] = pal[3]
        assert np.array_equal(frames[2], want2)
        # frame 3: d3's rect RESTORED TO PREVIOUS (base showing again
        # under it), the final delta painted at (0,0)
        want3 = pal[base].copy()
        want3[1:3, 1:3] = pal[0]
        want3[0:2, 0:2] = pal[3]
        assert np.array_equal(frames[3], want3)

    def test_full_frame_files_unchanged(self):
        """The pre-r13 full-frame path must be byte-compatible: no
        boxes → identical output to before the compositor landed."""
        decode_gif, encode_gif = self._codec()
        rng = np.random.default_rng(9)
        pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        fr = [rng.integers(0, 16, (9, 7), dtype=np.uint8) for _ in range(3)]
        frames, delay = decode_gif(encode_gif(fr, pal, delay_cs=6))
        assert len(frames) == 3 and delay == 6
        for a, b in zip(fr, frames):
            assert np.array_equal(b, pal[a])


class TestR13ReviewFindings:
    def test_gif_budget_charges_emitted_canvas_not_delta(self, monkeypatch):
        """r13 review #1: the cumulative budget must count the FULL
        composited canvas each frame emits (h*w*3), not the delta
        rectangle — a huge-screen GIF with hundreds of 1x1 deltas
        allocates canvases, not deltas."""
        from nshm2022db_spark.extensions import multimodal as mm

        pal = np.zeros((4, 3), np.uint8)
        base = np.zeros((20, 20), np.uint8)
        deltas = [np.zeros((1, 1), np.uint8) for _ in range(4)]
        blob = mm.encode_gif(
            [base] + deltas, pal, boxes=[(0, 0)] + [(1, 1)] * 4
        )
        frames, _ = mm.decode_gif(blob)
        assert len(frames) == 5
        # 3 canvases fit; the 4th trips even though its DELTA is 3 bytes
        monkeypatch.setattr(mm, "_DECODE_TOTAL_BUDGET", 3 * 20 * 20 * 3)
        with pytest.raises(ValueError, match="total decoded size"):
            mm.decode_gif(blob)
