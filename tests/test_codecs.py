"""Pure-NumPy BMP/WAV codec contracts (extensions/multimodal.py): real
byte-level round trips, padding/row-order handling, and rejection of
formats the parsers don't claim to support."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from nshm2022db_spark.extensions.multimodal import (
    _bmp_pixels,
    _wav_samples,
    decode_bmp,
    decode_image_real,
    decode_wav,
    encode_bmp,
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

    def test_rejects_non_bmp_and_compressed(self):
        with pytest.raises(ValueError, match="not a BMP"):
            decode_bmp(b"PNG?" + bytes(64))
        data = bytearray(encode_bmp(_bmp_pixels(1)))
        struct.pack_into("<H", data, 28, 8)  # bpp=8
        with pytest.raises(ValueError, match="24-bit"):
            decode_bmp(bytes(data))

    def test_decode_image_real_handles_bmp_stubs_rest(self):
        img = _bmp_pixels(3)
        w, h, fmt = decode_image_real(encode_bmp(img))
        assert (w, h, fmt) == (img.shape[1], img.shape[0], "BMP")
        with pytest.raises(NotImplementedError):
            decode_image_real(b"\x89PNG\r\n\x1a\n" + bytes(32))


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
