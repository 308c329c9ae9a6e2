"""decode_real is a real decoder for uncompressed 24bpp BMP and binary
netpbm (P6/P5) — these tests pin the parts the uniform-fill oracle
query cannot see: non-uniform pixels, bottom-up row reassembly, row
padding, top-down BMPs, header comments, and truncation errors."""

from __future__ import annotations

import hashlib
import struct

import pytest

from psx_data_pipeline_spark.operators.multimodal import (
    decode_real,
    encode_bmp,
    encode_ppm,
)


def _bmp(width, height, pixel_rows, top_down=False):
    """Hand-rolled BMP from explicit per-row BGR bytes (rows given
    top-down; storage order follows the BMP convention)."""
    row = width * 3
    stride = (row + 3) & ~3
    h_field = -height if top_down else height
    header = struct.pack("<2sIHHI", b"BM", 54 + stride * height, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, h_field, 1, 24, 0, stride * height,
        2835, 2835, 0, 0,
    )
    stored = pixel_rows if top_down else list(reversed(pixel_rows))
    body = b"".join(r + b"\x00" * (stride - row) for r in stored)
    return header + info + body


def test_bmp_bottom_up_reassembles_top_down():
    rows = [b"\x01\x02\x03" * 3, b"\x04\x05\x06" * 3]  # 3x2, distinct rows
    d = decode_real(_bmp(3, 2, rows), "image")
    assert (d["format"], d["width"], d["height"], d["channels"]) == (
        "bmp", 3, 2, 3)
    assert d["pixel_digest"] == hashlib.md5(b"".join(rows)).hexdigest()


def test_bmp_top_down_negative_height():
    rows = [b"\x09\x08\x07" * 5, b"\x01\x01\x01" * 5, b"\x02\x03\x04" * 5]
    d = decode_real(_bmp(5, 3, rows, top_down=True), "image")
    assert (d["width"], d["height"]) == (5, 3)
    assert d["pixel_digest"] == hashlib.md5(b"".join(rows)).hexdigest()


def test_bmp_padding_is_stripped():
    # width 3 → 9-byte rows padded to 12; digest must ignore padding
    rows = [bytes(range(9)), bytes(range(9, 18))]
    d = decode_real(_bmp(3, 2, rows), "image")
    assert d["pixel_digest"] == hashlib.md5(b"".join(rows)).hexdigest()


def test_ppm_roundtrip_and_header_comment():
    px = bytes(range(2 * 2 * 3))
    payload = b"P6\n# a comment\n2 2\n255\n" + px
    d = decode_real(payload, "image")
    assert (d["format"], d["width"], d["height"], d["channels"]) == (
        "ppm", 2, 2, 3)
    assert d["pixel_digest"] == hashlib.md5(px).hexdigest()


def test_pgm_single_channel():
    px = bytes([7, 8, 9, 10, 11, 12])
    d = decode_real(b"P5\n3 2\n255\n" + px, "image")
    assert (d["format"], d["channels"]) == ("pgm", 1)
    assert d["pixel_digest"] == hashlib.md5(px).hexdigest()


def test_encoders_match_oracle_formula():
    # uniform fill ⇒ digest == md5(fill byte repeated w*h*3), the
    # exact formula the image_decode oracle SQL states
    for enc, i in ((encode_bmp, 10), (encode_ppm, 11)):
        w, h, fill = 4 + i % 13, 3 + i % 7, 65 + i % 26
        d = decode_real(enc(w, h, fill), "image")
        assert d["pixel_digest"] == hashlib.md5(
            bytes([fill]) * (w * h * 3)).hexdigest()
        assert (d["width"], d["height"], d["channels"]) == (w, h, 3)


@pytest.mark.parametrize("payload,err", [
    (b"BM" + b"\x00" * 10, "truncated BMP header"),
    (b"P6\n2 2\n255\n" + b"\x00" * 5, "truncated netpbm pixel data"),
    (b"P6\n2", "truncated netpbm header"),
    (b"\x89PNG\r\n", "unsupported image container"),
    (b"P6\n2 2\n65535\n" + b"\x00" * 24, "16-bit netpbm unsupported"),
])
def test_malformed_payloads_raise(payload, err):
    with pytest.raises(ValueError, match=err):
        decode_real(payload, "image")


def test_bmp_truncated_pixels_and_wrong_bpp():
    good = _bmp(3, 2, [b"\x00" * 9, b"\x01" * 9])
    with pytest.raises(ValueError, match="truncated BMP pixel data"):
        decode_real(good[:-4], "image")
    bad_bpp = bytearray(good)
    struct.pack_into("<H", bad_bpp, 28, 8)
    with pytest.raises(ValueError, match="24bpp"):
        decode_real(bytes(bad_bpp), "image")


def test_unsupported_modalities_stay_at_the_seam():
    # video has no dependency-free container: still a raise-only seam
    with pytest.raises(ValueError, match="codec"):
        decode_real(b"anything", "video")
    # audio decodes WAV now; non-WAV audio bytes still raise there
    with pytest.raises(ValueError, match="RIFF"):
        decode_real(b"anything", "audio")
