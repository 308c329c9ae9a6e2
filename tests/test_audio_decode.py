"""decode_real's audio leg is a real RIFF/WAVE 16-bit PCM decoder —
these tests pin what the closed-form square-wave oracle query cannot
see: arbitrary (non-square-wave) samples, chunk walking past extra
chunks, odd-size chunk padding, and malformed-container errors."""

from __future__ import annotations

import math
import struct

import pytest

from psx_data_pipeline_spark.operators.multimodal import (
    decode_real,
    encode_wav,
)


def test_roundtrip_arbitrary_samples():
    s = [0, 100, -200, 300, -400, 32767, -32768, 5]
    d = decode_real(encode_wav(44100, s), "audio")
    assert d["sample_rate"] == 44100
    assert d["n_samples"] == len(s)
    assert d["duration_ms"] == len(s) * 1000 // 44100
    assert d["rms"] == pytest.approx(
        math.sqrt(sum(x * x for x in s) / len(s))
    )
    # signbit changes; 0 counts as positive:
    # [+,+,-,+,-,+,-,+] → 6 crossings
    assert d["zero_crossings"] == 6


def test_zero_counts_as_positive_for_crossings():
    # [-,0,-] : two crossings (-→0 and 0→-); [+,0,+] : zero crossings
    assert decode_real(encode_wav(8000, [-5, 0, -5]), "audio")[
        "zero_crossings"] == 2
    assert decode_real(encode_wav(8000, [5, 0, 5]), "audio")[
        "zero_crossings"] == 0


def test_extra_chunk_before_data_is_walked_over():
    wav = encode_wav(8000, [7, -7, 7])
    # splice a LIST chunk between fmt and data
    fmt_end = wav.index(b"data")
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = wav[:fmt_end] + extra + wav[fmt_end:]
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    d = decode_real(spliced, "audio")
    assert d["n_samples"] == 3
    assert d["zero_crossings"] == 2


def test_odd_size_chunk_is_padded():
    # an odd-length junk chunk must advance by size+1 (2-byte align)
    wav = encode_wav(8000, [1, 2])
    junk = b"junk" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = wav[:12] + junk + wav[12:]
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    assert decode_real(spliced, "audio")["n_samples"] == 2


def test_empty_clip():
    d = decode_real(encode_wav(8000, []), "audio")
    assert d["n_samples"] == 0
    assert d["rms"] == 0.0
    assert d["zero_crossings"] == 0
    assert d["duration_ms"] == 0


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"RIFF\x00\x00\x00\x00AIFF",  # wrong form type
        b"OggS" + b"\x00" * 40,  # not RIFF
    ],
)
def test_not_a_wav_raises(payload):
    with pytest.raises(ValueError):
        decode_real(payload, "audio")


def test_truncated_data_chunk_raises():
    wav = encode_wav(8000, [1, 2, 3, 4])
    with pytest.raises(ValueError, match="truncated|missing"):
        decode_real(wav[:-3], "audio")


def test_short_fmt_chunk_raises_valueerror_not_struct_error():
    # a 14-byte fmt chunk passes the chunk walk but must fail at the
    # ValueError seam, not escape as struct.error
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)[:14]
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(ValueError, match="truncated fmt"):
        decode_real(wav, "audio")


def test_stereo_rejected():
    wav = bytearray(encode_wav(8000, [1, 2]))
    fmt_off = wav.index(b"fmt ") + 8
    struct.pack_into("<H", wav, fmt_off + 2, 2)  # channels = 2
    with pytest.raises(ValueError, match="mono"):
        decode_real(bytes(wav), "audio")


def test_video_still_raises():
    with pytest.raises(ValueError, match="video"):
        decode_real(b"\x00\x01", "video")
