"""Perceptual image hashing (dHash) + near-dup pairs — pins the parts
the closed-form oracle query cannot see: container round-trip of
NON-uniform pixels (BMP bottom-up reassembly + stride padding vs raw
PPM), channel-order independence of the grayscale, error containment
at the hash seam, the pigeonhole blocking's losslessness vs a
brute-force all-pairs scan, and the fixture's near-dup geometry.
"""

from __future__ import annotations

import numpy as np
import pytest

from psx_data_pipeline_spark.operators.multimodal import (
    _bmp_pixels,
    _netpbm_pixels,
    _phash_real,
    dhash_bands,
    encode_bmp_px,
    encode_ppm_px,
    pattern_params,
    perceptual_hash,
    phash_near_pairs,
    synth_patterned_images,
)


def _pattern_px(i: int) -> tuple[int, int, bytes]:
    w, h, ax, ay, bx, ph = pattern_params(i)
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    v = (ax * x * x + ay * y * y + bx * x + ph) % 256
    return w, h, np.repeat(v.astype(np.uint8), 3).tobytes()


def _bands(i: int) -> list[int]:
    w, h, px = _pattern_px(i)
    return dhash_bands(w, h, 3, px)


def _hamming(a: list[int], b: list[int]) -> int:
    return sum(bin(x ^ y).count("1") for x, y in zip(a, b))


def test_bmp_ppm_containers_hash_identically():
    """The SAME pixels through both containers (BMP's bottom-up
    stride-padded storage vs PPM's raw top-down bytes) must produce
    the same hash — the near-dup fixture pairs cross formats."""
    for i in (0, 7, 42, 123):
        w, h, px = _pattern_px(i)
        via_bmp = dhash_bands(*_bmp_pixels(encode_bmp_px(w, h, px)))
        via_ppm = dhash_bands(*_netpbm_pixels(encode_ppm_px(w, h, px)))
        assert via_bmp == via_ppm == _bands(i)


def test_bmp_px_roundtrip_nonuniform():
    """encode_bmp_px stores bottom-up with padding; _bmp_pixels must
    reassemble the exact top-down bytes (w=13 forces 3 pad bytes)."""
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=13 * 9 * 3, dtype=np.uint8).tobytes()
    assert _bmp_pixels(encode_bmp_px(13, 9, px)) == (13, 9, 3, px)


def test_grayscale_is_channel_order_independent():
    """Integer channel mean: permuting stored channel order (BGR vs
    RGB) must not change the hash."""
    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, size=(9, 12, 3), dtype=np.uint8)
    swapped = a[:, :, ::-1].copy()
    assert dhash_bands(12, 9, 3, a.tobytes()) == dhash_bands(
        12, 9, 3, swapped.tobytes()
    )


def test_dhash_rejects_subgrid_images():
    with pytest.raises(ValueError, match="dhash sample grid"):
        dhash_bands(8, 8, 3, bytes(8 * 8 * 3))
    with pytest.raises(ValueError, match="dhash sample grid"):
        dhash_bands(9, 7, 3, bytes(9 * 7 * 3))


def test_phash_real_contains_bad_containers():
    with pytest.raises(ValueError, match="unsupported image container"):
        _phash_real(b"\x89PNG....", "image")
    with pytest.raises(ValueError):
        _phash_real(encode_bmp_px(12, 10, bytes(12 * 10 * 3))[:40], "image")


def test_bands_are_16bit():
    for i in range(64):
        assert all(0 <= b < 1 << 16 for b in _bands(i))


def test_fixture_near_dup_geometry():
    """Group members 0/1 (phase +1) are near; member 2 (quadratic
    coefficient bump) is far from member 0 for most groups — checked
    in aggregate so one wrap-heavy group can't flake the suite."""
    near = [_hamming(_bands(4 * g), _bands(4 * g + 1)) for g in range(60)]
    far = [_hamming(_bands(4 * g), _bands(4 * g + 2)) for g in range(60)]
    assert max(near) <= 3 or sum(d <= 3 for d in near) >= 50
    assert sum(d > 3 for d in far) >= 50


def test_pigeonhole_blocking_is_lossless_vs_brute_force(spark):
    """Every Hamming ≤ 3 pair found by the all-pairs scan must come
    out of the band equi-join — the 4-band pigeonhole is exact, not
    approximate (4 bands > max_hamming 3)."""
    n = 200
    hashes = [_bands(i) for i in range(n)]
    brute = {
        (a, b, _hamming(hashes[a], hashes[b]))
        for a in range(n) for b in range(a + 1, n)
        if _hamming(hashes[a], hashes[b]) <= 3
    }
    docs = spark.range(n).withColumnRenamed("id", "doc_id")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in phash_near_pairs(
            perceptual_hash(synth_patterned_images(docs))
        ).collect()
    }
    assert got == brute


def test_exact_dup_collapse_expands_intra_pairs(spark):
    """Identical images under distinct ids (id i and 1000+i share
    pattern params) ⇒ the collapse must emit every intra-group pair
    with hamming 0 and still expand the cross pairs — the
    duplication-factor guard all near-dup ops share."""
    import pandas as pd

    rows = []
    for i in list(range(8)) + [1000 + i for i in range(8)]:
        w, h, px = _pattern_px(i % 1000)
        payload = (
            encode_bmp_px(w, h, px) if (i % 1000) % 2 == 0
            else encode_ppm_px(w, h, px)
        )
        rows.append((i, bytearray(payload)))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "payload"]),
        "doc_id long, payload binary",
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_near_pairs(perceptual_hash(df)).collect()
    }
    for i in range(8):
        assert got[(i, 1000 + i)] == 0  # exact dup pair, intra-group
    # the fixture's group-0 near pair (0,1) must survive collapse and
    # appear for all four id combinations
    d01 = _hamming(_bands(0), _bands(1))
    if d01 <= 3:
        for pair in [(0, 1), (0, 1001), (1, 1000), (1000, 1001)]:
            assert got[pair] == d01


def test_pigeonhole_property_random_hashes():
    """Property (pure Python, no Spark): for ANY pair of 64-bit
    hashes with Hamming distance ≤ 3, at least one of the four 16-bit
    bands is identical — the guarantee the candidate equi-join's
    losslessness rests on. Checked exhaustively-ish over random
    hashes plus adversarial minimal-distance constructions."""
    import random

    rng = random.Random(9)
    for _ in range(2000):
        base = [rng.getrandbits(16) for _ in range(4)]
        other = list(base)
        # flip 0-3 random bit positions across the 64-bit space
        for j in rng.sample(range(64), rng.randint(0, 3)):
            other[j // 16] ^= 1 << (j % 16)
        d = sum(bin(a ^ b).count("1") for a, b in zip(base, other))
        assert d <= 3
        assert any(a == b for a, b in zip(base, other))
    # adversarial: exactly 4 flips, one per band, shares NO band —
    # the distance-4 case the threshold-3 filter correctly excludes
    base = [0, 0, 0, 0]
    other = [1, 1, 1, 1]
    assert not any(a == b for a, b in zip(base, other))
