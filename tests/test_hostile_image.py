"""Pin the hostile-image invariants the probe established
(tools/hostile_image_probe.py): malformed or sub-grid payloads must
degrade to the error column — never fail the task — while valid rows
sitting next to them still hash and pair exactly.

The probe sweeps 14 hostile container classes plus a 30x-duplicated
corpus; these tests pin the two load-bearing branches cheaply so a
regression fails in plain pytest without running the probe."""

from __future__ import annotations

import pytest

from psx_data_pipeline_spark.operators.multimodal import (
    encode_bmp_px,
    encode_ppm_px,
    pattern_params,
    perceptual_hash,
    phash_near_pairs,
)


def _pattern_payload(i: int) -> bytes:
    w, h, ax, ay, bx, ph = pattern_params(i)
    px = bytearray()
    for y in range(h):
        for x in range(w):
            v = (ax * x * x + ay * y * y + bx * x + ph) % 256
            px.extend((v, v, v))
    return (
        encode_bmp_px(w, h, bytes(px)) if i % 2 == 0
        else encode_ppm_px(w, h, bytes(px))
    )


@pytest.fixture(scope="module")
def mixed_hashes(spark):
    """Fixture group 0 (ids 0-3: 0/1 near-dup, 2/3 far) + four
    hostile rows: NULL, truncated BMP, 8x7 sub-grid BMP, garbage."""
    rows = [(i, bytearray(_pattern_payload(i))) for i in range(4)] + [
        (9000, None),
        (9001, bytearray(_pattern_payload(0)[:40])),
        (9002, bytearray(encode_bmp_px(8, 7, bytes(8 * 7 * 3)))),
        (9003, bytearray(b"GIF89a" + b"\x00" * 64)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashed = perceptual_hash(df)
    return hashed, {r["doc_id"]: r for r in hashed.collect()}


def test_error_branch_degrades_not_crashes(mixed_hashes):
    """Every hostile payload — including the 8x7 image whose decode
    SUCCEEDS but whose dimensions are below the 9x8 dHash grid
    (ValueError raised inside the seam) — lands in the error column
    with null bands; the collect above proves the job completed."""
    _hashed, rows = mixed_hashes
    expected_err = {
        9000: "null payload",
        9001: "truncated BMP header",
        9002: "smaller than the dhash sample grid",
        9003: "unsupported image container",
    }
    for doc_id, frag in expected_err.items():
        r = rows[doc_id]
        assert r["error"] is not None and frag in r["error"], (
            doc_id, r["error"])
        assert all(r[k] is None for k in ("b0", "b1", "b2", "b3"))


def test_value_branch_unaffected_by_hostile_neighbors(mixed_hashes):
    """Valid rows in the same Arrow batches as hostile ones hash
    (null error, all four bands present) and pair exactly: the
    fixture geometry makes 0/1 the only Hamming<=3 pair in group 0."""
    hashed, rows = mixed_hashes
    for doc_id in range(4):
        r = rows[doc_id]
        assert r["error"] is None
        assert all(r[k] is not None for k in ("b0", "b1", "b2", "b3"))
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_pairs(hashed).collect()
    }
    assert set(pairs) == {(0, 1)}
    assert 0 < pairs[(0, 1)] <= 3
