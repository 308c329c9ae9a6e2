"""Multimodal plumbing tests — the oracle gate covers feature/frame
values; this covers the codec seam and the Spark-side schemas."""

from __future__ import annotations

import pytest

from psx_data_pipeline_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    FRAME_SCHEMA,
    attach_payload,
    decode_real,
    extract_features,
    sample_frames,
)


def test_decode_seam_rejects_compressed_containers():
    # the real-decoder seam: PNG is compressed, no codec here — the
    # full decode surface is pinned in tests/test_image_decode.py
    with pytest.raises(ValueError, match="unsupported image container"):
        decode_real(b"\x89PNG", "image")


def test_schemas_and_payload_typing(spark):
    df = spark.createDataFrame(
        [(0, "alpha " * 100), (1, "beta " * 100), (2, "gamma " * 600)],
        "doc_id LONG, text STRING",
    )
    mm = attach_payload(df)
    assert dict(mm.dtypes)["payload"] == "binary"
    feats = extract_features(mm)
    assert feats.schema == FEATURE_SCHEMA
    rows = {r["doc_id"]: r for r in feats.collect()}
    assert rows[0]["width"] is not None and rows[0]["duration_ms"] is None
    assert rows[1]["duration_ms"] is not None and rows[1]["n_frames"] is None
    assert rows[2]["n_frames"] == (600 * 6) // 256

    frames = sample_frames(mm)
    assert frames.schema == FRAME_SCHEMA
    got = frames.collect()
    assert {r["doc_id"] for r in got} == {2}  # only the video row fans out
    assert sorted(r["frame_idx"] for r in got) == [0, 10]
