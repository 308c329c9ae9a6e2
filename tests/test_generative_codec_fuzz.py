"""Generative fuzz of the codec seam: hypothesis builds HOSTILE
binary payloads — raw garbage, well-formed containers mutated by
truncation / byte flips, and containers with deliberately lying
headers (negative or zero dims, wrong bpp, compression flags, 16-bit
maxval, RIFF chunk-size lies, size-field overflow) — and pins the
X2 per-row containment contract on all three decoders (BMP/netpbm
via decode_images, RIFF/WAVE via decode_audio):

- the Spark job NEVER crashes: one hostile blob costs one row;
- exactly one of (decoded metadata, error) is populated per row;
- the worker-side result equals a driver-side reference call of the
  same contained decoder — the differential check that Arrow/pandas
  nullable-dtype plumbing loses nothing.

The reference behavior being generalized is the per-row try/except
around company-detail parsing
(/root/reference/psx_data_automation/scrape_tickers.py:337-345).
"""

from __future__ import annotations

import math

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from psx_data_pipeline_spark.operators.multimodal import (
    _contained,
    decode_audio,
    decode_images,
    decode_real,
    encode_bmp,
    encode_ppm,
    encode_wav,
)

# --- payload strategies ------------------------------------------------------

_N_EXAMPLES = int(os.environ.get("FUZZ_N", "4"))

_raw = st.binary(max_size=120)

# magic-prefixed garbage: reaches past the container dispatch into
# each parser's header logic
_magicked = st.tuples(
    st.sampled_from([b"BM", b"P5", b"P6", b"RIFF", b"RIFF1234WAVE"]),
    st.binary(max_size=100),
).map(lambda t: t[0] + t[1])


@st.composite
def _valid_image(draw):
    w = draw(st.integers(min_value=1, max_value=9))
    h = draw(st.integers(min_value=1, max_value=7))
    fill = draw(st.integers(min_value=0, max_value=255))
    if draw(st.booleans()):
        return encode_bmp(w, h, fill)
    return encode_ppm(w, h, fill)


@st.composite
def _valid_wav(draw):
    rate = draw(st.sampled_from([8000, 16000, 44100]))
    n = draw(st.integers(min_value=0, max_value=64))
    samples = draw(
        st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=n, max_size=n,
        )
    )
    return encode_wav(rate, samples)


@st.composite
def _mutated(draw):
    """A well-formed container, then one structured mutation."""
    p = draw(st.one_of(_valid_image(), _valid_wav()))
    kind = draw(st.sampled_from(
        ["truncate", "flip", "zero_dims", "neg_dims", "huge_field"]
    ))
    if kind == "truncate":
        cut = draw(st.integers(min_value=0, max_value=max(0, len(p) - 1)))
        return p[:cut]
    if kind == "flip":
        off = draw(st.integers(min_value=0, max_value=len(p) - 1))
        val = draw(st.integers(min_value=0, max_value=255))
        return p[:off] + bytes([val]) + p[off + 1:]
    # header-int lies: overwrite 4 bytes somewhere in the first 54
    # with zeros / sign-bit / huge values — covers zero & negative
    # dims, wrong bpp, compression flags, chunk-size lies, and
    # size-field overflow without knowing which container p is
    off = draw(st.integers(min_value=2, max_value=min(50, len(p) - 4)))
    lie = {
        "zero_dims": b"\x00\x00\x00\x00",
        "neg_dims": b"\xff\xff\xff\xff",
        "huge_field": b"\xff\xff\xff\x7f",
    }[kind]
    return p[:off] + lie + p[off + 4:]


_payload = st.one_of(_raw, _magicked, _valid_image(), _valid_wav(),
                     _mutated(), st.none())


def _norm(v):
    """Row value → python scalar (pandas NA / numpy types → None/py)."""
    if v is None:
        return None
    if isinstance(v, float):
        return v
    return v


def _check(spark, payloads, decode_op, modality, result_cols):
    rows = [(i, p) for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = decode_op(df)  # must not raise — and neither may collect()
    got = {r["doc_id"]: r for r in out.collect()}
    assert len(got) == len(payloads), "containment must cost rows, not tasks"
    for i, p in rows:
        ref, ref_err = _contained(decode_real, p, modality)
        row = got[i]
        assert _norm(row["error"]) == ref_err, (
            f"payload {p!r}: worker error {row['error']!r} "
            f"!= driver reference {ref_err!r}"
        )
        for c in result_cols:
            want, have = ref.get(c), _norm(row[c])
            if isinstance(want, float):
                assert have is not None and (
                    math.isnan(want) and math.isnan(have) or want == have
                ), f"payload {p!r} col {c}: {have!r} != {want!r}"
            else:
                assert have == want, (
                    f"payload {p!r} col {c}: {have!r} != {want!r}"
                )
        # exactly one side populated: error XOR decoded metadata
        if ref_err is None:
            assert all(_norm(row[c]) is not None for c in result_cols)
        else:
            assert all(_norm(row[c]) is None for c in result_cols)


@settings(
    max_examples=_N_EXAMPLES, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_payload, min_size=1, max_size=12))
def test_image_decode_contains_hostile_payloads(spark, payloads):
    _check(
        spark, payloads, decode_images, "image",
        ["format", "width", "height", "channels", "pixel_digest"],
    )


@settings(
    max_examples=_N_EXAMPLES, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_payload, min_size=1, max_size=12))
def test_audio_decode_contains_hostile_payloads(spark, payloads):
    _check(
        spark, payloads, decode_audio, "audio",
        ["sample_rate", "n_samples", "duration_ms", "rms",
         "zero_crossings"],
    )


def test_driver_reference_is_total():
    """The driver-side reference itself never escapes the seam on a
    curated worst-case set (fuzz examples that once found real gaps
    belong here as pins)."""
    curated = [
        b"", None, b"BM", b"BM" + b"\x00" * 52,          # short headers
        b"P6\n0 0\n255\n",                                # zero dims
        b"P6\n-3 2\n255\n" + b"\x00" * 64,                # negative dims
        b"P6\n2 2\n65535\n" + b"\x00" * 12,               # 16-bit maxval
        b"P6\n# only comments",                           # header runs out
        b"P6\n999999999 999999999\n255\n\x00",            # size overflow
        encode_bmp(2, 2, 7)[:30],                         # truncated pixels
        b"RIFF\x00\x00\x00\x00WAVE",                      # no chunks
        b"RIFF\xff\xff\xff\xffWAVEdata\xff\xff\xff\xff",  # chunk-size lie
        encode_wav(8000, [1, -1, 1])[:20],                # truncated fmt
    ]
    for p in curated:
        for modality in ("image", "audio"):
            d, err = _contained(decode_real, p, modality)
            assert (err is None) != (d == {}) or d == {}, (p, modality)
            assert err is None or isinstance(err, str)


# --- video (RIFF/AVI) --------------------------------------------------------

import hashlib

from psx_data_pipeline_spark.operators.multimodal import (
    _AVI_STRIDE,
    _decode_avi,
    decode_video_frames,
    encode_avi,
)


@st.composite
def _valid_avi(draw):
    w = draw(st.integers(min_value=1, max_value=6))
    h = draw(st.integers(min_value=1, max_value=4))
    n = draw(st.integers(min_value=0, max_value=7))
    fills = draw(st.lists(
        st.integers(min_value=0, max_value=255), min_size=n, max_size=n
    ))
    return encode_avi(w, h, fills)


@st.composite
def _mutated_avi(draw):
    p = draw(_valid_avi())
    kind = draw(st.sampled_from(["truncate", "flip", "lie"]))
    if kind == "truncate":
        cut = draw(st.integers(min_value=0, max_value=max(0, len(p) - 1)))
        return p[:cut]
    if kind == "flip":
        off = draw(st.integers(min_value=0, max_value=len(p) - 1))
        val = draw(st.integers(min_value=0, max_value=255))
        return p[:off] + bytes([val]) + p[off + 1:]
    off = draw(st.integers(min_value=2, max_value=min(60, len(p) - 4)))
    lie = draw(st.sampled_from(
        [b"\x00\x00\x00\x00", b"\xff\xff\xff\xff", b"\xff\xff\xff\x7f"]
    ))
    return p[:off] + lie + p[off + 4:]


_vid_payload = st.one_of(
    _raw,
    st.tuples(
        st.sampled_from([b"RIFF", b"RIFF\x10\x00\x00\x00AVI "]),
        st.binary(max_size=100),
    ).map(lambda t: t[0] + t[1]),
    _valid_avi(), _mutated_avi(), st.none(),
)


@settings(
    max_examples=_N_EXAMPLES, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_vid_payload, min_size=1, max_size=10))
def test_video_decode_contains_hostile_payloads(spark, payloads):
    """Per-doc containment for the multi-row demuxer: a malformed AVI
    costs exactly one error row for its doc; a well-formed one yields
    exactly the sampled-frame rows the driver-side reference
    predicts; an empty-but-valid video yields zero rows."""
    rows = [(i, p) for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got: dict[int, list] = {}
    for r in decode_video_frames(df).collect():  # must not raise
        got.setdefault(r["doc_id"], []).append(r)
    for i, p in rows:
        ref, ref_err = _contained(lambda b, _m: _decode_avi(b), p, "video")
        mine = sorted(got.get(i, []), key=lambda r: (r["frame_idx"] is None,
                                                     r["frame_idx"] or 0))
        if ref_err is not None:
            assert len(mine) == 1, (p, mine)
            assert _norm(mine[0]["error"]) == ref_err
            assert all(
                _norm(mine[0][c]) is None
                for c in ("frame_idx", "width", "height", "frame_digest")
            )
        else:
            want = [
                (k, ref["width"], ref["height"],
                 hashlib.md5(ref["frames"][k]).hexdigest())
                for k in range(0, ref["n_frames"], _AVI_STRIDE)
            ]
            have = [
                (_norm(r["frame_idx"]), _norm(r["width"]),
                 _norm(r["height"]), r["frame_digest"])
                for r in mine
            ]
            assert have == want, (p, have, want)
            assert all(_norm(r["error"]) is None for r in mine)
