"""Multimodal queries over the documents corpus — binary payloads,
typed metadata, Arrow-batched decode plumbing (operators/multimodal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from psx_data_pipeline_spark.operators.multimodal import (
    _FRAME_CHARS,
    _FRAME_STRIDE,
    attach_payload,
    decode_audio,
    decode_images,
    decode_video_frames,
    synth_video_payloads,
    extract_features,
    perceptual_hash,
    phash_near_pairs,
    sample_frames,
    synth_audio_payloads,
    synth_image_payloads,
    synth_patterned_images,
)
from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_table

_MODALITY_SQL = """
  CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio'
  WHEN doc_id % 3 IS NOT NULL THEN 'video' END
"""

MULTIMODAL_FEATURES_ORACLE = f"""
WITH m AS (
  SELECT doc_id, {_MODALITY_SQL} AS modality,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         md5(text) AS digest
  FROM documents
)
SELECT doc_id, modality, n_bytes, digest,
  CASE WHEN modality = 'image' THEN 16 + n_bytes % 640 END AS width,
  CASE WHEN modality = 'image' THEN 16 + (n_bytes // 640) % 480 END AS height,
  CASE WHEN modality = 'audio' THEN n_bytes // 16 END AS duration_ms,
  CASE WHEN modality = 'video' THEN n_bytes // 256 END AS n_frames
FROM m
"""


@query("multimodal_features", MULTIMODAL_FEATURES_ORACLE)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed metadata → per-modality features via
    Arrow-batched mapInPandas (deterministic fake decode; the codec
    seam is decode_real)."""
    docs = load_table(spark, "documents", sf_dir)
    return extract_features(attach_payload(docs))


# the filter must restate attach_payload's modality CASE verbatim —
# "neither the image nor the audio arm, id not NULL" — rather than
# `% 3 = 2`: Spark and DuckDB agree on trunc-mod, so a NEGATIVE id
# (-1 % 3 = -1) is 'video' under the CASE but was dropped by the
# equality form (round-12 ADVICE; negative ids are now a hostile-id
# fuzz axis)
FRAME_SAMPLE_ORACLE = f"""
SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
       md5(substr(text, i * {_FRAME_CHARS} + 1, {_FRAME_CHARS}))
         AS frame_digest
FROM documents,
     UNNEST(range(0, CAST(ceil(len(text) / {_FRAME_CHARS}.0) AS BIGINT),
                  {_FRAME_STRIDE})) AS t(i)
WHERE doc_id % 3 <> 0 AND doc_id % 3 <> 1
"""


@query("frame_sample", FRAME_SAMPLE_ORACLE)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided frame sampling over video payloads: 1 row in → k
    sampled frames out, digests per frame — the mapInPandas fan-out
    shape of real frame extraction."""
    docs = load_table(spark, "documents", sf_dir)
    return sample_frames(attach_payload(docs))


# The fixture payloads use a UNIFORM fill byte, so the decoder's
# canonical pixel digest (top-down, padding-stripped, stored channel
# order) collapses to md5 of the fill char repeated width*height*3
# times for both containers — which DuckDB can state directly. The
# decoder itself is exercised on real BMP/PPM bytes (header parse,
# stride/padding strip, bottom-up reassembly); non-uniform pixels are
# pinned by unit tests (tests/test_image_decode.py).
# a NULL or NEGATIVE doc_id synthesizes a NULL payload, so the decode
# emits the error branch (round-11 hostile-id probe: int(doc_id) at
# the Arrow seam used to kill the TASK instead; round-12 ADVICE:
# Python floor-mod ≠ SQL trunc-mod below zero, so the synth formulas
# are only statable for doc_id >= 0) — the oracle states the same
# row, and the derived columns must not leak through out-of-domain
# ids (`WHEN doc_id >= 0` is NULL-safe: a NULL comparison is not TRUE)
IMAGE_DECODE_ORACLE = """
SELECT doc_id,
  CASE WHEN doc_id >= 0 AND doc_id % 2 = 0 THEN 'bmp'
       WHEN doc_id >= 0 THEN 'ppm' END AS format,
  CASE WHEN doc_id >= 0
       THEN CAST(4 + doc_id % 13 AS BIGINT) END AS width,
  CASE WHEN doc_id >= 0
       THEN CAST(3 + doc_id % 7 AS BIGINT) END AS height,
  CASE WHEN doc_id >= 0 THEN CAST(3 AS BIGINT) END AS channels,
  CASE WHEN doc_id >= 0 THEN
    md5(repeat(chr(CAST(65 + doc_id % 26 AS INT)),
               CAST((4 + doc_id % 13) * (3 + doc_id % 7) * 3 AS INT)))
    END AS pixel_digest,
  CASE WHEN doc_id IS NULL OR doc_id < 0
       THEN 'ValueError: null payload' END AS error
FROM documents
"""


@query("image_decode", IMAGE_DECODE_ORACLE)
def q_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image decode end-to-end: synthesize one BMP/PPM container
    per document (opaque binary column), then decode_real parses
    headers, strips row padding, and digests the pixels — all inside
    Arrow-batched mapInPandas (operators/multimodal.decode_images).
    Malformed payloads are contained per row into the ``error``
    column (NULL on the well-formed fixtures here; pinned on
    hypothesis-mutated payloads by tests/test_generative_codec_fuzz)."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    return decode_images(synth_image_payloads(docs))


# The fixture clips are square waves (operators/multimodal.
# synth_audio_payloads): n = 400 + id%800 samples at 8 kHz, half-
# period p = 2 + id%9, amplitude a = 1000 + (id%20)*997. Every
# decoded feature then has a closed form: RMS of a ±a square wave is
# exactly a (n·a² < 2^53, so mean and sqrt are IEEE-exact), and the
# signbit flips exactly at each multiple of p → (n-1)//p crossings.
# The decoder itself walks real RIFF chunks; extra-chunk and
# non-square-wave cases are pinned by tests/test_audio_decode.py.
# doc_id >= 0 guards every derived column: the synth formulas are
# Python floor-mod, statable in trunc-mod SQL only on the nonnegative
# domain — out-of-domain ids take the NULL-payload error row, exactly
# like IMAGE_DECODE_ORACLE above
AUDIO_DECODE_ORACLE = """
SELECT doc_id,
  CASE WHEN doc_id >= 0 THEN CAST(8000 AS BIGINT) END AS sample_rate,
  CASE WHEN doc_id >= 0
       THEN CAST(400 + doc_id % 800 AS BIGINT) END AS n_samples,
  CASE WHEN doc_id >= 0
       THEN CAST((400 + doc_id % 800) // 8 AS BIGINT) END AS duration_ms,
  CASE WHEN doc_id >= 0
       THEN CAST(1000 + (doc_id % 20) * 997 AS DOUBLE) END AS rms,
  CASE WHEN doc_id >= 0
       THEN CAST((400 + doc_id % 800 - 1) // (2 + doc_id % 9) AS BIGINT)
       END AS zero_crossings,
  CASE WHEN doc_id IS NULL OR doc_id < 0
       THEN 'ValueError: null payload' END AS error
FROM documents
"""


@query("audio_decode", AUDIO_DECODE_ORACLE)
def q_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio decode end-to-end: synthesize one RIFF/WAVE 16-bit
    PCM clip per document (opaque binary column), then decode_real
    walks the chunk list and computes sample-level features (RMS,
    zero crossings) — all inside Arrow-batched mapInPandas
    (operators/multimodal.decode_audio). The audio twin of
    image_decode, closing the audio leg of the codec seam. Malformed
    payloads are contained per row into the ``error`` column (NULL on
    the well-formed fixtures here)."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    return decode_audio(synth_audio_payloads(docs))


# The patterned fixtures have a closed pixel form (operators/
# multimodal.pattern_params): P(x,y) = (ax·x² + ay·y² + bx·x + ph)
# % 256 on all three channels, so the oracle can restate the ENTIRE
# pipeline — 9×8 grid sample, dHash gradient bits, 16-bit band
# packing, pigeonhole band join, Hamming verify — as integer SQL.
# The Spark side truly decodes the BMP/PPM containers (header parse,
# bottom-up reassembly, stride strip) before hashing; container
# round-trip of non-uniform pixels is pinned by tests/test_phash.py.
# shared CTE chain: fixture params -> sampled grid -> dHash bits ->
# 16-bit bands -> per-doc band vector (hv)
_PHASH_BANDS_SQL = """q AS (
  SELECT doc_id,
         12 + (doc_id // 4) % 9 AS w,
         10 + (doc_id // 4) % 7 AS h,
         CASE doc_id % 4
           WHEN 2 THEN 8 + (doc_id // 4) % 11
           WHEN 3 THEN 3 + (doc_id // 4) % 5
           ELSE 7 + (doc_id // 4) % 11 END AS ax,
         CASE doc_id % 4
           WHEN 3 THEN 7 + (doc_id // 4) % 11
           ELSE 3 + (doc_id // 4) % 5 END AS ay,
         1 + (doc_id // 4) % 13 AS bx,
         CASE doc_id % 4
           WHEN 1 THEN ((5 * (doc_id // 4)) % 256 + 1) % 256
           WHEN 3 THEN ((5 * (doc_id // 4)) % 256 + 101) % 256
           ELSE (5 * (doc_id // 4)) % 256 END AS ph
  FROM documents
  -- out-of-domain (NULL/negative) ids synthesize NO container (the
  -- pattern params are Python floor-mod/floor-div, not statable in
  -- trunc-mod SQL below zero); their error rows never reach the
  -- band join on the engine side either (phash_near_pairs filters
  -- error IS NULL)
  WHERE doc_id >= 0
), grid AS (
  SELECT doc_id, r.r AS r, c.c AS c,
         (ax * ((c.c * w) // 9) * ((c.c * w) // 9)
          + ay * ((r.r * h) // 8) * ((r.r * h) // 8)
          + bx * ((c.c * w) // 9) + ph) % 256 AS gv
  FROM q, range(8) r(r), range(9) c(c)
), bits AS (
  SELECT a.doc_id, a.r * 8 + a.c AS j,
         CASE WHEN b.gv > a.gv THEN 1 ELSE 0 END AS bit
  FROM grid a
  JOIN grid b ON a.doc_id = b.doc_id AND a.r = b.r AND b.c = a.c + 1
  WHERE a.c < 8
), bands AS (
  SELECT doc_id, j // 16 AS band,
         CAST(SUM(bit * (1 << (j % 16))) AS BIGINT) AS bval
  FROM bits GROUP BY doc_id, j // 16
), hv AS (
  SELECT doc_id,
         MAX(CASE WHEN band = 0 THEN bval END) AS b0,
         MAX(CASE WHEN band = 1 THEN bval END) AS b1,
         MAX(CASE WHEN band = 2 THEN bval END) AS b2,
         MAX(CASE WHEN band = 3 THEN bval END) AS b3
  FROM bands GROUP BY doc_id
)"""

IMAGE_NEAR_DUP_ORACLE = f"""
WITH {_PHASH_BANDS_SQL}, cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM bands x JOIN bands y ON x.band = y.band AND x.bval = y.bval
  WHERE x.doc_id < y.doc_id
)
SELECT id_a, id_b, hamming FROM (
  SELECT c.id_a, c.id_b,
         CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
            + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
           AS BIGINT) AS hamming
  FROM cand c
  JOIN hv a ON a.doc_id = c.id_a
  JOIN hv b ON b.doc_id = c.id_b
) WHERE hamming <= 3
"""

# dedup-on-ingest: the streamed (odd-id) images probe a static index
# of the already-ingested (even-id) corpus — pairs are cross-side
# only, so the oracle's candidate join is even × odd instead of the
# batch query's triangular self-join
STREAM_IMAGE_NEAR_DUP_ORACLE = f"""
WITH {_PHASH_BANDS_SQL}, cand AS (
  SELECT DISTINCT x.doc_id AS store_id, y.doc_id AS stream_id
  FROM bands x JOIN bands y ON x.band = y.band AND x.bval = y.bval
  WHERE x.doc_id % 2 = 0 AND y.doc_id % 2 = 1
)
SELECT store_id, stream_id, hamming FROM (
  SELECT c.store_id, c.stream_id,
         CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
            + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
           AS BIGINT) AS hamming
  FROM cand c
  JOIN hv a ON a.doc_id = c.store_id
  JOIN hv b ON b.doc_id = c.stream_id
) WHERE hamming <= 3
"""


@query("image_near_dup", IMAGE_NEAR_DUP_ORACLE)
def q_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup dedup — the multimodal × dedup
    intersection: synthesize one real gradient BMP/PPM container per
    document (group members 0/1 are near-identical images in
    DIFFERENT container formats), decode + dHash inside Arrow-batched
    mapInPandas (operators/multimodal.perceptual_hash), then find
    pairs with Hamming ≤ 3 via the lossless 4-band pigeonhole
    equi-join + exact bit_count verify (phash_near_pairs — same scale
    shape as SimHash: collapse, block, verify, output-bound expand)."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    return phash_near_pairs(perceptual_hash(synth_patterned_images(docs)))


# The fixture clips (operators/multimodal.synth_video_payloads):
# w = 8+id%9, h = 4+id%5, n = 3+id%6 frames at 25 fps, frame k
# uniformly filled with byte 65+(id+k)%26 — so every SAMPLED frame
# (every 2nd, the demuxer's stride) has the closed-form digest
# md5(repeat(chr(fill), w*h*3)). The decoder itself walks real RIFF
# chunks (skipping the fixture's JUNK chunk like a real demuxer) and
# verifies frame sizes and the avih frame count; malformed payloads
# are pinned by tests/test_generative_codec_fuzz.py.
VIDEO_DECODE_ORACLE = """
WITH p AS (
  SELECT doc_id,
         8 + doc_id % 9 AS w,
         4 + doc_id % 5 AS h,
         3 + doc_id % 6 AS n
  FROM documents
  WHERE doc_id >= 0
)
SELECT doc_id,
  CAST(f.k AS BIGINT) AS frame_idx,
  CAST(w AS BIGINT) AS width,
  CAST(h AS BIGINT) AS height,
  md5(repeat(chr(CAST(65 + (doc_id + f.k) % 26 AS INT)),
             CAST(w * h * 3 AS INT))) AS frame_digest,
  CAST(NULL AS VARCHAR) AS error
FROM p, unnest(generate_series(0, CAST(n - 1 AS BIGINT), 2)) AS f(k)
UNION ALL
-- a NULL or negative doc_id has no frames to fan out (synth declines
-- out-of-domain ids — Python floor-mod params are not statable in
-- trunc-mod SQL), but the engine contains it to ONE error row rather
-- than dropping it (X2 semantics)
SELECT doc_id, NULL, NULL, NULL, NULL, 'ValueError: null payload'
FROM documents WHERE doc_id IS NULL OR doc_id < 0
"""


@query("video_decode", VIDEO_DECODE_ORACLE)
def q_video_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real video demux end-to-end, closing the third modality leg
    (image_decode / audio_decode are the siblings): synthesize one
    RIFF/AVI container with raw 24bpp frames per document, then
    _decode_avi walks the chunk lists (avih header, movi frames,
    JUNK skipped), verifies frame sizes against the header, and
    frame-samples every 2nd frame to a (doc, frame) row with an md5
    frame digest — all inside Arrow-batched mapInPandas
    (operators/multimodal.decode_video_frames). Malformed payloads
    are contained per row into the ``error`` column (NULL on the
    well-formed fixtures here)."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    return decode_video_frames(synth_video_payloads(docs))
