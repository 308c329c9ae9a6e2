"""Multimodal column plumbing: opaque binary payloads + typed
metadata, processed with Arrow-batched `mapInPandas`.

North-star operators for a training-data pipeline: image / audio /
video travel as `binary` columns with a modality tag; decode,
feature-extract, and frame-sample run as vectorized Python over
Arrow batches (the only layer where Python is acceptable — columnar
transfer, no per-row pickling). The actual media decoding is STUBBED
(this container ships no image/audio codecs): `decode_real` raises
NotImplementedError by design, and `extract_features` /
`sample_frames` compute deterministic fakes derived from the payload
bytes — the Spark-side schema, partitioning, UDF signatures, and
batch shapes are the real thing and are what these operators test.

Scale notes: both operators are narrow (no shuffle) — they stream
Arrow batches through Python workers partition-by-partition, so
throughput scales with executors × `spark.sql.execution.arrow
.maxRecordsPerBatch`. Payload bytes never hit the driver.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pandas only inside workers at runtime
    import pandas as pd

MODALITIES = ("image", "audio", "video")

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), True),
    T.StructField("modality", T.StringType(), True),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("digest", T.StringType(), True),
    T.StructField("width", T.LongType(), True),
    T.StructField("height", T.LongType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("n_frames", T.LongType(), True),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), True),
    T.StructField("frame_idx", T.LongType(), True),
    T.StructField("frame_digest", T.StringType(), True),
])

_FRAME_CHARS = 256  # fake frame = 256-char slice of the payload
_FRAME_STRIDE = 10  # keep every 10th frame


def decode_real(payload: bytes, modality: str):
    """The real decoder seam (PIL / soundfile / pyav live here in a
    full deployment). Deliberately unimplemented in this container."""
    raise NotImplementedError(
        f"no {modality} codec in this environment — use the deterministic "
        "fake in extract_features/sample_frames"
    )


def attach_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Turn a text corpus into a multimodal fixture: payload =
    utf-8 bytes of the text (a deterministic stand-in for raw media),
    modality cycling by id. In production this column is the raw
    bytes ingested from the object store; everything downstream is
    unchanged."""
    m = F.col(id_col) % 3
    return df.select(
        F.col(id_col),
        F.col(text_col).alias("text"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.when(m == 0, F.lit("image"))
        .when(m == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("modality"),
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Per-payload feature extraction over Arrow batches.

    Emits size + content digest for every modality and a
    modality-specific fake decode: image → (width, height) derived
    from the byte length, audio → duration at a nominal 16 B/ms,
    video → frame count at _FRAME_CHARS bytes/frame. NULLs for the
    non-applicable columns (typed, not sentinel)."""
    import pandas as pd  # noqa: PLC0415 — worker-side import

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            out = pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "modality": pdf["modality"],
                "n_bytes": n_bytes.astype("int64"),
                "digest": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
            })
            img = pdf["modality"] == "image"
            aud = pdf["modality"] == "audio"
            vid = pdf["modality"] == "video"
            out["width"] = pd.array(
                (16 + n_bytes % 640).where(img), dtype="Int64")
            out["height"] = pd.array(
                (16 + (n_bytes // 640) % 480).where(img), dtype="Int64")
            out["duration_ms"] = pd.array(
                (n_bytes // 16).where(aud), dtype="Int64")
            out["n_frames"] = pd.array(
                (n_bytes // _FRAME_CHARS).where(vid), dtype="Int64")
            yield out

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(df: DataFrame) -> DataFrame:
    """Frame sampling for video payloads: slice the payload into
    _FRAME_CHARS-char frames, keep every _FRAME_STRIDE-th, emit one
    row per sampled frame with a content digest — the fan-out shape
    (1 row in, k rows out) real video frame extraction has. Operates
    on the text twin of the payload so the slicing is
    character-deterministic across engines."""
    import pandas as pd  # noqa: PLC0415 — worker-side import

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            ids, idxs, digs = [], [], []
            vids = pdf[pdf["modality"] == "video"]
            for doc_id, text in zip(vids["doc_id"], vids["text"]):
                n_chunks = math.ceil(len(text) / _FRAME_CHARS)
                for i in range(0, n_chunks, _FRAME_STRIDE):
                    chunk = text[i * _FRAME_CHARS:(i + 1) * _FRAME_CHARS]
                    ids.append(doc_id)
                    idxs.append(i)
                    digs.append(hashlib.md5(chunk.encode("utf-8")).hexdigest())
            yield pd.DataFrame({
                "doc_id": pd.array(ids, dtype="int64"),
                "frame_idx": pd.array(idxs, dtype="int64"),
                "frame_digest": pd.array(digs, dtype="object"),
            })

    return df.mapInPandas(batches, FRAME_SCHEMA)
