"""Pin the hostile-embeddings invariants the probe established
(tools/hostile_embeddings_probe.py): degenerate vectors must be
excluded by the indexable gate — never crash the ANSI plan — and the
gate must equal "quantized norm > 0", the divisor cosine actually
uses.

The probe sweeps all 16 embeddings queries against their DuckDB
oracles on a salted corpus; these tests pin the load-bearing gate
semantics cheaply so a regression fails in plain pytest without
running the probe."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from psx_data_pipeline_spark.operators.similarity import (
    cosine_topk,
    indexable_embedding,
)

DIM = 8  # gate dim is a parameter; small keeps the fixture readable

HOSTILE = [
    (1, None, "null embedding"),
    (2, [], "empty array"),
    (3, [0.5], "wrong dim"),
    (4, [0.0] * DIM, "zero vector"),
    (5, [float("nan")] + [0.1] * (DIM - 1), "NaN component"),
    (6, [float("inf")] + [0.1] * (DIM - 1), "+Inf component"),
    (7, [-0.0] * DIM, "negative zero"),
    # the round-10 killer: nonzero in floats, quantized norm EXACTLY 0
    # (every floor(x^2 * 1e12) = 0 for |x| < 1e-6) — the old
    # "some component nonzero" gate passed it straight into a
    # DIVIDE_BY_ZERO that aborted nine queries' jobs
    (8, [1e-38] * DIM, "denormal-tiny (quantized norm 0)"),
    (9, [9.9e-7] * DIM, "just below the quantization floor"),
]
VALID = [
    # NOT 1e-6: float32(1e-6) = 9.9999997e-7 sits BELOW the floor and
    # is correctly excluded — the gate quantizes the float32-cast
    # value, exactly like the divisor it protects
    (100, [2e-6] + [0.0] * (DIM - 1), "just above the floor"),
    (101, [0.1] * DIM, "ordinary"),
    (102, [-0.1] * DIM, "ordinary negative"),
]


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.createDataFrame(
        [(i, v) for i, v, _w in HOSTILE + VALID],
        "vec_id long, embedding array<float>",
    )


def test_gate_is_quantized_norm_positive(emb_df):
    got = {
        r.vec_id
        for r in emb_df.where(
            indexable_embedding("embedding", DIM)
        ).collect()
    }
    assert got == {i for i, _v, _w in VALID}


def test_cosine_topk_survives_hostile_corpus(emb_df):
    """One degenerate vector must cost one row, not the stage: the
    gated corpus pairs up under ANSI arithmetic with no
    DIVIDE_BY_ZERO, and only valid ids appear."""
    gated = emb_df.where(indexable_embedding("embedding", DIM))
    rows = cosine_topk(gated, gated, "embedding", "vec_id", k=2).collect()
    ids = {r.query_id for r in rows} | {r.neighbor_id for r in rows}
    assert ids == {i for i, _v, _w in VALID}
    for r in rows:
        assert r.cosine == r.cosine  # no NaN leaked through
