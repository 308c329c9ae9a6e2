"""Pins for the product-quantization family (plans/similarity.py
pq_adc_topk / pq_recall).

The load-bearing seam is single-precision multiplication: Spark's
Multiply on two FloatType columns computes in float32 and widens
AFTERWARDS, so qdot_sql must take the DuckDB product as FLOAT·FLOAT
too — a double-precision product diverges by a few hundred integer
units per 16-term sum (found building pq_adc_topk: 39996/40000
assignment costs differed before the fix), which dot_sql's /1e12
rounding hides but a raw-integer comparison does not.
"""

from __future__ import annotations

import duckdb
import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from psx_data_pipeline_spark.operators.similarity import qdot, qdot_sql
from psx_data_pipeline_spark.plans import QUERIES

SF = "/root/testdata/sf0.01"


def _f32(x: float) -> float:
    import struct

    return struct.unpack("f", struct.pack("f", x))[0]


# components within the indexable bound |v| <= 100, float32-rounded
# like parquet storage; filter non-finite after rounding for safety
_comp = st.floats(
    min_value=-100.0, max_value=100.0, allow_nan=False, allow_infinity=False
).map(_f32).filter(math.isfinite)


@settings(max_examples=12, deadline=None)  # each example is a full
# Spark job (~0.8 s of scheduler overhead); the decimal-literal
# failure mode this pins reproduces on nearly any many-digit vector,
# so 12 examples keep the canary at a third of the wall
@given(st.lists(st.tuples(_comp, _comp), min_size=1, max_size=16))
def test_qdot_single_precision_parity(spark, pairs):
    """Raw integer qdot must agree bit-for-bit across engines on
    arbitrary bounded float32 vectors — the property the double-
    product oracle form violated."""
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    df = spark.createDataFrame(
        [(a, b)], "a array<float>, b array<float>"
    )
    got = df.select(qdot(F.col("a"), F.col("b")).alias("q")).first()["q"]

    # Literal discipline: DuckDB parses bare numeric literals with
    # many digits as DECIMAL, and DECIMAL→FLOAT can land one ulp off
    # the round-nearest double→float cast Spark's ingestion does.
    # Forcing each element through a DOUBLE literal first reproduces
    # the parquet path (exact double → round-nearest float32).
    def lit(xs):
        elems = ", ".join(f"CAST({x!r} AS DOUBLE)" for x in xs)
        return f"CAST([{elems}] AS FLOAT[])"

    want = duckdb.sql("SELECT " + qdot_sql(lit(a), lit(b))).fetchone()[0]
    assert got == want


def test_pq_codes_cover_all_indexable_vectors(spark):
    """Every indexable vector gets a top-k candidate score against
    every query (ADC is a full compressed scan), so each query's
    result has exactly k ranked rows with unique ranks."""
    rows = QUERIES["pq_adc_topk"](spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert by_q, "no PQ results at sf0.01"
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) == 5


def test_pq_recall_reasonable(spark):
    """The PQ index must actually approximate the ground truth at
    sf0.01 — mean recall@5 above 0.3 (a broken codebook or assignment
    scores ~0; exactness is already pinned by the DuckDB oracle)."""
    rows = QUERIES["pq_recall"](spark, SF).collect()
    assert rows
    mean = sum(r["recall_milli"] for r in rows) / len(rows)
    assert mean >= 300, f"mean PQ recall collapsed: {mean} milli"


def test_qdot_unrolled_matches_fold_form(spark):
    """The codegen-unrolled fixed-dim qdot must be BIT-identical to
    the zip_with/aggregate fold it replaces on the PQ hot paths —
    including float32 single-precision products, negative values,
    subnormal-ish magnitudes, and the NULL-element poison rule."""
    import math

    from pyspark.sql import functions as F

    from psx_data_pipeline_spark.operators.similarity import (
        qdot,
        qdot_unrolled,
    )

    rows = [
        (1, [0.1, -0.2, 0.3, 0.4], [0.5, 0.6, -0.7, 0.8]),
        (2, [1e-8, 2e-8, -3e-8, 0.0], [9.9, -9.9, 9.9, 9.9]),
        (3, [99.0, -99.0, 99.0, -99.0], [99.0, 99.0, -99.0, -99.0]),
        (4, [0.25, 0.25, 0.25, 0.25], [0.25, 0.25, 0.25, 0.25]),
        (5, [0.1, None, 0.3, 0.4], [0.5, 0.6, 0.7, 0.8]),  # NULL poisons
    ]
    for typ in ("float", "double"):
        df = spark.createDataFrame(
            rows, f"id long, a array<{typ}>, b array<{typ}>"
        )
        got = df.select(
            "id",
            qdot(F.col("a"), F.col("b")).alias("fold"),
            qdot_unrolled(F.col("a"), F.col("b"), 4).alias("unrolled"),
        ).collect()
        for r in got:
            assert r.fold == r.unrolled, (typ, r.id, r.fold, r.unrolled)
        assert [r.fold for r in got if r.id == 5] == [None]
