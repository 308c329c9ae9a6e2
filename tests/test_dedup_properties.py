"""Property tests for the dedup sketches: the prefix-filtered Jaccard
candidate generation must be LOSSLESS — identical output to the naive
all-shingles form — for any corpus and threshold."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from psx_data_pipeline_spark.functions.textfns import word_shingles
from psx_data_pipeline_spark.operators.dedup import ngram_jaccard_pairs

_WORDS = ["red", "green", "blue", "rock", "paper", "wind", "sun", "moon"]


def _brute_force(rows, shingle_n, threshold):
    import itertools

    def shingles(text):
        toks = text.split()
        if len(toks) >= shingle_n:
            return {
                " ".join(toks[i:i + shingle_n])
                for i in range(len(toks) - shingle_n + 1)
            }
        return {" ".join(toks)}

    out = {}
    for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
        sa, sb = shingles(ta), shingles(tb)
        inter = len(sa & sb)
        union = len(sa | sb)
        j = inter / union if union else 0.0
        if j >= threshold:
            a, b = sorted((ia, ib))
            out[(a, b)] = j
    return out


@pytest.mark.slow
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=8).map(" ".join),
        min_size=2,
        max_size=12,
    ),
    threshold=st.sampled_from([0.3, 0.5, 0.8]),
)
def test_prefix_filtered_jaccard_is_lossless(spark, texts, threshold):
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, "text", "doc_id", shingle_n=3, threshold=threshold
        ).collect()
    }
    want = _brute_force(rows, 3, threshold)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_jaccard_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "x y z w q")],
        "doc_id LONG, text STRING",
    )
    got = ngram_jaccard_pairs(df, "text", "doc_id", 3, 0.99).collect()
    assert [(r["id_a"], r["id_b"], r["jaccard"]) for r in got] == [(1, 2, 1.0)]


def test_connected_components_path_cycle_singleton(spark):
    from psx_data_pipeline_spark.operators.dedup import connected_components

    # path 1-2-3-4 (diameter 3), cycle 5-6-7-5, singleton 8
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6), (6, 7), (7, 5)],
        "id_a LONG, id_b LONG",
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 9)], "id LONG")
    got = {
        r["id"]: r["comp"] for r in connected_components(edges, nodes).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 5, 8: 8}


def test_band_signatures_fail_loud_on_partial_band(spark):
    """ADVICE r9: the bands × rows_per_band coverage guard must live
    INSIDE band_signatures so every caller (plans/dedup.py,
    plans/estimators.py — which pass constants with no divisibility
    check) fails loudly instead of silently dropping a partial
    trailing band the oracle's i // rows_per_band banding would keep."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from psx_data_pipeline_spark.operators.dedup import band_signatures

    ok = spark.createDataFrame(
        [(1, list(range(16)))], "id LONG, sig ARRAY<LONG>"
    )
    rows = band_signatures(ok, 4, 4).orderBy("band").collect()
    assert [r["bsig"] for r in rows] == [
        "0,1,2,3", "4,5,6,7", "8,9,10,11", "12,13,14,15"
    ]
    # 15 components over 4×4 banding: the old projection silently
    # emitted a short 4th band; now it raises at execution
    bad = spark.createDataFrame(
        [(1, list(range(15)))], "id LONG, sig ARRAY<LONG>"
    )
    with pytest.raises(SparkRuntimeException, match="band_signatures"):
        band_signatures(bad, 4, 4).collect()
    # ADVICE r10: a NULL sig also fails the CASE, and the diagnostic
    # must survive the concat — size(NULL) is NULL, which used to
    # null out the whole raise_error message (fail-loud but opaque)
    null_sig = spark.createDataFrame(
        [(1, None)], "id LONG, sig ARRAY<LONG>"
    )
    with pytest.raises(
        SparkRuntimeException, match="signature length -1"
    ):
        band_signatures(null_sig, 4, 4).collect()
