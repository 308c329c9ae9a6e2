"""Bit-determinism under re-partitioning: float-aggregating queries
must produce IDENTICAL values regardless of the shuffle layout —
the property that makes them safe under AQE runtime re-planning (and
what the decimal/quantized-integer arithmetic buys). Plain double
sums would fail this test."""

from __future__ import annotations

import pytest

from psx_data_pipeline_spark.plans import QUERIES, clear_session_memos

SF = "/root/testdata/sf0.001"

# queries whose outputs contain floating-point aggregates
FLOAT_AGG_QUERIES = [
    "pricing_summary", "update_stats", "ohlc_daily", "moving_avg",
    "ngram_jaccard_pairs", "cosine_topk", "price_percentiles",
    "source_temperature_weights", "word_pmi", "brand_revenue_share",
    # round-5 additions with float/quantized aggregates
    "bm25_scores", "audio_decode", "embedding_stats", "ann_recall",
    "shard_manifest",
    # round-6 sketches: registers are min-aggregates, the estimate a
    # pure integer formula — any layout must reproduce them exactly
    "vocab_sketch", "vocab_overlap_sketch",
    # round-6: window-ordering-sensitive (total in-hour pick + ignore-
    # nulls fill) and grid-sensitive (CM cell grid, quantile cumes)
    "count_min_hitters", "group_quantiles", "robust_outliers",
    "resample_ffill",
    # float-array group key (dup collapse) + multi-join census
    "neighbor_triangles",
    # round-6 session-4: integer-rank iterate over the same collapsed
    # graph; rank fusion over candidate windows; PQ min-struct code
    # assignment + normalized-double ADC sums (quantized-int floors)
    "pagerank_sim", "rrf_fusion", "pq_adc_topk", "pq_recall",
]


@pytest.mark.parametrize("name", FLOAT_AGG_QUERIES)
def test_result_invariant_to_shuffle_partitioning(spark, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # memoized queries (ticker_sync, ANN top-k) must re-execute
        # under the second layout, not serve the first run's cache —
        # without this the test is vacuous for them
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        clear_session_memos()
        a = sorted(map(tuple, QUERIES[name](spark, SF).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        clear_session_memos()
        b = sorted(map(tuple, QUERIES[name](spark, SF).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b  # exact equality, including every float bit


AQE_QUERIES = ["pricing_summary", "ngram_jaccard_pairs", "bm25_scores",
               "minhash_lsh_pairs", "shard_manifest"]


@pytest.mark.parametrize("name", AQE_QUERIES)
def test_result_invariant_to_aqe(spark, name):
    """AQE re-plans (coalesced partitions, demoted broadcasts, skew
    splits) must never change result VALUES — same exact-arithmetic
    guarantee as the shuffle-partition sweep, exercised against the
    other big runtime re-planner."""
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        clear_session_memos()
        a = sorted(map(tuple, QUERIES[name](spark, SF).collect()))
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        clear_session_memos()
        b = sorted(map(tuple, QUERIES[name](spark, SF).collect()))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert a == b  # exact equality, including every float bit
