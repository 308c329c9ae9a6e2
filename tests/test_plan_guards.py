"""Plan-shape guardrails: scale killers must never appear.

Every registered query's physical plan is checked for operators that
do not survive 100 TB: cartesian products and broadcast nested-loop
joins (the shapes Catalyst falls back to when a join has no usable
equi-condition). A query that needs a theta-join must express it as a
blocked/bucketed equi-join (see operators/diff.py, operators/dedup.py)
— this test keeps that property from regressing.

Streaming queries are exercised through their batch-twin plans the
registry exposes; plans are built at sf0.001 (plan shape does not
depend on data volume, only on statistics-driven strategy choices —
forbidden shapes are forbidden at every size).
"""

from __future__ import annotations

import pytest

from psx_data_pipeline_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"

FORBIDDEN = ("CartesianProduct", "BroadcastNestedLoopJoin")

# Intentional bounded broadcasts: brute-force cosine compares the
# corpus against a BROADCAST top-k query set (definitionally
# all-pairs vs a tiny constant side — operators/similarity.py:70),
# IVF probes query×centroid where both sides are size-capped via the
# corpus-scaled mod (plans/similarity.py), and word_pmi / oov_rate
# carry corpus totals / the top-K vocabulary as ONE broadcast scalar
# row (unigram_logprob's broadcast is likewise its single-row token
# total). The corpus side is never the build side, so these survive
# 100 TB.
BOUNDED_BROADCAST_OK = {
    "cosine_topk", "ivf_topk", "word_pmi", "oov_rate", "unigram_logprob",
    "heavy_shingles",  # single-row corpus total rides as a broadcast
    "dsir_weights",  # single-row corpus totals ride as a broadcast
    "embedding_quantize",  # one broadcast row of per-dim ranges
    "shard_manifest",  # single-row corpus-token total rides as a broadcast
    "stratified_sample",  # single-row corpus doc total rides as a broadcast
    "ann_recall",  # composes cosine_topk's bounded broadcast baseline
    # the scaled-mod subset's single-row count broadcast (same shape
    # as cosine/ivf above) feeding codebook + query selection
    "pq_adc_topk", "pq_recall",
    # source-PAIR generation joins the distinct source list against
    # itself on a < b: the nested side is bounded metadata (the
    # source catalogue), never corpus rows — register merges
    # downstream are equi-joins
    "vocab_overlap_sketch",
    # the quantization-range agg rides as ONE broadcast row (same
    # shape as embedding_quantize's per-dim ranges)
    "zorder_layout",
    # the pooled-count single row broadcast into the 1001-point grid
    "quantile_calibrate",
    # single-row vocabulary-size broadcast (same shape as
    # unigram_logprob's token total); perplexity_buckets composes it
    "bigram_perplexity", "perplexity_buckets",
    # single-row weight-total broadcast onto the bounded source
    # catalogue (shard_manifest's shape)
    "mixing_schedule",
    # the K=8-row centroid table rides each assignment round as a
    # bounded broadcast; the corpus is never the build side
    "kmeans_topics",
    # the percentile row and the signup-cohort count are both
    # single-row aggregates joined by a bounded broadcast cross join
    "conversion_lag",
    # the data-borne latest-day scalar rides as one broadcast row
    "seasonal_baseline",
    # composes zorder_layout's single quantization-range broadcast
    "zorder_benefit",
    # cosine_topk's bounded query-set broadcast with the extra
    # label-inequality predicate
    "hard_negatives",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_scale_killer_join(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    forbidden = (
        ("CartesianProduct",) if name in BOUNDED_BROADCAST_OK else FORBIDDEN
    )
    for op in forbidden:
        assert op not in plan, f"{name}: {op} in physical plan"
