"""Structural invariants for the packing / budgeting / chunk-dedup
operators — properties the DuckDB hash-oracle can confirm but not
explain: these pin down WHY the numbers are right.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans import QUERIES
from psx_data_pipeline_spark.sources.fixtures import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_sequence_pack_offsets_contiguous(spark):
    """Within each packing lane the token stream has no holes: each
    doc starts exactly where the previous one ended."""
    rows = QUERIES["sequence_pack"](spark, SF_DIR).collect()
    lanes = defaultdict(list)
    for r in rows:
        lanes[r.bucket].append(r)
    assert len(lanes) > 1
    for lane in lanes.values():
        lane.sort(key=lambda r: r.tok_offset)
        pos = 0
        for r in lane:
            assert r.tok_offset == pos
            assert r.bin_id == pos // 512
            pos += r.n_tokens


def test_token_budget_sample_respects_quota(spark):
    """Every admitted doc's cumulative count is within budget, and the
    sample is a prefix: no admitted doc is preceded (in md5 order) by
    a rejected one."""
    out = QUERIES["token_budget_sample"](spark, SF_DIR).collect()
    assert out
    per_source = defaultdict(int)
    for r in out:
        assert r.cum_tokens <= 600
        assert r.cum_tokens >= r.n_tokens
        per_source[r.source] = max(per_source[r.source], r.cum_tokens)
    docs = load_table(spark, "documents", SF_DIR)
    totals = {
        r["source"]: r["t"]
        for r in docs.groupBy("source")
        .agg(F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("t"))
        .collect()
    }
    # a source stops admitting only because the next doc would overflow
    for src, hi in per_source.items():
        assert hi <= 600 <= totals[src]


def test_chunk_dedup_counts_all_blocks(spark):
    """Every document appears, and its block count equals the exact
    ceil(n_tokens / 10) the splitter promises."""
    docs = load_table(spark, "documents", SF_DIR)
    expected = {
        r.doc_id: r.nb
        for r in docs.select(
            "doc_id",
            F.greatest(
                F.ceil(
                    F.size(F.filter(F.split(F.trim("text"), r"\s+"), lambda w: w != ""))
                    / 10.0
                ),
                F.lit(1),
            ).alias("nb"),
        ).collect()
    }
    got = {r.doc_id: r.n_blocks for r in QUERIES["chunk_dedup"](spark, SF_DIR).collect()}
    assert got == expected


def test_user_retention_week_zero_covers_all_users(spark):
    """Cohort week 0 row exists for every cohort, and summing distinct
    users at offset 0 equals the total distinct users."""
    rows = QUERIES["user_retention"](spark, SF_DIR).collect()
    by_cohort = defaultdict(dict)
    for r in rows:
        by_cohort[r.cohort_week][r.week_offset] = r.n_users
    assert all(0 in offs for offs in by_cohort.values())
    total0 = sum(offs[0] for offs in by_cohort.values())
    n_users = (
        load_table(spark, "events", SF_DIR).select("user_id").distinct().count()
    )
    assert total0 == n_users
