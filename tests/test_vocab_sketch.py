"""Pins for the HyperLogLog vocabulary sketch (plans/text.py
vocab_sketch): estimator accuracy against the exact distinct count,
and the cross-engine determinism of its one float seam — the
linear-counting branch's floor(1000·ln(k/V)), which has exactly 256
possible inputs, every one asserted identical in Spark and DuckDB."""

from __future__ import annotations

from pyspark.sql import functions as F

from psx_data_pipeline_spark.functions.textfns import tokens
from psx_data_pipeline_spark.plans import QUERIES
from psx_data_pipeline_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.01"


def test_estimate_within_hll_error_bounds(spark):
    est = {
        r["source"]: r["est_distinct"]
        for r in QUERIES["vocab_sketch"](spark, SF).collect()
    }
    exact = {
        r["source"]: r["d"]
        for r in load_table(spark, "documents", SF)
        .select("source", F.explode(tokens("text")).alias("tok"))
        .groupBy("source")
        .agg(F.countDistinct("tok").alias("d"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for src, d in exact.items():
        # standard error 1.04/sqrt(256) ~ 6.5%; assert 3 sigma
        assert abs(est[src] - d) <= max(5, 0.2 * d), (
            f"{src}: est {est[src]} vs exact {d}"
        )


def test_linear_counting_ln_seam_is_engine_identical(spark):
    import duckdb

    spark_vals = [
        r["l"]
        for r in spark.range(1, 257)
        .select(
            F.expr(
                "CAST(floor(1000 * ln(CAST(256 AS DOUBLE) / id))"
                " AS BIGINT)"
            ).alias("l")
        )
        .collect()
    ]
    duck_vals = [
        r[0]
        for r in duckdb.sql(
            "SELECT CAST(floor(1000 * ln(CAST(256 AS DOUBLE) / v))"
            " AS BIGINT) FROM range(1, 257) t(v) ORDER BY v"
        ).fetchall()
    ]
    assert spark_vals == duck_vals


def test_register_rows_are_bounded(spark):
    # the sketch's exchange is <= k rows per source: check the
    # pre-aggregation register table cardinality directly
    out = QUERIES["vocab_sketch"](spark, SF)
    rows = out.collect()
    for r in rows:
        assert 0 <= r["empty_registers"] <= 256
        assert r["est_distinct"] >= 0


def test_overlap_estimates_track_exact_set_relations(spark):
    from itertools import combinations

    est = {
        (r["source_a"], r["source_b"]): r
        for r in QUERIES["vocab_overlap_sketch"](spark, SF).collect()
    }
    toks = (
        load_table(spark, "documents", SF)
        .select("source", F.explode(tokens("text")).alias("tok"))
        .distinct()
        .collect()
    )
    vocab: dict = {}
    for r in toks:
        vocab.setdefault(r["source"], set()).add(r["tok"])
    srcs = sorted(s for s in vocab if s is not None)
    assert set(est) == set(combinations(srcs, 2))
    for (a, b), r in est.items():
        u, i = len(vocab[a] | vocab[b]), len(vocab[a] & vocab[b])
        assert abs(r["est_union"] - u) <= max(5, 0.2 * u)
        # intersection inherits BOTH sketches' noise — wide tolerance,
        # but it must track the true overlap's magnitude
        assert abs(r["est_intersect"] - i) <= max(10, 0.35 * u)


def test_streaming_register_merge_is_batching_invariant():
    """ANY split of the same token stream into micro-batches must
    converge to identical registers (the mergeable-summary property
    the streaming sketch's correctness rests on)."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from psx_data_pipeline_spark.plans.text import _HLL_K, _HLL_VMOD
    from psx_data_pipeline_spark.streaming.jobs import (
        _hll_merge,
        _hll_reduce,
    )

    @st.composite
    def batched(draw):
        rows = draw(st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=_HLL_K - 1),
                st.integers(min_value=0, max_value=_HLL_VMOD - 1),
            ),
            max_size=120,
        ))
        cuts = sorted(draw(st.lists(
            st.integers(min_value=0, max_value=len(rows)), max_size=5
        )))
        bounds = [0, *cuts, len(rows)]
        return rows, [rows[a:b] for a, b in zip(bounds, bounds[1:])]

    def pdf(rows):
        return pd.DataFrame({
            "b": [r[0] for r in rows], "v": [r[1] for r in rows],
        })

    @settings(max_examples=80, deadline=None)
    @given(batched())
    def check(case):
        rows, batches = case
        one_nt, one_regs = _hll_merge(
            0, [_HLL_VMOD] * _HLL_K, [pdf(rows)] if rows else []
        )
        nt, regs = 0, [_HLL_VMOD] * _HLL_K
        for b in batches:
            if b:
                nt, regs = _hll_merge(nt, regs, [pdf(b)])
        assert (nt, regs) == (one_nt, one_regs)
        assert _hll_reduce(regs) == _hll_reduce(one_regs)

    check()
