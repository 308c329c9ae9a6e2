"""Property pins for the layout/pruning operators (plans/layout.py):
the Morton layout's per-file dimension spans really beat the
time-ordered layout on the user dimension (the point of Z-ORDER),
and the Bloom filter admits every member (no false negatives,
structurally) with a load-factor-bounded false-positive rate."""

from __future__ import annotations

from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans import QUERIES
from psx_data_pipeline_spark.plans.layout import (
    _BLOOM_K,
    _M_BITS,
    bloom_words,
)

SF = "/root/testdata/sf0.01"


def test_zorder_files_narrow_both_dimensions(spark):
    rows = QUERIES["zorder_layout"](spark, SF).collect()
    z = [r for r in rows if r["layout"] == "zorder"]
    t = [r for r in rows if r["layout"] == "time"]
    assert z and t
    zu = sum(r["u_span_permille"] for r in z) / len(z)
    tu = sum(r["u_span_permille"] for r in t) / len(t)
    # a user-equality scan under the time layout reads ~every file
    # (full user span); under z-order each file covers a fraction
    assert tu > 900, f"time layout should span ~full user range: {tu}"
    assert zu < tu / 2, f"z-order should at least halve it: {zu} vs {tu}"
    # and z-order pays for it with BOUNDED time spans, not a shuffle
    zt = sum(r["t_span_permille"] for r in z) / len(z)
    assert zt < 500, zt


def test_zorder_buckets_partition_the_rows(spark):
    rows = QUERIES["zorder_layout"](spark, SF).collect()
    for layout in ("zorder", "time"):
        sub = [r for r in rows if r["layout"] == layout]
        assert 1 <= len(sub) <= 64
        assert all(0 <= r["bucket"] < 64 for r in sub)
    n_z = sum(r["n_rows"] for r in rows if r["layout"] == "zorder")
    n_t = sum(r["n_rows"] for r in rows if r["layout"] == "time")
    assert n_z == n_t  # same rows, two layouts


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    r = QUERIES["bloom_semijoin"](spark, SF).collect()[0]
    assert r["n_missed"] == 0  # structural: bloom never drops a member
    assert r["n_pass"] >= r["n_member"]
    # fp upper bound: with n keys and k hashes in m bits the expected
    # rate is (1 - e^{-kn/m})^k; assert a generous 10x of that
    import math

    n = r["n_member"]  # build keys ~ member probe keys here
    p_fp = (1 - math.exp(-_BLOOM_K * n / _M_BITS)) ** _BLOOM_K
    bound = max(10 * p_fp * (r["n_probe"] - r["n_member"]), 5)
    assert r["n_false_pos"] <= bound, (r["n_false_pos"], bound)


def test_bloom_words_table_is_constant_size(spark):
    ks = spark.range(0, 5000).select(F.col("id").alias("k"))
    words = bloom_words(ks)
    n = words.count()
    assert n <= _M_BITS // 32
    # every mask uses only the 32 low bits (no 1<<63 engine edge)
    bad = words.where(
        (F.col("mask") < 0) | (F.col("mask") >= F.lit(1 << 32))
    ).count()
    assert bad == 0
