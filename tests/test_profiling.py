"""Pins for distribution profiling (plans/profiling.py): the skew
audit matches a brute-force recompute and the histogram quantile
error is one-sided and bin-bounded."""

from __future__ import annotations

from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans import QUERIES
from psx_data_pipeline_spark.plans.profiling import _BIN_W, _SKEW_KEYS
from psx_data_pipeline_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.01"


def _pctl(sorted_vals: list[int], q: int) -> int:
    # ceiling-rank selection: smallest value whose rank reaches
    # ceil(q% of n) — the repo's group_quantiles convention
    n = len(sorted_vals)
    rank = (q * n + 99) // 100
    return sorted_vals[max(rank - 1, 0)]


def test_join_skew_audit_matches_bruteforce(spark):
    rows = {r.join_key: r for r in
            QUERIES["join_skew_audit"](spark, SF).collect()}
    assert set(rows) == {name for name, _, _ in _SKEW_KEYS}
    for name, table, col in _SKEW_KEYS:
        df = load_table(spark, table, SF).where(F.col(col).isNotNull())
        counts = sorted(
            r["cnt"] for r in
            df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt")).collect()
        )
        r = rows[name]
        assert r.n_keys == len(counts)
        assert r.total_rows == sum(counts)
        assert r.max_cnt == counts[-1]
        assert r.p50_cnt == _pctl(counts, 50)
        assert r.p99_cnt == _pctl(counts, 99)
        assert r.imbalance_permille == (
            counts[-1] * len(counts) * 1000 // sum(counts)
        )
        # imbalance is >= 1000 by construction (max >= mean)
        assert r.imbalance_permille >= 1000


def test_histogram_quantiles_error_is_bin_bounded(spark):
    rows = QUERIES["histogram_quantiles"](spark, SF).collect()
    assert rows
    docs = load_table(spark, "documents", SF).where(
        F.col("n_chars").isNotNull()
    ).select("source", "n_chars").collect()
    by_source: dict = {}
    for d in docs:
        by_source.setdefault(d.source, []).append(d.n_chars)
    for r in rows:
        vals = sorted(by_source[r.source])
        assert r.n_docs == len(vals)
        for q, exact, approx in (
            (50, r.p50_exact, r.p50_approx),
            (90, r.p90_exact, r.p90_approx),
            (99, r.p99_exact, r.p99_approx),
        ):
            assert exact == _pctl(vals, q)
            # the lower-edge estimate never exceeds the exact value
            # and sits within one bin of it
            assert 0 <= exact - approx < _BIN_W
        assert r.max_err == max(
            r.p50_exact - r.p50_approx,
            r.p90_exact - r.p90_approx,
            r.p99_exact - r.p99_approx,
        )
