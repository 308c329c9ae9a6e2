"""Property pins for the EWMA indicator (plans/timeseries.py): exact
dyadic-kernel arithmetic on a symbol's first days, bounds within the
window it averages, and the shrinking-mass normalization."""

from __future__ import annotations

from collections import defaultdict

from psx_data_pipeline_spark.plans import QUERIES
from psx_data_pipeline_spark.plans.timeseries import _K

SF = "/root/testdata/sf0.01"


def _series(spark):
    rows = QUERIES["ewma_prices"](spark, SF).collect()
    by_sym = defaultdict(list)
    for r in rows:
        by_sym[r["symbol_id"]].append(r)
    for sym in by_sym:
        by_sym[sym].sort(key=lambda r: r["trade_date"])
    return by_sym


def test_first_two_days_exact(spark):
    for sym, rs in _series(spark).items():
        r0 = rs[0]
        # day 1: only lag 0 present — ewma IS the close
        assert r0["weight_mass"] == 128, r0
        assert r0["ewma_milli"] == r0["close_milli"], r0
        if len(rs) > 1:
            r1 = rs[1]
            assert r1["weight_mass"] == 192, r1
            c0, c1 = r0["close_milli"], r1["close_milli"]
            num = 128 * c1 + 64 * c0
            expect = num // 192 if num >= 0 else -((-num) // 192)
            assert r1["ewma_milli"] == expect, (sym, r1)


def test_ewma_within_window_bounds(spark):
    """A normalized positive-weight average sits inside [min, max] of
    the closes it covers (truncation can land exactly on min)."""
    for sym, rs in _series(spark).items():
        closes = [r["close_milli"] for r in rs]
        for i, r in enumerate(rs):
            window = closes[max(0, i - _K + 1): i + 1]
            assert min(window) - 1 <= r["ewma_milli"] <= max(window), (
                sym, i, r
            )


def test_full_mass_after_k_days(spark):
    for _, rs in _series(spark).items():
        for i, r in enumerate(rs):
            if i >= _K - 1:
                assert r["weight_mass"] == (1 << _K) - 1, r
