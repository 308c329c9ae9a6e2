"""Pins for seasonal_baseline, zorder_benefit and lang_confusion:
the profile matches a replay, z-order really prunes better than the
time layout on the user-band predicate, and confusion rows normalize."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans import QUERIES
from psx_data_pipeline_spark.sources.fixtures import load_events

SF = "/root/testdata/sf0.01"

_DAY_US = 86_400 * 1_000_000
_HOUR_US = 3_600 * 1_000_000


def test_seasonal_baseline_matches_replay(spark):
    rows = {(r.dow, r.hour): r for r in
            QUERIES["seasonal_baseline"](spark, SF).collect()}
    assert rows
    ev = load_events(spark, SF).where(
        F.col("ts_us").isNotNull()
    ).select("ts_us").collect()
    cells = defaultdict(int)
    for e in ev:
        day = (e.ts_us - ((e.ts_us % _DAY_US) + _DAY_US) % _DAY_US) // _DAY_US
        hour = (((e.ts_us % _DAY_US) + _DAY_US) % _DAY_US) // _HOUR_US
        cells[(day, day % 7, hour)] += 1
    last_day = max(d for d, _, _ in cells)
    prof_n = defaultdict(int)
    prof_days = defaultdict(set)
    prof_last = defaultdict(int)
    for (d, dow, h), n in cells.items():
        prof_n[(dow, h)] += n
        prof_days[(dow, h)].add(d)
        if d == last_day:
            prof_last[(dow, h)] += n
    assert set(rows) == set(prof_n)
    for key, r in rows.items():
        assert r.n_events == prof_n[key]
        assert r.days_observed == len(prof_days[key])
        assert r.last_day_events == prof_last[key]
        assert r.rate_milli == prof_n[key] * 1000 // len(prof_days[key])
        assert r.deviation_permille == (
            prof_last[key] * len(prof_days[key]) * 1000 // prof_n[key]
        )


def test_zorder_benefit_zorder_beats_time_on_user_band(spark):
    rows = {(r.layout, r.pred_id): r for r in
            QUERIES["zorder_benefit"](spark, SF).collect()}
    # predicate 1 is the narrow user band: the time layout cannot
    # skip anything (every file spans the full user range), z-order
    # must skip most files — the entire point of the rewrite
    assert rows[("time", 1)].prune_permille == 0
    assert rows[("zorder", 1)].prune_permille >= 500
    # predicate 2 is the time range: BOTH layouts prune (z-order
    # keeps locality in every interleaved dimension)
    assert rows[("time", 2)].prune_permille > 0
    assert rows[("zorder", 2)].prune_permille > 0
    for r in rows.values():
        assert 0 <= r.n_scanned <= r.n_files
        assert r.rows_scanned <= rows[(r.layout, 1)].rows_scanned \
            + rows[(r.layout, 2)].rows_scanned + rows[(r.layout, 3)].rows_scanned


def test_lang_confusion_rows_normalize(spark):
    rows = QUERIES["lang_confusion"](spark, SF).collect()
    assert rows
    by_true = defaultdict(list)
    for r in rows:
        by_true[r.lang_true].append(r)
    for lang, cells in by_true.items():
        total = sum(c.n for c in cells)
        for c in cells:
            assert c.row_permille == c.n * 1000 // total
            assert c.agree == (1 if c.lang_true == c.lang_pred else 0)
    # matrix covers every doc exactly once
    n_docs = QUERIES["lang_id"](spark, SF).count()
    assert sum(r.n for r in rows) == n_docs
