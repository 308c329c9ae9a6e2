"""Pins for resample_ffill (plans/events.py): fill semantics against
a naive python recompute, grid density/clamping, and pre-clamp
seeding."""

from __future__ import annotations

import datetime as dt

from psx_data_pipeline_spark.plans import QUERIES
from psx_data_pipeline_spark.plans.events import _RESAMPLE_SPAN

_HOUR_US = 3600 * 1_000_000


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _t(h, m=0):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=h, minutes=m)


def test_fill_carries_last_value_and_grid_is_dense(spark, tmp_path):
    sf = str(tmp_path)
    _write_events(spark, sf, [
        (1, _t(0, 10), 7, "click", 1.0, None),
        (2, _t(0, 50), 7, "click", 2.5, None),   # last of hour 0
        (3, _t(3, 0), 7, "click", None, None),   # NULL value: no update
        (4, _t(5, 0), 7, "click", 4.0, None),
        (5, _t(2, 0), 8, "view", 9.0, None),
    ])
    rows = {
        (r["user_id"], r["hour_start_us"]): r
        for r in QUERIES["resample_ffill"](spark, sf).collect()
    }
    # session TZ is UTC (psx session config), so the naive fixture
    # datetimes are UTC instants
    base = int(
        _t(0).replace(tzinfo=dt.timezone.utc).timestamp()
    ) * 1_000_000
    # user 7: dense hours 0..5
    got7 = [rows[(7, base + h * _HOUR_US)] for h in range(6)]
    assert [r["n_events"] for r in got7] == [2, 0, 0, 1, 0, 1]
    assert [r["filled_milli"] for r in got7] == [
        2500, 2500, 2500, 2500, 2500, 4000
    ]
    # user 8: a single grid hour
    assert rows[(8, base + 2 * _HOUR_US)]["filled_milli"] == 9000
    assert len(rows) == 7


def test_clamp_bounds_grid_and_preclamp_history_seeds(spark, tmp_path):
    sf = str(tmp_path)
    far_back = -2 * _RESAMPLE_SPAN  # hours before the recent cluster
    _write_events(spark, sf, [
        (1, _t(far_back), 7, "click", 123.0, None),  # ancient, value seed
        (2, _t(0), 7, "click", None, None),
        (3, _t(1), 7, "click", 7.0, None),
    ])
    out = QUERIES["resample_ffill"](spark, sf).collect()
    # grid clamped: far-back hour NOT materialized, span <= _RESAMPLE_SPAN
    assert len(out) <= _RESAMPLE_SPAN
    by_hour = sorted(out, key=lambda r: r["hour_start_us"])
    # first grid hour is hour 1 - (SPAN-1); its fill comes from the
    # ancient event even though that hour is outside the grid
    assert by_hour[0]["filled_milli"] == 123000
    assert by_hour[0]["n_events"] == 0
    assert by_hour[-1]["filled_milli"] == 7000


def test_in_hour_pick_is_latest_by_ts_then_id(spark, tmp_path):
    sf = str(tmp_path)
    _write_events(spark, sf, [
        (10, _t(0, 30), 7, "click", 1.0, None),
        (11, _t(0, 30), 7, "click", 2.0, None),  # same ts: higher id wins
        (9, _t(0, 45), 7, "click", 3.0, None),   # later ts wins overall
    ])
    out = QUERIES["resample_ffill"](spark, sf).collect()
    assert len(out) == 1 and out[0]["filled_milli"] == 3000
