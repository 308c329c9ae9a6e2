"""Streaming-layer tests: exactly-once incremental ingest (the §7
daily-append pattern) — the oracle gate covers the three streaming
aggregation queries, this covers the checkpointed sink."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from psx_data_pipeline_spark.streaming.jobs import incremental_ingest

SCHEMA = T.StructType([
    T.StructField("symbol", T.StringType(), True),
    T.StructField("close", T.DoubleType(), True),
    T.StructField("trade_date", T.StringType(), True),
])


def _land(src, name, rows):
    (src / name).write_text("\n".join(json.dumps(r) for r in rows))


def test_incremental_ingest_is_exactly_once(spark, tmp_path):
    src = tmp_path / "landing"
    src.mkdir()
    sink = str(tmp_path / "ohlc")
    ckpt = str(tmp_path / "ckpt")

    _land(src, "d1.json", [
        {"symbol": "HBL", "close": 101.5, "trade_date": "2026-08-11"},
        {"symbol": "ENGRO", "close": 300.0, "trade_date": "2026-08-11"},
    ])
    incremental_ingest(spark, str(src), sink, ckpt, SCHEMA)

    # second scheduled run: one new file lands; d1 must not re-ingest
    _land(src, "d2.json", [
        {"symbol": "HBL", "close": 102.0, "trade_date": "2026-08-12"},
    ])
    incremental_ingest(spark, str(src), sink, ckpt, SCHEMA)
    # a third run with nothing new appends nothing
    incremental_ingest(spark, str(src), sink, ckpt, SCHEMA)

    got = sorted(
        tuple(r) for r in spark.read.schema(SCHEMA).parquet(sink).collect()
    )
    assert got == [
        ("ENGRO", 300.0, "2026-08-11"),
        ("HBL", 101.5, "2026-08-11"),
        ("HBL", 102.0, "2026-08-12"),
    ]


def test_streaming_sync_change_log_two_runs(spark, tmp_path):
    from psx_data_pipeline_spark.streaming.jobs import streaming_sync_change_log

    schema = T.StructType([
        T.StructField("symbol", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
    ])
    src = tmp_path / "snapshots"
    src.mkdir()
    universe = str(tmp_path / "universe")
    log = str(tmp_path / "changes")
    ckpt = str(tmp_path / "ckpt")

    _land(src, "run1.json", [
        {"symbol": "HBL", "name": "Habib Bank"},
        {"symbol": "LPL", "name": "Lalpir Power"},
    ])
    streaming_sync_change_log(spark, str(src), universe, log, ckpt, schema)
    # run 2: ENGRO appears, LPL disappears
    _land(src, "run2.json", [
        {"symbol": "HBL", "name": "Habib Bank"},
        {"symbol": "ENGRO", "name": "Engro Corp"},
    ])
    streaming_sync_change_log(spark, str(src), universe, log, ckpt, schema)

    lines = sorted(
        (r["change_type"], r["line"])
        for r in spark.read.parquet(log).collect()
    )
    assert lines == [
        ("ADDED", "+ ENGRO"),
        ("ADDED", "+ HBL"),
        ("ADDED", "+ LPL"),
        ("DELETED", "- LPL"),
    ]
    final = sorted(r["symbol"] for r in spark.read.parquet(universe).collect())
    assert final == ["ENGRO", "HBL"]


def test_user_totals_all_negative_event_ids(spark, tmp_path):
    """max_event_id must be the true (negative) maximum, not the 0
    state sentinel — the round-5 review finding: seeding the running
    max with 0 silently reported 0 for any user whose event_ids are
    all negative (and SUM/MAX-over-empty must still be NULL)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from psx_data_pipeline_spark.streaming.jobs import running_user_totals

    ts = dt.datetime(2024, 1, 1, 12, 0, 0)
    pq.write_table(
        pa.table({
            "event_id": pa.array([-5, -9, -2, None], type=pa.int64()),
            "ts": pa.array([ts] * 4, type=pa.timestamp("us")),
            "user_id": pa.array([1, 1, 2, 3], type=pa.int64()),
            "event_type": pa.array(["click"] * 4, type=pa.string()),
            "value": pa.array([1.0, 2.0, None, None], type=pa.float64()),
            "props": pa.array([None] * 4, type=pa.string()),
        }),
        str(tmp_path / "events.parquet"),
    )
    rows = {
        r["user_id"]: r
        for r in running_user_totals(spark, str(tmp_path)).collect()
    }
    assert rows[1]["max_event_id"] == -5      # max(-5, -9), not 0
    assert rows[2]["max_event_id"] == -2
    assert rows[2]["value_k"] is None         # SUM over no non-nulls
    assert rows[3]["max_event_id"] is None    # MAX over no non-nulls


def test_stream_constraint_audit_hostile_window(spark, tmp_path):
    """The windowed streaming audit counts NaN/Inf values, NULL
    user_ids, and unknown event types per hour — and NULL-ts rows
    belong to no window (same contract as the batch suite + the
    windowed-counts NULL-time finding)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from psx_data_pipeline_spark.streaming.jobs import (
        streaming_constraint_audit,
    )

    h0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    h1 = dt.datetime(2024, 1, 1, 13, 30, 0)
    pq.write_table(
        pa.table({
            "event_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
            "ts": pa.array([h0, h0, h1, h1, None], type=pa.timestamp("us")),
            "user_id": pa.array([1, None, 2, 3, 4], type=pa.int64()),
            "event_type": pa.array(
                ["click", "mystery", "view", None, "click"], type=pa.string()
            ),
            "value": pa.array(
                [1.0, float("nan"), float("inf"), None, 2.0],
                type=pa.float64(),
            ),
            "props": pa.array([None] * 5, type=pa.string()),
        }),
        str(tmp_path / "events.parquet"),
    )
    rows = streaming_constraint_audit(spark, str(tmp_path)).collect()
    got = {(r.win_start_us, r.rule_id): (r.n_checked, r.n_violations)
           for r in rows}
    w0 = int(h0.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    w1 = int(h1.replace(minute=0, tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    assert len(got) == 6  # 2 windows x 3 rules; the NULL-ts row in none
    assert got[(w0, "events.user_id.complete")] == (2, 1)
    assert got[(w0, "events.value.finite")] == (2, 1)        # NaN
    assert got[(w0, "events.event_type.in_set")] == (2, 1)   # mystery
    assert got[(w1, "events.user_id.complete")] == (2, 0)
    assert got[(w1, "events.value.finite")] == (2, 1)        # +inf
    assert got[(w1, "events.event_type.in_set")] == (2, 1)   # NULL type
