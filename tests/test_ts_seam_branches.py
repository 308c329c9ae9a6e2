"""Every branch of the type-adaptive event-time seam
(sources/fixtures.ts_us_expr) against DuckDB's epoch_us.

The live fixtures only exercise ONE branch at a time (timestamp_ntz
since round 3, int64-ns before that), so the canary test can't show a
latent bug in the inactive branches. Here each physical type is
written to a scratch parquet and the seam's epoch-µs is compared
row-for-row with what the oracle would compute over the same file —
including a deliberately non-UTC Spark session check for the NTZ
branch, the case where the naive cast silently shifts values.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from psx_data_pipeline_spark.sources.fixtures import ts_us_expr

# wall-clock instants covering fractional seconds, day boundaries,
# pre-epoch, and a leap day
_WALL = [
    dt.datetime(2024, 1, 1, 0, 9, 58, 778549),
    dt.datetime(2024, 2, 29, 23, 59, 59, 999999),
    dt.datetime(1969, 12, 31, 23, 0, 0, 5),
    dt.datetime(2031, 7, 4, 12, 0, 0, 0),
    dt.datetime(1970, 1, 1, 0, 0, 0, 0),
]
_EPOCH_US = [
    int((w - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)
    for w in _WALL
]
_IDS = list(range(len(_WALL)))


def _roundtrip(spark, tmp_path, arrow_type, values):
    path = str(tmp_path / "t.parquet")
    pq.write_table(
        pa.table({"event_id": pa.array(_IDS, pa.int64()),
                  "ts": pa.array(values, arrow_type)}),
        path,
    )
    df = spark.read.parquet(path)
    got = dict(
        df.select("event_id", ts_us_expr(df).alias("us")).collect()
    )
    want = dict(duckdb.sql(
        f"SELECT event_id, epoch_us(ts) FROM '{path}'"
    ).fetchall())
    return df.schema["ts"].dataType, got, want


def test_ntz_branch(spark, tmp_path):
    typ, got, want = _roundtrip(spark, tmp_path, pa.timestamp("us"), _WALL)
    assert isinstance(typ, T.TimestampNTZType)
    assert got == want == dict(zip(_IDS, _EPOCH_US))


def test_instant_branch(spark, tmp_path):
    typ, got, want = _roundtrip(
        spark, tmp_path, pa.timestamp("us", tz="UTC"), _EPOCH_US
    )
    assert isinstance(typ, T.TimestampType)
    assert got == want == dict(zip(_IDS, _EPOCH_US))


def test_int64_ns_branch(spark, tmp_path):
    # the rounds-1-2 contract: raw int64 nanoseconds surfaced as LONG
    ns = [us * 1000 for us in _EPOCH_US]
    path = str(tmp_path / "t.parquet")
    pq.write_table(
        pa.table({"event_id": pa.array(_IDS, pa.int64()),
                  "ts": pa.array(ns, pa.int64())}),
        path,
    )
    df = spark.read.parquet(path)
    assert isinstance(df.schema["ts"].dataType, T.LongType)
    got = dict(df.select("event_id", ts_us_expr(df).alias("us")).collect())
    assert got == dict(zip(_IDS, _EPOCH_US))


def test_unhandled_type_raises_diagnostic(spark):
    df = spark.createDataFrame([("x",)], "ts string")
    with pytest.raises(TypeError, match="unhandled type"):
        ts_us_expr(df)


def test_ntz_branch_is_session_timezone_independent(spark, tmp_path):
    """The core invariant: under a non-UTC session timezone the seam
    still matches DuckDB (the naive cast-to-timestamp would be off by
    the zone offset). Flips the SHARED fixture session's timezone for
    the duration of the test and restores it in the finally block —
    taking the fixture (rather than getActiveSession) both guarantees
    the session exists when this test runs alone and makes the
    dependency on the shared session explicit."""
    path = str(tmp_path / "t.parquet")
    pq.write_table(
        pa.table({"event_id": pa.array(_IDS, pa.int64()),
                  "ts": pa.array(_WALL, pa.timestamp("us"))}),
        path,
    )
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Karachi")
        df = spark.read.parquet(path)
        got = dict(
            df.select("event_id", ts_us_expr(df).alias("us")).collect()
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert got == dict(zip(_IDS, _EPOCH_US))