"""Readers for the driver-generated parquet fixture tables.

The reference reads its snapshots from CSV/JSON with header-inferred
all-string columns (reference scrape_tickers.py:465-489,
update_ticker_info.py:62-81); here every read is a parquet scan with
the schema carried by the file — columnar, predicate-pushdown- and
column-pruning-friendly. At cluster scale these paths are object-store
URIs; nothing else changes.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from psx_data_pipeline_spark.schemas import FIXTURE_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Read one fixture table (parquet scan, schema from footer)."""
    sf_dir = sf_dir or DEFAULT_SF_DIR
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Epoch-microseconds from a TIMESTAMP_NTZ column WITHOUT any session-
# timezone dependence: NTZ carries a wall-clock value, and the DuckDB
# oracle's epoch_us(ts) treats that wall clock as UTC directly. The
# tempting `unix_micros(cast({c} as timestamp))` (and equally
# `to_utc_timestamp`) first reinterprets the wall clock in the
# SESSION timezone — correct only when that happens to be UTC — so
# the conversion is done on the calendar fields instead, which are
# timezone-free by construction. date_part('SECOND') is DECIMAL(8,6);
# ×1e6 is exact, the bigint cast loses nothing.
_NTZ_EPOCH_US = (
    "unix_date(cast({c} as date)) * 86400000000"  # int × bigint literal
    " + cast(hour({c}) * 3600 + minute({c}) * 60 as bigint) * 1000000"
    " + cast(date_part('SECOND', {c}) * 1000000 as bigint)"
)


def ts_us_expr(df: DataFrame, col: str = "ts") -> Column:
    """Epoch-µs column from whatever physical type the fixture writer
    used for ``col`` — the single type-adaptive seam for event time.

    The fixtures have shipped ``events.ts`` as int64 TIMESTAMP(NANOS)
    (rounds 1-2) and as timestamp[us] / TIMESTAMP_NTZ (round 3+);
    every consumer goes through this seam so a future flip (either
    direction, or to instant-typed TIMESTAMP) is a no-op here and
    everywhere downstream. Matches the oracle's epoch_us(ts) under
    all three physical types and any session timezone.
    """
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):  # legacy int64 nanoseconds
        return F.expr(f"{col} div 1000")
    if isinstance(dt, T.TimestampNTZType):
        return F.expr(_NTZ_EPOCH_US.format(c=col))
    if isinstance(dt, T.TimestampType):  # instant-typed: unix_micros is tz-free
        return F.unix_micros(F.col(col))
    raise TypeError(
        f"fixture column {col!r} has unhandled type {dt.simpleString()}; "
        "expected int64-ns, timestamp_ntz, or timestamp "
        "(update ts_us_expr in sources/fixtures.py)"
    )


def load_events(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """The events table with a derived ``ts_us`` (epoch-µs BIGINT)
    column — the canonical event-time representation every batch
    consumer works in (streaming/jobs.events_stream derives the same
    column for the streaming path)."""
    ev = load_table(spark, "events", sf_dir)
    return ev.withColumn("ts_us", ts_us_expr(ev))


_SCAN_PAR_MEMO: dict = {}  # (table, sf_dir, par) -> scan already parallel?


def load_table_parallel(
    spark: SparkSession, name: str, sf_dir: str | None = None, key: str | None = None
) -> DataFrame:
    """Like load_table, but repartitioned to the session's default
    parallelism (hashed on ``key`` when given, so a following
    groupBy(key) needs no second exchange).

    The fixture tables arrive as ONE parquet file — a single input
    split — so any expensive per-row expression (shingling, hashing)
    would otherwise run on one core. The keyless spread is GATED on
    the scan actually being under-parallel: on a cluster reading
    many files the scan already yields >= defaultParallelism splits
    and a blanket round-robin repartition would be a full-data
    exchange bought for nothing. The keyed form always repartitions —
    it pre-aligns the data with a following groupBy/join on ``key``,
    replacing that operator's exchange rather than adding one.
    """
    df = load_table(spark, name, sf_dir)
    par = spark.sparkContext.defaultParallelism
    if key:
        return df.repartition(par, key)
    # the gate probe (.rdd.getNumPartitions()) compiles a physical
    # plan — ~0.1 s per call, so the verdict is memoized per table
    # path (the file layout does not change mid-session)
    memo_key = (name, sf_dir, par)
    if memo_key not in _SCAN_PAR_MEMO:
        _SCAN_PAR_MEMO[memo_key] = df.rdd.getNumPartitions() >= par
    if _SCAN_PAR_MEMO[memo_key]:
        return df
    return df.repartition(par)


def load_all(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    """Read every fixture table; also registers each as a temp view so
    SQL-form operators can refer to them by name."""
    out: dict[str, DataFrame] = {}
    for name in FIXTURE_TABLES:
        df = load_table(spark, name, sf_dir)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
