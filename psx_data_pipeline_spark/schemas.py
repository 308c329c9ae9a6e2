"""Explicit schemas for every table the engine touches.

The reference's shape is fixed-by-convention (dict literals at
reference scrape_tickers.py:99-104, CSV header at :505); here every
table gets an explicit StructType (SURVEY.md §1.2). Sentinel values
("Unknown", "No record found", "") are normalized to real NULLs at
the ingestion boundary; reference-parity views re-materialize them
via coalesce.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- domain tables (reference parity) -------------------------------------

# Ticker record: reference scrape_tickers.py:99-104 builds
# {symbol, name, sector, url}; snapshot_date added for data-borne
# versioning (replaces mtime-based latest-file selection,
# reference update_ticker_info.py:54).
TICKERS = T.StructType([
    T.StructField("symbol", T.StringType(), False),
    T.StructField("name", T.StringType(), True),
    T.StructField("sector", T.StringType(), True),
    T.StructField("url", T.StringType(), True),
    T.StructField("snapshot_date", T.DateType(), True),
])

# Change log: typed form of the append-only +/-/* blocks written at
# reference scrape_tickers.py:548-566.
TICKER_CHANGES = T.StructType([
    T.StructField("change_ts", T.TimestampType(), True),
    T.StructField("change_type", T.StringType(), False),  # ADDED/DELETED/RENAMED
    T.StructField("old_symbol", T.StringType(), True),
    T.StructField("new_symbol", T.StringType(), True),
])

# OHLC time series: the reference's planned Phases 3-4
# (reference README.md:6, :62-71) — one tall table, never
# file-per-ticker.
OHLC = T.StructType([
    T.StructField("symbol", T.StringType(), False),
    T.StructField("trade_date", T.DateType(), False),
    T.StructField("open", T.DoubleType(), True),
    T.StructField("high", T.DoubleType(), True),
    T.StructField("low", T.DoubleType(), True),
    T.StructField("close", T.DoubleType(), True),
    T.StructField("volume", T.LongType(), True),
])

# --- driver fixture tables (/root/testdata, TESTDATA.md) -------------------

FIXTURE_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Sentinels used by the reference (scrape_tickers.py:101-102,
# update_ticker_info.py:142,172,175) — the ingest layer maps these
# to NULL, parity views map NULL back.
SENTINEL_NAME = "No record found"
SENTINEL_SECTOR = "Unknown"
SENTINEL_URL = ""
