"""CSV/JSON snapshot readers and sinks (SURVEY.md §2 S8/S9/K1/K2).

The reference persists its universe as a rolling 3-column CSV
(scrape_tickers.py:492-514, header fieldnames :505 — note the url
column is silently dropped) and dated JSON snapshots
(update_ticker_info.py:213-235, run_pipeline.py:49-53), reading them
back with header-inferred all-string columns (scrape_tickers.py:465-489,
update_ticker_info.py:62-81). Here every read carries an explicit
schema (never inference), the canonical record keeps all four
columns, and the 3-column CSV shape is a projection applied at the
sink — the reference's two persisted shapes become one schema + one
view.

Snapshots are written under ``snapshot_date=YYYY-MM-DD`` directories:
data-borne versioning (partition pruning selects the latest), never
file mtime (reference update_ticker_info.py:54, forbidden per
SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# The persisted ticker-record schema: all strings, like the
# reference's CSV/JSON round-trip, with nullable metadata columns.
TICKER_CSV_SCHEMA = T.StructType([
    T.StructField("symbol", T.StringType(), False),
    T.StructField("name", T.StringType(), True),
    T.StructField("sector", T.StringType(), True),
])

TICKER_JSON_SCHEMA = T.StructType([
    T.StructField("symbol", T.StringType(), False),
    T.StructField("name", T.StringType(), True),
    T.StructField("sector", T.StringType(), True),
    T.StructField("url", T.StringType(), True),
])

CSV_COLUMNS = ["symbol", "name", "sector"]  # reference fieldnames :505


def read_tickers_csv(spark: SparkSession, path: str) -> DataFrame:
    """S8: header CSV scan with an explicit schema (no inference).

    nullValue is a sentinel no ticker field contains, so an UNQUOTED
    empty field reads back as NULL while a QUOTED "" reads back as
    the empty string — the exact distinction the writer emits (see
    write_tickers_csv). One documented unfaithful point: a data value
    that IS the literal sentinel would read back as NULL; the
    reference's csv module cannot represent None at all (round-trips
    it as ''), so this round-trip is strictly more faithful."""
    return (
        spark.read.schema(TICKER_CSV_SCHEMA)
        .option("header", True)
        .option("nullValue", "\\N")
        .csv(path)
    )


def write_tickers_csv(df: DataFrame, path: str) -> None:
    """K1: overwrite CSV sink with the reference's 3-column
    projection — the url drop is a view at the sink, not a schema.

    A sink must not mutate values: Spark's CSV writer TRIMS cell
    whitespace by default (univocity ignoreLeading/TrailingWhiteSpace
    default true on write), which silently corrupted names like
    '  padded name  ' — invisible until the round-10 hostile-ticker
    probe salted the snapshot with whitespace-edged names. Both trim
    options are forced off; empty strings stay distinguishable from
    NULL because the writer emits the SAME sentinel the reader
    decodes (nullValue pinned explicitly on BOTH sides) while ''
    writes as a quoted pair — the round-trip no longer leans on any
    Spark default for unquoted-empty fields.

    coalesce(1): the ticker universe is domain-bounded (thousands of
    listed companies at ANY corpus scale), so one file is the right
    layout — the session's 32 shuffle partitions otherwise fan a
    kilobyte table into 32 files per run. The at-scale sink is
    write_partitioned_parquet, which stays parallel."""
    df.select(*CSV_COLUMNS).coalesce(1).write.mode("overwrite").option(
        "header", True
    ).option("ignoreLeadingWhiteSpace", False).option(
        "ignoreTrailingWhiteSpace", False
    ).option("nullValue", "\\N").csv(path)


def read_snapshot_json(spark: SparkSession, path: str) -> DataFrame:
    """S9: JSON-lines snapshot scan with an explicit schema."""
    return spark.read.schema(TICKER_JSON_SCHEMA).json(path)


def write_snapshot_json(df: DataFrame, base_path: str, snapshot_date: str) -> str:
    """K2: dated JSON snapshot — one ``snapshot_date=...`` directory
    per run; returns the written path."""
    path = f"{base_path}/snapshot_date={snapshot_date}"
    # coalesce(1): universe-bounded table (see write_tickers_csv)
    df.select([f.name for f in TICKER_JSON_SCHEMA]).coalesce(1).write.mode(
        "overwrite"
    ).json(path)
    return path


CHANGE_LOG_SCHEMA = T.StructType([
    T.StructField("change_ts", T.TimestampType(), False),
    T.StructField("change_type", T.StringType(), False),
    T.StructField("line", T.StringType(), False),
])


def append_change_log(df: DataFrame, path: str) -> None:
    """K3: append-only change-log sink (reference scrape_tickers.py
    :517-571 appends timestamped +/-/* blocks to ticker_changes.log).

    ``mode("append")`` parquet — each sync run adds files, never
    rewrites history; the presentation `+/-/*` line is a stored
    column (the `change_log_format` view), the typed columns stay
    queryable. coalesce(1): one file per run — the log is the day's
    churn, and an append-only sink otherwise ACCUMULATES 32 kilobyte
    files per run forever (the small-files problem compounding)."""
    df.select([f.name for f in CHANGE_LOG_SCHEMA]).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def read_change_log(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(CHANGE_LOG_SCHEMA).parquet(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_col: str = "snapshot_date"
) -> None:
    """Partitioned parquet sink with DYNAMIC partition overwrite: a
    re-run replaces only the partitions present in ``df``, leaving
    every other partition untouched — the idempotent daily-append /
    backfill pattern (re-running one day can never clobber history,
    unlike static overwrite which truncates the whole table). This is
    the at-scale successor of the dated-directory JSON sink (K2): one
    table, partition-pruned reads, per-partition idempotent writes."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )


def read_partitioned_parquet(
    spark: SparkSession, path: str, snapshot_date: str | None = None,
    schema=None,
) -> DataFrame:
    """Partition-pruned read: the ``snapshot_date`` filter is resolved
    against directory names (PartitionFilters in the scan — zero data
    files of other partitions are opened). Pass ``schema`` (the
    writer's schema + the partition column) when the table may hold
    ZERO files — a dynamic-partition overwrite of an empty input
    writes nothing, and a schema-less read of the empty directory
    raises UNABLE_TO_INFER_SCHEMA (round-8 empty-corpus probe)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(path)
    if snapshot_date is not None:
        df = df.where(df.snapshot_date == snapshot_date)
    return df
