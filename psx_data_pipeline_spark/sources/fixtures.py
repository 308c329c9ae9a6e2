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

from pyspark.sql import DataFrame, SparkSession

from psx_data_pipeline_spark.schemas import FIXTURE_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Read one fixture table (parquet scan, schema from footer).

    ``events.ts`` is written as TIMESTAMP(NANOS), which Spark rejects
    by default — the legacy conf surfaces it as int64 nanoseconds.
    Oracle SQL reads the same values via DuckDB's epoch_ns().

    SIDE EFFECT (deliberate, documented): this sets
    ``spark.sql.legacy.parquet.nanosAsLong=true`` on the CALLER's
    session and leaves it set — required because the driver runs
    queries under its own session, not session.get_spark (which also
    sets it at build time). Any nanos-timestamp parquet read in the
    same session will likewise surface int64 ns instead of erroring.
    """
    sf_dir = sf_dir or DEFAULT_SF_DIR
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_table_parallel(
    spark: SparkSession, name: str, sf_dir: str | None = None, key: str | None = None
) -> DataFrame:
    """Like load_table, but repartitioned to the session's default
    parallelism (hashed on ``key`` when given, so a following
    groupBy(key) needs no second exchange).

    The fixture tables arrive as ONE parquet file — a single input
    split — so any expensive per-row expression (shingling, hashing)
    would otherwise run on one core. On a cluster reading many files
    this repartition is a no-op to correctness and simply re-spreads
    skewed input splits before CPU-heavy map work.
    """
    df = load_table(spark, name, sf_dir)
    par = spark.sparkContext.defaultParallelism
    return df.repartition(par, key) if key else df.repartition(par)


def load_all(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    """Read every fixture table; also registers each as a temp view so
    SQL-form operators can refer to them by name."""
    out: dict[str, DataFrame] = {}
    for name in FIXTURE_TABLES:
        df = load_table(spark, name, sf_dir)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
