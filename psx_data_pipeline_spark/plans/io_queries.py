"""Sink/scan lifecycle queries — SURVEY.md §2 S8/S9/K1/K2/R4 under the
driver's oracle.

These rows were previously pytest-only (tests/test_io_roundtrip.py):
the driver's correctness harness is query-shaped, so sink behavior it
can't observe got the weaker check. Same move as the streaming jobs
(plans/stream.py): run the real write → read lifecycle inside the
query against a scratch directory, return the read-back, and let the
DuckDB oracle compare it value-for-value with the frame that was
written. Round-trip fidelity (types, header handling, the K1
projection, dated-partition selection, dynamic-overwrite idempotence)
becomes a hash-checked driver row.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psx_data_pipeline_spark.functions.numeric import dsum_sql
from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.scratch import scratch_dir
from psx_data_pipeline_spark.plans.ticker import _cur, _prev
from psx_data_pipeline_spark.sources.fixtures import load_table
from psx_data_pipeline_spark.sources.io import (
    read_snapshot_json,
    read_tickers_csv,
    read_partitioned_parquet,
    write_partitioned_parquet,
    write_snapshot_json,
    write_tickers_csv,
)

def _tickers(df: DataFrame) -> DataFrame:
    """String-typed ticker projection of the customer-derived snapshot
    — the persisted shape (io.TICKER_*_SCHEMA is all-string, like the
    reference's CSV/JSON round-trip)."""
    return df.select(
        F.col("symbol_id").cast("string").alias("symbol"),
        "name",
        "sector",
        F.concat(
            F.lit("https://dps.psx.com.pk/company/"),
            F.col("symbol_id").cast("string"),
        ).alias("url"),
    )


CSV_ROUNDTRIP_ORACLE = """
WITH cur AS (
  SELECT c_custkey AS symbol_id, c_name AS name, c_mktsegment AS sector
  FROM customer WHERE c_custkey % 7 <> 0
  UNION ALL
  SELECT c_custkey + 100000, c_name || ' ltd', c_mktsegment
  FROM customer WHERE c_custkey % 21 = 0 AND c_custkey % 5 <> 0
)
SELECT CAST(symbol_id AS VARCHAR) AS symbol, name, sector
FROM cur
"""


@query("csv_sink_roundtrip", CSV_ROUNDTRIP_ORACLE)
def q_csv_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 CSV sink + S8 CSV scan + R4 projection-on-write, end to end:
    the 4-column snapshot is written through the reference's 3-column
    CSV shape (url silently dropped at the sink, scrape_tickers.py:505)
    and read back with the explicit header schema. The oracle is the
    written frame MINUS the url column — the projection is observable
    in the result schema, and any header/quoting/null mangling in the
    round-trip breaks the value hash."""
    out = scratch_dir("csv_sink") + "/all_tickers"
    write_tickers_csv(_tickers(_cur(spark, sf_dir)), out)
    return read_tickers_csv(spark, out)


JSON_LATEST_ORACLE = """
WITH cur AS (
  SELECT c_custkey AS symbol_id, c_name AS name, c_mktsegment AS sector
  FROM customer WHERE c_custkey % 7 <> 0
  UNION ALL
  SELECT c_custkey + 100000, c_name || ' ltd', c_mktsegment
  FROM customer WHERE c_custkey % 21 = 0 AND c_custkey % 5 <> 0
)
SELECT CAST(symbol_id AS VARCHAR) AS symbol, name, sector,
       'https://dps.psx.com.pk/company/' || CAST(symbol_id AS VARCHAR) AS url
FROM cur
"""


@query("json_snapshot_latest", JSON_LATEST_ORACLE)
def q_json_snapshot_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 dated JSON snapshots + S9 JSON scan + S10 latest-snapshot
    selection, end to end: two dated snapshot directories are written
    (prev under 2024-01-01, cur under 2024-01-02), the base path is
    read back with partition discovery, and the LATEST snapshot is
    selected data-borne — max(snapshot_date) as a value, never file
    mtime (the reference's mtime scheme, update_ticker_info.py:54, is
    non-reproducible and forbidden per SURVEY.md §7.4). The oracle is
    exactly the second snapshot's rows."""
    base = scratch_dir("json_snap")
    write_snapshot_json(_tickers(_prev(spark, sf_dir)), base, "2024-01-01")
    write_snapshot_json(_tickers(_cur(spark, sf_dir)), base, "2024-01-02")
    snaps = read_snapshot_json(spark, base)  # partition col discovered
    latest = snaps.agg(F.max("snapshot_date").alias("d"))
    return (
        snaps.join(F.broadcast(latest), snaps.snapshot_date == latest.d)
        .select("symbol", "name", "sector", "url")
    )


PARTITIONED_OVERWRITE_ORACLE = JSON_LATEST_ORACLE


@query("partitioned_overwrite_idempotent", PARTITIONED_OVERWRITE_ORACLE)
def q_partitioned_overwrite_idempotent(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dynamic partition overwrite, proven idempotent: day-1 and day-2
    snapshots land in one partitioned parquet table, then the day-2
    write RE-RUNS — with dynamic overwrite it replaces only its own
    partition, so the re-run is a no-op to the table's content (static
    overwrite would have truncated day 1; append would have doubled
    day 2 — either corruption breaks the oracle hash). The read is
    partition-pruned to the latest day."""
    base = scratch_dir("part_parquet") + "/snapshots"
    prev = _tickers(_prev(spark, sf_dir)).withColumn(
        "snapshot_date", F.lit("2024-01-01")
    )
    cur = _tickers(_cur(spark, sf_dir)).withColumn(
        "snapshot_date", F.lit("2024-01-02")
    )
    write_partitioned_parquet(prev, base)
    write_partitioned_parquet(cur, base)
    write_partitioned_parquet(cur, base)  # idempotent re-run of day 2
    # explicit schema: an empty input writes ZERO files and the
    # schema-less read of the empty table would crash (probe finding)
    return read_partitioned_parquet(
        spark, base, "2024-01-02", schema=cur.schema
    ).select("symbol", "name", "sector", "url")

BUCKETED_JOIN_ORACLE = f"""
SELECT o_orderpriority,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


@query("bucketed_join", BUCKETED_JOIN_ORACLE)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB fact-fact join posture, driver-verified end to end:
    both join sides are WRITTEN bucketed by the join key (8 buckets,
    sorted within bucket), then joined as a sort-merge join whose
    exchange is satisfied by the bucket layout — the shuffle moved to
    ingest, once, and this and every later key-aligned join pays
    zero. tests/test_bucketed_join.py asserts the joined plan over
    these exact tables contains NO Exchange; the oracle checks the
    result equals the plain lineitem⋈orders aggregate, so the bucket
    routing provably loses/duplicates nothing. The merge hint (not a
    session-conf flip) keeps AQE from broadcasting the
    fixture-scale side — at production scale both sides are far past
    any broadcast threshold and SMJ is what the planner picks anyway.
    """
    from psx_data_pipeline_spark.functions.numeric import dsum

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderpriority"
    )
    base = scratch_dir("bucketed")
    for name, df, key in [
        ("li_bucketed_q", li, "l_orderkey"),
        ("orders_bucketed_q", orders, "o_orderkey"),
    ]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", f"{base}/{name}")
            .mode("overwrite")
            .saveAsTable(name)
        )
    joined = spark.table("li_bucketed_q").hint("merge").join(
        spark.table("orders_bucketed_q"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return joined.groupBy("o_orderpriority").agg(
        dsum(
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


SCHEMA_EVOLUTION_ORACLE = """
WITH cur AS (
  SELECT c_custkey AS symbol_id, c_name AS name, c_mktsegment AS sector
  FROM customer WHERE c_custkey % 7 <> 0
  UNION ALL
  SELECT c_custkey + 100000, c_name || ' ltd', c_mktsegment
  FROM customer WHERE c_custkey % 21 = 0 AND c_custkey % 5 <> 0
)
SELECT CAST(symbol_id AS VARCHAR) AS symbol, name, sector,
       CASE WHEN symbol_id % 2 = 0
            THEN CAST(length(name) AS BIGINT) END AS quality,
       (CASE WHEN symbol_id % 2 = 0
             THEN CAST(length(name) AS BIGINT) END) IS NOT NULL
         AS has_quality
FROM cur
"""


@query("schema_evolution", SCHEMA_EVOLUTION_ORACLE)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema evolution, end to end: generation-1 files are
    written WITHOUT the `quality` column (the even-keyed half gets it
    in generation 2 — a later pipeline version added a score), then
    the store is read as one table with mergeSchema, old rows
    surfacing NULL for the new column, and a `has_quality` flag
    derives from the data. This is the additive-column upgrade every
    long-lived 100 TB store goes through: no rewrite of old files, a
    footer-union schema at read time, and readers that must tolerate
    the NULL backfill. The oracle states the expected merged view
    directly, so a reader that dropped old rows, dropped the new
    column, or mistyped the backfill breaks the hash."""
    base = scratch_dir("schema_evo") + "/docs"
    snap = _tickers(_cur(spark, sf_dir)).drop("url").withColumn(
        "__k", F.col("symbol").cast("long")
    )
    gen1 = snap.where(F.col("__k") % 2 != 0).drop("__k")
    gen2 = snap.where(F.col("__k") % 2 == 0).drop("__k").withColumn(
        "quality", F.length("name").cast("long")
    )
    gen1.write.mode("overwrite").parquet(base + "/gen=1")
    gen2.write.mode("overwrite").parquet(base + "/gen=2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        base + "/gen=1", base + "/gen=2"
    )
    return merged.select(
        "symbol", "name", "sector", "quality",
        F.col("quality").isNotNull().alias("has_quality"),
    )


ORC_ROUNDTRIP_ORACLE = """
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
FROM orders WHERE o_orderkey % 3 = 0
"""


@query("orc_sink_roundtrip", ORC_ROUNDTRIP_ORACLE)
def q_orc_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC as the alternate columnar sink/scan: a TYPED projection
    (bigint key, string code, double measure, timestamp date) is
    written to ORC and read back from file metadata — unlike the CSV
    row (all-string by the reference's contract), this pins native
    type fidelity through a second columnar format. ORC carries the
    same pushdown/pruning machinery as parquet in Spark, so the
    choice is an interop decision, not a performance fork; the
    oracle reads the equivalent rows straight from the parquet
    fixture, so any type or timezone mangling in the ORC round-trip
    breaks the hash (session TZ is UTC on both engines)."""
    out = scratch_dir("orc_sink") + "/orders_orc"
    df = (
        load_table(spark, "orders", sf_dir)
        .where(F.col("o_orderkey") % 3 == 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    )
    df.write.mode("overwrite").orc(out)
    return spark.read.orc(out)
