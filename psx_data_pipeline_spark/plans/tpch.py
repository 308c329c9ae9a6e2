"""TPC-H-style relational queries over the driver fixture tables.

These exercise the SURVEY.md §2 relational core (filter, project,
group-agg, joins, sort/top-k) on the star schema the driver checks
against DuckDB. Each query is pure DataFrame API — Catalyst handles
predicate pushdown / column pruning / broadcast selection; AQE picks
shuffle-partition counts at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psx_data_pipeline_spark.functions.numeric import davg, davg_sql, dsum, dsum_sql
from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_table, load_table_parallel


Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {dsum_sql('l_quantity')} AS sum_qty,
  {dsum_sql('l_extendedprice')} AS sum_base_price,
  {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
  {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
  {davg_sql('l_quantity')} AS avg_qty,
  {davg_sql('l_extendedprice')} AS avg_price,
  {davg_sql('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("pricing_summary", Q1_ORACLE)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan-filter-aggregate with 8 aggregates.

    Scale notes: single shuffle on two low-cardinality keys with
    map-side partial aggregation; filter and 7-column projection push
    into the parquet scan (verified via explain — PushedFilters +
    ReadSchema). The fixture lineitem is ONE single-row-group file, so
    the scan-side partial aggregation (the expensive half of Q1) is
    spread across cores first — round-robin, NOT keyed, because the
    two group keys have cardinality 6; a no-op on real multi-file
    input.
    """
    li = load_table_parallel(spark, "lineitem", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- correlated scalar subquery via the SQL front door ----------------------

# the decimal cast is gated BETWEEN ±1e24 (the dsum total-form
# convention): a NaN/Inf balance would crash the cast in BOTH engines
# — same SQL text, but a crash is still a crash; the gate NULLs it
# out of the sum and the COUNT alike, so the average is over finite
# balances only
_ABOVE_AVG_SQL = """
SELECT c_custkey, c_acctbal, c_mktsegment
FROM {table} c
WHERE c_acctbal > (
  SELECT CAST(SUM(CAST(
           CASE WHEN c2.c_acctbal BETWEEN -1e24 AND 1e24
                THEN c2.c_acctbal END AS DECIMAL(38,6))) AS DOUBLE)
         / COUNT(CASE WHEN c2.c_acctbal BETWEEN -1e24 AND 1e24
                      THEN c2.c_acctbal END)
  FROM {table} c2
  WHERE c2.c_mktsegment = c.c_mktsegment
)
"""

ABOVE_AVG_ORACLE = _ABOVE_AVG_SQL.format(table="customer")


@query("above_segment_avg", ABOVE_AVG_ORACLE)
def q_above_segment_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above their segment's average balance, written as a
    CORRELATED scalar subquery through spark.sql — Catalyst
    decorrelates it into an aggregate + join (no per-row re-execution;
    check the plan for a single Aggregate feeding a join). The
    segment average goes through exact decimal so the > boundary is
    engine-identical. Oracle: the very same SQL text."""
    load_table(spark, "customer", sf_dir).createOrReplaceTempView(
        "customer_v"
    )
    return spark.sql(_ABOVE_AVG_SQL.format(table="customer_v"))
