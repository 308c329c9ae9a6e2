"""Decision-support join patterns beyond the repo's existing TPC-H
surface (pricing_summary/regional_revenue/...): the correlated-
aggregate join (Q17's "small-quantity orders" shape) and the
EXISTS semi-join rollup (Q4's "late orders" shape) — the two
remaining canonical fact-vs-derived-dimension compositions a
warehouse engine must plan well.

100 TB shapes: both touch the fact table a bounded number of times
and never shuffle it twice on the same key without reuse — the
correlated aggregate reduces lineitem to a PART-bounded statistics
table that broadcasts back onto the fact scan; the semi-join carries
only the order key + date through the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psx_data_pipeline_spark.functions.numeric import (
    MILLI_SQL,
    dsum,
    dsum_sql,
    milli,
)
from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_table

# --- Q17 shape: revenue locked in small-quantity orders ------------------------

# A lineitem is a "small order" when its quantity is below 20 % of
# the part's average quantity. The threshold compare stays exact in
# integers: q < sum_q / (5 * cnt)  <=>  5 * q_milli * cnt < sum_q_milli
# (q_milli = the TOTAL floor(1000·quantity) form — non-finite
# quantities become NULL, not an engine-dependent crash — restricted
# to positive).

SMALL_ORDER_REVENUE_ORACLE = f"""
WITH li AS (
  SELECT l_partkey,
         {MILLI_SQL.format('l_quantity')} AS q_milli,
         l_extendedprice
  FROM lineitem
  WHERE l_partkey IS NOT NULL
        AND {MILLI_SQL.format('l_quantity')} > 0
        AND l_extendedprice IS NOT NULL
),
stats AS (
  SELECT l_partkey, CAST(sum(q_milli) AS BIGINT) AS sum_q_milli,
         CAST(count(*) AS BIGINT) AS cnt
  FROM li GROUP BY l_partkey
),
small AS (
  SELECT p.p_brand, li.l_extendedprice
  FROM li
  JOIN stats s ON s.l_partkey = li.l_partkey
  JOIN part p ON p.p_partkey = li.l_partkey
  WHERE 5 * li.q_milli * s.cnt < s.sum_q_milli
)
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_small,
       CAST({dsum_sql('l_extendedprice')} / 7.0 AS DOUBLE) AS avg_yearly
FROM small GROUP BY p_brand
"""


@query("small_order_revenue", SMALL_ORDER_REVENUE_ORACLE)
def q_small_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per brand: the count and yearly-average revenue (sum/7, the Q17
    convention) locked in lineitems whose quantity is below 20 % of
    their part's average — the correlated-aggregate join expressed as
    aggregate-then-broadcast-back instead of a per-row subquery.
    The 20 % threshold is exact integer arithmetic on milli-quantized
    quantities (no rational division); revenue sums in exact decimal.

    Shape: ONE shuffle of lineitem (the per-part stats aggregate);
    the part-bounded stats and part dim broadcast back onto a second
    lineitem SCAN (no second exchange); final rollup is brand-bounded."""
    li = load_table(spark, "lineitem", sf_dir).where(
        F.col("l_partkey").isNotNull()
        & (milli("l_quantity") > 0)
        & F.col("l_extendedprice").isNotNull()
    ).select(
        "l_partkey",
        milli("l_quantity").alias("q_milli"),
        "l_extendedprice",
    )
    stats = li.groupBy("l_partkey").agg(
        F.sum("q_milli").cast("long").alias("sum_q_milli"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    ).withColumnRenamed("l_partkey", "s_partkey")
    part = F.broadcast(
        load_table(spark, "part", sf_dir).select("p_partkey", "p_brand")
    )
    small = (
        li.join(F.broadcast(stats), li["l_partkey"] == stats["s_partkey"])
        .where(
            5 * F.col("q_milli") * F.col("cnt") < F.col("sum_q_milli")
        )
        .join(part, li["l_partkey"] == part["p_partkey"])
    )
    return small.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_small"),
        (dsum("l_extendedprice") / F.lit(7.0))
        .cast("double").alias("avg_yearly"),
    )


# --- Q4 shape: order priorities with late shipments -----------------------------

_LATE_DAYS = 60

LATE_ORDER_PRIORITY_ORACLE = f"""
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o.o_orderdate IS NOT NULL AND EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate IS NOT NULL
        AND l.l_shipdate > o.o_orderdate + INTERVAL {_LATE_DAYS} DAY
)
GROUP BY o.o_orderpriority
"""


@query("late_order_priority", LATE_ORDER_PRIORITY_ORACLE)
def q_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order priority: how many orders had at least one lineitem
    shipped more than {_LATE_DAYS} days after the order date — the
    EXISTS rollup (Q4 shape) as a LEFT SEMI join whose non-equi late
    predicate rides the equi key, so each order is emitted at most
    once without a distinct.

    Shape: one equi-exchange on the order key carrying only
    (key, dates); the rollup is priority-bounded."""
    orders = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderdate").isNotNull()
    )
    li = load_table(spark, "lineitem", sf_dir).where(
        F.col("l_shipdate").isNotNull()
    ).select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (
            li["l_shipdate"]
            > orders["o_orderdate"] + F.expr(f"INTERVAL {_LATE_DAYS} DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
