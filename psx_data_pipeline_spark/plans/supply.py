"""Supply-chain analytics: the two classic TPC-H join shapes the
registry did not yet carry.

* Q5 (local supplier volume): the only TPC-H query whose join graph
  has TWO independent arms into the same dimension — the customer's
  nation and the supplier's nation — tied by an equality predicate
  between the arms. Getting this wrong (joining nation once and
  hoping) silently changes semantics; getting the plan wrong
  (treating the tie as a filter after a cartesian-ish join) is a
  scale killer. Reference parity: the reference has no multi-arm
  joins at all (its joins are the snapshot diffs of
  scrape_tickers.py); this is the north-star analytics extension.

* Q18 (large-volume orders): the find-heavy-entities-then-join-back
  shape — aggregate a fact table, keep the rare survivors over a
  threshold, and join the survivor keys back for detail. At 100 TB
  the survivor set is tiny by construction, so the detail join is a
  broadcast semi-join against keys, never a second full shuffle of
  the fact table.

100 TB notes: lineitem⋈orders is the one big-big join (shuffle or
bucket-co-located on the order key); customer, supplier, nation,
region are dimensions and ride as broadcasts. Revenue goes through
the exact DECIMAL(38,6) sum (functions/numeric.dsum) so partial-agg
order cannot diverge; quantities are exact milli ints.
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

# Q5 window: one calendar year inside the fixture's 1995-2001 span
_Q5_LO = "1996-01-01"
_Q5_HI = "1997-01-01"

TPCH_Q5_ORACLE = f"""
SELECT n.n_name AS nation,
       {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey
JOIN nation n    ON s.s_nationkey = n.n_nationkey
JOIN region r    ON n.n_regionkey = r.r_regionkey
WHERE c.c_nationkey = s.s_nationkey
  AND CAST(o.o_orderdate AS DATE) >= DATE '{_Q5_LO}'
  AND CAST(o.o_orderdate AS DATE) <  DATE '{_Q5_HI}'
GROUP BY n.n_name
"""


@query("tpch_q5_local_supply", TPCH_Q5_ORACLE)
def q_tpch_q5_local_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue by nation for LOCAL supply chains — order
    lines where the customer's nation equals the supplier's nation,
    within one order-date year. The nation tie is an equi-predicate
    between the two dimension arms, applied as soon as both keys are
    in scope (after the dim joins, before the rollup) so Catalyst
    keeps every join an equi hash join and pushes the date filter to
    the orders scan. Only the FIXED-cardinality dims (nation = 25,
    region = 5 rows at every SF) carry explicit broadcast hints;
    customer and supplier scale linearly with SF (customer is
    SF·150k rows), so their join strategy is left to AQE — at small
    SF it broadcasts them anyway, at 100 TB it degrades to a shuffle
    hash join instead of OOMing the driver on a forced broadcast.
    lineitem⋈orders is the one big-big join."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate").cast("date") >= F.lit(_Q5_LO).cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit(_Q5_HI).cast("date"))
    )
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .where(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return j.groupBy(F.col("n_name").alias("nation")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        ),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


# Q18 threshold: ~top 0.5 % of orders by total quantity at fixture
# scale — the "rare giants" the query is about
_Q18_QTY = 300

TPCH_Q18_ORACLE = f"""
WITH heavy AS (
  SELECT l_orderkey,
         CAST(sum({MILLI_SQL.format('l_quantity')}) AS BIGINT)
           AS qty_milli
  FROM lineitem
  GROUP BY l_orderkey
  HAVING sum({MILLI_SQL.format('l_quantity')}) > {_Q18_QTY} * 1000
)
SELECT c.c_custkey, o.o_orderkey,
       CAST(o.o_orderdate AS DATE) AS order_date,
       {dsum_sql('o.o_totalprice')} AS total_price,
       h.qty_milli
FROM heavy h
JOIN orders o   ON h.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, o.o_orderkey, CAST(o.o_orderdate AS DATE), h.qty_milli
"""


@query("tpch_q18_large_orders", TPCH_Q18_ORACLE)
def q_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total line quantity exceeds the
    threshold, with their customer and order detail. Phase 1 is a
    map-side-combinable per-order quantity rollup; the HAVING keeps
    rare survivors, so phase 2's detail joins run against a tiny key
    set (broadcast at any corpus size — the survivor cardinality is
    policy-bounded, not corpus-bounded). Quantities are exact milli
    ints; the price rides the DECIMAL(38,6) sum."""
    li = load_table(spark, "lineitem", sf_dir)
    heavy = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(milli("l_quantity")).cast("long").alias("qty_milli")
        )
        .where(F.col("qty_milli") > _Q18_QTY * 1000)
    )
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    j = (
        F.broadcast(heavy)
        .join(o, heavy.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
    )
    return j.groupBy(
        "c_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        "qty_milli",
    ).agg(dsum(F.col("o_totalprice")).alias("total_price")).select(
        "c_custkey", "o_orderkey", "order_date", "total_price", "qty_milli"
    )
