"""Round-8 batch 2 TPC-H shapes — the remaining classic patterns,
adapted to the fixture's columns where the generator lacks a column
(no phone/comment/partsupp; stand-ins are deterministic and noted
per query):

* Q8 market share: conditional aggregate INSIDE a group — one
  nation's revenue vs all revenue per year, customers scoped to one
  region. Both sides of the share ride the same scan; no second pass.
* Q13 customer distribution: LEFT join so zero-order customers
  survive with count 0, then a count-of-counts histogram — the
  two-level aggregation whose first level keys on the big side's
  key and whose second level is tiny by construction.
* Q14 promo share: single-row conditional rollup over one month.
* Q19 discounted revenue: the disjunctive (brand, size, quantity)
  predicate triple — Catalyst must still push the part-only
  disjuncts to the part scan and keep the join equi.
* Q22 sales opportunity: scalar-subquery threshold (the positive-
  balance floor-average, one broadcast row) + NOT EXISTS anti-join
  against orders, rolled up per nation.

100 TB notes: the only force-broadcast is Q22's single-row
threshold; every other small side is AQE's call (the round-8
broadcast-hint hygiene rule: never hint an SF-scaled table).
Exact-arithmetic conventions: revenues through DECIMAL(38,6) dsum;
Q22's balances as total centi-int floors with an integer floor-
average threshold, so no float mean ever crosses engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psx_data_pipeline_spark.functions.numeric import (
    CENTI_SQL,
    centi,
    dsum,
    dsum_sql,
)
from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_table

# Q8: supplier-nation market share inside one customer region
_Q8_NATION = "NATION_3"
_Q8_REGION = "EUROPE"
_Q8_LO = "1996-01-01"
_Q8_HI = "1998-01-01"

TPCH_Q8_ORACLE = f"""
SELECT CAST(year(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS o_year,
       {dsum_sql(f"CASE WHEN n1.n_name = '{_Q8_NATION}'"
                 " THEN l.l_extendedprice * (1 - l.l_discount)"
                 " ELSE 0 END")} AS nation_rev,
       {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS total_rev,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
JOIN region r   ON n2.n_regionkey = r.r_regionkey
WHERE r.r_name = '{_Q8_REGION}'
  AND CAST(o.o_orderdate AS DATE) >= DATE '{_Q8_LO}'
  AND CAST(o.o_orderdate AS DATE) <  DATE '{_Q8_HI}'
GROUP BY 1
"""


@query("tpch_q8_market_share", TPCH_Q8_ORACLE)
def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one supplier nation's revenue share per order year,
    customers scoped to one region. Numerator and denominator are
    the SAME aggregate pass (a CASE inside dsum), so the share costs
    one scan; both ride as exact DECIMAL(38,6) sums and the
    consumer divides (a cross-engine decimal division would add
    rounding-mode risk for zero informational gain)."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate").cast("date") >= F.lit(_Q8_LO).cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit(_Q8_HI).cast("date"))
    )
    s = load_table(spark, "supplier", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n1 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_regionkey").alias("n2_region"),
    )
    r = load_table(spark, "region", sf_dir).where(
        F.col("r_name") == _Q8_REGION
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"))
    )
    return j.groupBy(
        F.year(F.col("o_orderdate").cast("date")).cast("long").alias(
            "o_year"
        )
    ).agg(
        dsum(
            F.when(F.col("supp_nation") == _Q8_NATION, rev).otherwise(0)
        ).alias("nation_rev"),
        dsum(rev).alias("total_rev"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


# Q13: the classic excludes comment-matched "special" orders; the
# fixture has no comment column, so the deterministic stand-in
# exclusion is finished orders (o_orderstatus = 'F')
TPCH_Q13_ORACLE = """
WITH counts AS (
  SELECT c.c_custkey,
         CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderstatus <> 'F'
  WHERE c.c_custkey IS NOT NULL
  GROUP BY c.c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM counts GROUP BY c_count
"""


@query("tpch_q13_customer_distribution", TPCH_Q13_ORACLE)
def q_tpch_q13_customer_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q13: how many customers placed how many (non-excluded)
    orders — LEFT join keeps zero-order customers (count(key) over
    an all-NULL join group is 0, identically in both engines), then
    the count-of-counts histogram whose key space is bounded by the
    max per-customer order count, not the corpus."""
    c = load_table(spark, "customer", sf_dir).where(
        F.col("c_custkey").isNotNull()
    ).select("c_custkey")
    o = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderstatus") != "F"
    ).select("o_custkey", "o_orderkey")
    counts = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return counts.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


# Q14: promo revenue share of one ship YEAR (the classic's single
# month holds ~1 line at sf0.01 — a vacuous 100% share; the year
# window keeps both CASE branches live at every fixture scale)
_Q14_LO = "1996-01-01"
_Q14_HI = "1997-01-01"

TPCH_Q14_ORACLE = f"""
SELECT {dsum_sql("CASE WHEN p.p_type = 'PROMO'"
                 " THEN l.l_extendedprice * (1 - l.l_discount)"
                 " ELSE 0 END")} AS promo_rev,
       {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS total_rev,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE CAST(l.l_shipdate AS DATE) >= DATE '{_Q14_LO}'
  AND CAST(l.l_shipdate AS DATE) <  DATE '{_Q14_HI}'
"""


@query("tpch_q14_promo_share", TPCH_Q14_ORACLE)
def q_tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo-class revenue share of one ship year — a
    single-row conditional rollup; the date filter prunes at the
    lineitem scan before the part join."""
    li = load_table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate").cast("date") >= F.lit(_Q14_LO).cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit(_Q14_HI).cast("date"))
    )
    p = load_table(spark, "part", sf_dir).select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            dsum(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(0)
            ).alias("promo_rev"),
            dsum(rev).alias("total_rev"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


# Q19: three disjunctive (brand, size-band, quantity-band) clauses
_Q19_CLAUSES = [
    ("Brand#12", 1, 5, 1.0, 11.0),
    ("Brand#23", 1, 10, 10.0, 20.0),
    # Brand#24, not the classic Brand#34: no fixture part has
    # Brand#34, which left the third disjunct VACUOUS under the
    # sf0.01 oracle gate (round-8 review find; the non-vacuity
    # principle applies to disjuncts too)
    ("Brand#24", 1, 15, 20.0, 30.0),
]


def _q19_sql_pred() -> str:
    parts = [
        f"(p.p_brand = '{b}' AND p.p_size BETWEEN {s_lo} AND {s_hi}"
        f" AND l.l_quantity BETWEEN {q_lo} AND {q_hi})"
        for b, s_lo, s_hi, q_lo, q_hi in _Q19_CLAUSES
    ]
    return " OR ".join(parts)


TPCH_Q19_ORACLE = f"""
SELECT {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE {_q19_sql_pred()}
"""


@query("tpch_q19_discounted_revenue", TPCH_Q19_ORACLE)
def q_tpch_q19_discounted_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q19: revenue under an OR of (brand, size, quantity)
    clause triples. The disjunction mixes part-side and line-side
    columns, but Catalyst derives the part-only envelope (brand IN
    the three values, size <= the max band) and pushes it to the
    part scan, keeping the join equi with the full disjunction as
    the post-join filter. BETWEEN is false for NULL and NaN in both
    engines (the hostile-events convention), so the predicate is
    total."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, "part", sf_dir).select(
        "p_partkey", "p_brand", "p_size"
    )
    clause = None
    for b, s_lo, s_hi, q_lo, q_hi in _Q19_CLAUSES:
        c = (
            (F.col("p_brand") == b)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )
        clause = c if clause is None else (clause | c)
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .where(clause)
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


# Q22: the classic keys on phone country codes; the fixture stand-in
# is the nation key itself. Balances ride as total centi-int floors
# (exact, NULL for non-finite) and the threshold is the integer
# floor-average of positive balances — no float mean crosses engines.
_Q22_NATIONS = (0, 3, 7, 11, 17, 21, 24)


TPCH_Q22_ORACLE = f"""
WITH bal AS (
  SELECT c_custkey, c_nationkey,
         {CENTI_SQL.format('c_acctbal')} AS bal_centi
  FROM customer WHERE c_custkey IS NOT NULL
),
thr AS (
  SELECT CAST(sum(bal_centi) AS BIGINT) // count(*) AS avg_centi
  FROM bal WHERE bal_centi > 0
)
SELECT CAST(b.c_nationkey AS BIGINT) AS nationkey,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(b.bal_centi) AS BIGINT) AS total_bal_centi
FROM bal b, thr
WHERE b.c_nationkey IN {_Q22_NATIONS}
  AND b.bal_centi > thr.avg_centi
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = b.c_custkey)
GROUP BY 1
"""


@query("tpch_q22_sales_opportunity", TPCH_Q22_ORACLE)
def q_tpch_q22_sales_opportunity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q22: well-funded customers in target nations who never
    ordered — the scalar-subquery threshold rides as ONE broadcast
    row (cross join; whitelisted bounded broadcast), the "never
    ordered" is a left-anti join on the customer key, and the
    rollup is nation-bounded."""
    bal = (
        load_table(spark, "customer", sf_dir)
        .where(F.col("c_custkey").isNotNull())
        .select(
            "c_custkey",
            "c_nationkey",
            centi("c_acctbal").alias("bal_centi"),
        )
    )
    thr = (
        bal.where(F.col("bal_centi") > 0)
        .agg(
            F.expr(
                "CAST(sum(bal_centi) AS BIGINT) div count(*)"
            ).alias("avg_centi")
        )
    )
    o = load_table(spark, "orders", sf_dir).select("o_custkey")
    cand = (
        bal.where(F.col("c_nationkey").isin(list(_Q22_NATIONS)))
        .crossJoin(F.broadcast(thr))
        .where(F.col("bal_centi") > F.col("avg_centi"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return cand.groupBy(
        F.col("c_nationkey").cast("long").alias("nationkey")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("numcust"),
        F.sum("bal_centi").cast("long").alias("total_bal_centi"),
    )
