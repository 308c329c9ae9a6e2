"""Round-8 batch 3 — the last six classic TPC-H shapes the registry
was missing, adapted to the fixture's columns where the generator
lacks one (no l_shipmode/l_commitdate/l_receiptdate, no partsupp;
stand-ins are deterministic and noted per query):

* Q6 forecast revenue: the pure scan-aggregate — every predicate is
  scan-pushable, zero joins, one partial-agg row per partition. The
  plan IS the benchmark of predicate pushdown.
* Q9 product profit: the widest join tree in the classic suite
  (lineitem x part x orders x supplier x nation) with a computed
  profit measure; supply cost stands in as a fixed fraction of
  p_retailprice (no partsupp table).
* Q11 important parts: group-level HAVING against a GLOBAL scalar
  (sum-of-groups threshold) — the classic "fraction of the whole"
  shape; value stands in as lineitem revenue (no partsupp).
* Q12 lateness-vs-priority: the CASE-counting pivot; the fixture has
  no ship modes, so the band key is the DATA-BORNE ship lag bucket
  (<=30 / <=90 / else days from order to ship).
* Q15 top supplier: aggregate -> global argmax -> equality join
  back — max-revenue supplier(s) with exact integer revenue so ties
  are deterministic, not float-fuzzy.
* Q20 surplus suppliers: the nested correlated-aggregate threshold —
  suppliers carrying more than a 1/8 share of any 'small %' part's
  shipped volume (stand-in for the availqty-vs-shipped test).

100 TB notes: Q6 is a single scan with full pushdown; Q9's only
force-broadcast is the 25-row nation dim (SF-scaled sides are AQE's
call per the round-8 hint-hygiene rule); Q11/Q15 carry their global
scalar as ONE broadcast row (Q22's whitelisted shape); Q20 derives
the per-part total FROM the per-(part,supplier) rollup so the fact
shuffles once on the pair key and the part-total join is co-located
on the part key.

Exactness: revenues/profits sum through DECIMAL(38,6) dsum; Q11/Q15
compare centi-int floors whose rollups sum through DECIMAL(38,0)
bsum (total-form BIGINT cast — NULL beyond int64 in BOTH engines,
never wrap-vs-raise); Q20 compares milli-int quantity shares via
a truncating integer div of the part total (overflow-free where a x8
multiply on the pair sum is not), so no rational division ever
crosses engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from psx_data_pipeline_spark.functions.numeric import (
    CENTI_SQL,
    MILLI_SQL,
    bsum,
    bsum_sql,
    dsum,
    dsum_sql,
    milli,
)
from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_table

# --- Q6: forecast revenue change -----------------------------------------------

_Q6_LO = "1996-01-01"
_Q6_HI = "1997-01-01"
_Q6_DISC_LO = 0.05
_Q6_DISC_HI = 0.07
_Q6_QTY = 24

TPCH_Q6_ORACLE = f"""
SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '{_Q6_LO}'
  AND CAST(l_shipdate AS DATE) <  DATE '{_Q6_HI}'
  AND l_discount BETWEEN {_Q6_DISC_LO} AND {_Q6_DISC_HI}
  AND l_quantity < {_Q6_QTY}
"""


@query("tpch_q6_forecast_revenue", TPCH_Q6_ORACLE)
def q_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue that would be recovered by dropping a
    discount band for small-quantity lines in one ship year — the
    canonical pure scan-aggregate. Every predicate (date range,
    discount band, quantity cap) reaches the parquet scan as a pushed
    filter; there is no join and the aggregate is a single row built
    from map-side partials. BETWEEN and < are false for NULL and NaN
    in both engines, so the predicate set is total."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.where(
            (F.col("l_shipdate").cast("date") >= F.lit(_Q6_LO).cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit(_Q6_HI).cast("date"))
            & F.col("l_discount").between(_Q6_DISC_LO, _Q6_DISC_HI)
            & (F.col("l_quantity") < _Q6_QTY)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue"
            ),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


# --- Q9: product-type profit ----------------------------------------------------

# The classic charges ps_supplycost * l_quantity against revenue; the
# fixture has no partsupp, so cost stands in as 60 % of the part's
# retail price per unit — deterministic, part-borne, and it keeps the
# profit expression's sign mixed on the fixture (both profitable and
# loss-making lines exist).
_Q9_COST_FRACTION = 0.6
_Q9_NAME_PREFIX = "red "

TPCH_Q9_ORACLE = f"""
SELECT n.n_name AS supp_nation,
       CAST(year(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS o_year,
       {dsum_sql('l.l_extendedprice * (1 - l.l_discount)'
                 f' - {_Q9_COST_FRACTION} * p.p_retailprice * l.l_quantity')}
         AS profit,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '{_Q9_NAME_PREFIX}%' AND o.o_orderdate IS NOT NULL
GROUP BY 1, 2
"""


@query("tpch_q9_product_profit", TPCH_Q9_ORACLE)
def q_tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit on one product family per (supplier nation,
    order year). The name-prefix filter prunes the part scan BEFORE
    the fact join, the 25-row nation dim is the only force-broadcast
    (fixed cardinality), and the profit expression is evaluated in
    double with the same association order both engines use before
    the exact-decimal sum gates it."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).where(
        F.col("p_name").startswith(_Q9_NAME_PREFIX)
    ).select("p_partkey", "p_retailprice")
    o = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderdate").isNotNull()
    ).select("o_orderkey", "o_orderdate")
    s = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_nationkey"
    )
    n = load_table(spark, "nation", sf_dir).select(
        "n_nationkey", F.col("n_name").alias("supp_nation")
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(_Q9_COST_FRACTION)
        * F.col("p_retailprice")
        * F.col("l_quantity")
    )
    j = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return j.groupBy(
        "supp_nation",
        F.year(F.col("o_orderdate").cast("date")).cast("long").alias(
            "o_year"
        ),
    ).agg(
        dsum(profit).alias("profit"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


# --- Q11: important parts (group sum vs global-fraction threshold) --------------

# The classic flags partsupp value above FRACTION of the national
# total; the stand-in value is the part's lineitem revenue and the
# threshold is 1/1500 of the whole corpus's revenue (129 of 2000
# fixture parts clear it — both HAVING branches live). The share
# naturally thins as SF grows (more parts per fixed fraction), same
# as the classic's SF-scaled fraction.
_Q11_DENOM = 1500

TPCH_Q11_ORACLE = f"""
WITH v AS (
  SELECT l_partkey,
         {bsum_sql(CENTI_SQL.format('l_extendedprice'))} AS val_centi
  FROM lineitem WHERE l_partkey IS NOT NULL
  GROUP BY l_partkey
),
t AS (
  SELECT {bsum_sql('val_centi')} // {_Q11_DENOM} AS thr FROM v
)
SELECT v.l_partkey AS partkey, v.val_centi
FROM v CROSS JOIN t
WHERE v.val_centi > t.thr
"""


@query("tpch_q11_important_parts", TPCH_Q11_ORACLE)
def q_tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose revenue exceeds a fixed fraction of the
    corpus total — the group-level HAVING against a GLOBAL scalar.
    One shuffle builds the per-part rollup; the corpus total is the
    SUM OF THE GROUP SUMS (no second fact scan) and rides back as one
    broadcast row; the threshold compare is integer (centi floors,
    truncating div — DuckDB ``//`` and Spark ``div`` both truncate
    toward zero, verified for NEGATIVE totals too, e.g. -1501//1500
    = -1 in both, so an all-negative-revenue corpus — the generative
    fuzz drives this — stays cross-engine identical). Both sum
    levels run through bsum's DECIMAL(38,0) (round-8 advice find: a
    plain long sum of gated centi terms has only ~10^4 worst-case
    rows of headroom before non-ANSI Spark wraps where DuckDB
    raises); the div stays on the gated BIGINT because DECIMAL
    div/``//`` rounding diverges between engines."""
    v = (
        load_table(spark, "lineitem", sf_dir)
        .where(F.col("l_partkey").isNotNull())
        .groupBy("l_partkey")
        .agg(
            bsum(CENTI_SQL.format("l_extendedprice")).alias("val_centi")
        )
    )
    thr = v.agg(
        F.expr(
            f"{bsum_sql('val_centi')} div {_Q11_DENOM}"
        ).alias("thr")
    )
    return (
        v.crossJoin(F.broadcast(thr))
        .where(F.col("val_centi") > F.col("thr"))
        .select(F.col("l_partkey").alias("partkey"), "val_centi")
    )


# --- Q12: ship-lag band vs order priority ---------------------------------------

# No l_shipmode in the fixture: the band key is the ship lag itself
# (days from order to ship), bucketed into a 3-value domain. The
# CASE-counting pivot (high- vs low-priority lines per band) is the
# Q12 shape verbatim.
_Q12_FAST = 30
_Q12_NORMAL = 90
_Q12_HIGH = ("1-URGENT", "2-HIGH")

TPCH_Q12_ORACLE = f"""
SELECT CASE WHEN lag_days <= {_Q12_FAST} THEN 'FAST'
            WHEN lag_days <= {_Q12_NORMAL} THEN 'NORMAL'
            ELSE 'SLOW' END AS ship_band,
       CAST(sum(CASE WHEN o_orderpriority IN {_Q12_HIGH}
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN {_Q12_HIGH}
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM (
  SELECT CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
           AS lag_days,
         o.o_orderpriority
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_shipdate IS NOT NULL AND o.o_orderdate IS NOT NULL
)
GROUP BY 1
"""


@query("tpch_q12_lateness_priority", TPCH_Q12_ORACLE)
def q_tpch_q12_lateness_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q12: how many high- vs low-priority lines land in each
    ship-lag band — the conditional-count pivot. One equi-exchange on
    the order key carrying only (key, date, priority); the rollup key
    space is the 3-value band domain. NULL priorities count as low
    (CASE's ELSE arm) identically in both engines."""
    li = load_table(spark, "lineitem", sf_dir).where(
        F.col("l_shipdate").isNotNull()
    ).select("l_orderkey", "l_shipdate")
    o = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderdate").isNotNull()
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    lag = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    hi = F.col("o_orderpriority").isin(list(_Q12_HIGH))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.when(lag <= _Q12_FAST, "FAST")
            .when(lag <= _Q12_NORMAL, "NORMAL")
            .otherwise("SLOW")
            .alias("ship_band")
        )
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(hi, 0).otherwise(1)).cast("long").alias(
                "low_line_count"
            ),
        )
    )


# --- Q15: top supplier by quarter revenue ---------------------------------------

_Q15_LO = "1996-01-01"
_Q15_HI = "1996-04-01"
_Q15_REV = CENTI_SQL.format("(l_extendedprice * (1 - l_discount))")

TPCH_Q15_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey, {bsum_sql(_Q15_REV)} AS rev_centi
  FROM lineitem
  WHERE l_suppkey IS NOT NULL
    AND CAST(l_shipdate AS DATE) >= DATE '{_Q15_LO}'
    AND CAST(l_shipdate AS DATE) <  DATE '{_Q15_HI}'
  GROUP BY l_suppkey
),
m AS (SELECT max(rev_centi) AS max_rev FROM rev)
SELECT s.s_suppkey AS suppkey, s.s_name, r.rev_centi
FROM rev r CROSS JOIN m
JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.rev_centi = m.max_rev
"""


@query("tpch_q15_top_supplier", TPCH_Q15_ORACLE)
def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with the highest revenue in one
    quarter — aggregate, global argmax, equality join back. Revenue
    is an exact centi-int sum so the max-equality join is tie-exact
    (every co-leader survives, as the classic's view formulation
    requires), never float-fuzzy. The argmax rides as ONE broadcast
    row; the supplier dim join is AQE's call (SF-scaled, no hint)."""
    rev = (
        load_table(spark, "lineitem", sf_dir)
        .where(
            F.col("l_suppkey").isNotNull()
            & (
                F.col("l_shipdate").cast("date")
                >= F.lit(_Q15_LO).cast("date")
            )
            & (F.col("l_shipdate").cast("date") < F.lit(_Q15_HI).cast("date"))
        )
        .groupBy("l_suppkey")
        # bsum (DECIMAL(38,0) sum, total-form BIGINT cast): same
        # overflow-headroom fix as Q11 — see its docstring
        .agg(bsum(_Q15_REV).alias("rev_centi"))
    )
    m = rev.agg(F.max("rev_centi").alias("max_rev"))
    s = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(m))
        .where(F.col("rev_centi") == F.col("max_rev"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .select(F.col("s_suppkey").alias("suppkey"), "s_name", "rev_centi")
    )


# --- Q20: surplus suppliers (nested share-of-part threshold) --------------------

# The classic keeps suppliers whose availqty exceeds half their
# shipped volume of 'forest%' parts; without partsupp the stand-in
# test is a SHARE threshold — the supplier carries more than 1/8 of
# a 'small %' part's total shipped quantity (33 of 100 fixture
# suppliers qualify; the truncating-div compare is exact and
# overflow-free).
_Q20_NAME_PREFIX = "small "
_Q20_SHARE_DENOM = 8

TPCH_Q20_ORACLE = f"""
WITH li AS (
  SELECT l.l_partkey, l.l_suppkey,
         {MILLI_SQL.format('l.l_quantity')} AS qm
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE '{_Q20_NAME_PREFIX}%' AND l.l_suppkey IS NOT NULL
),
ps AS (
  SELECT l_partkey, l_suppkey, CAST(sum(qm) AS BIGINT) AS q_ps
  FROM li GROUP BY l_partkey, l_suppkey
),
shares AS (
  SELECT l_suppkey, q_ps,
         CAST(sum(q_ps) OVER (PARTITION BY l_partkey) AS BIGINT) AS q_p
  FROM ps
),
qual AS (
  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_parts
  FROM shares WHERE q_ps > q_p // {_Q20_SHARE_DENOM}
  GROUP BY l_suppkey
)
SELECT s.s_suppkey AS suppkey, s.s_name, q.n_parts
FROM qual q JOIN supplier s ON s.s_suppkey = q.l_suppkey
"""


@query("tpch_q20_surplus_suppliers", TPCH_Q20_ORACLE)
def q_tpch_q20_surplus_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q20: suppliers dominating the shipped volume of at least
    one product-family part — the nested correlated-aggregate
    threshold. The fact shuffles ONCE (explicit repartition on the
    part key, which subset-satisfies the pair-key aggregate); the
    per-part total is then a part-PARTITIONED window sum over the
    pair rollup — no self-join, no second scan, and the window
    reuses the same partitioning (its group size is the per-part
    supplier cadence, never corpus rows). The share test divides the
    PART TOTAL (q_ps > q_p div 8) instead of multiplying the pair
    sum: a x8 multiply on a SUM overflows int64 after only ~129
    gate-max milli terms — DuckDB raises where non-ANSI Spark wraps,
    a one-sided crash (round-8 review find) — while the truncating
    div only shrinks. For positive totals the div form is exactly
    equivalent to 8*q_ps > q_p; both engines truncate toward zero
    for negative (degenerate) totals too, so the compare is
    cross-engine identical for all signs."""
    li = (
        load_table(spark, "lineitem", sf_dir)
        .where(F.col("l_suppkey").isNotNull())
        .join(
            load_table(spark, "part", sf_dir)
            .where(F.col("p_name").startswith(_Q20_NAME_PREFIX))
            .select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_partkey", "l_suppkey", milli("l_quantity").alias("qm"))
        # ONE explicit exchange on the part key: partkey-only hash
        # partitioning satisfies the pair agg (subset clustering),
        # the part-total agg, AND the ps-vs-pt join below — without
        # it Catalyst inserts three exchanges (pair keys, part key,
        # join key). Part cardinality is corpus-scaled, so the
        # partkey hash spreads; no single part dominates a shard.
        .repartition(F.col("l_partkey"))
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("qm").cast("long").alias("q_ps")
    )
    w = Window.partitionBy("l_partkey")
    qual = (
        ps.withColumn("q_p", F.sum("q_ps").over(w).cast("long"))
        .where(F.col("q_ps") > F.expr(f"q_p div {_Q20_SHARE_DENOM}"))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
    )
    s = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return qual.join(s, F.col("s_suppkey") == F.col("l_suppkey")).select(
        F.col("s_suppkey").alias("suppkey"), "s_name", "n_parts"
    )
