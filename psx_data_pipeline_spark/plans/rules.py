"""Data-quality constraint suite: declarative rules audited in bulk
(the Deequ / Great-Expectations shape every ingest pipeline runs
before publishing a dataset version).

The reference validates rows one at a time while scraping — symbol
arity and format checks with per-row containment
(scrape_tickers.py:300-345); this is the same contract expressed as
a suite of table-level rules whose output is one (rule, checked,
violations) row each, the artifact a 100 TB ingest gate signs off
on. Rule classes covered: completeness (NOT NULL), key uniqueness,
set membership, numeric range, and cross-table referential
integrity.

100 TB shape: all row-level rules over one table fold into a SINGLE
scan — a conditional-sum aggregate producing one row of metrics that
is then exploded into per-rule rows (Deequ's "metrics computation"
pass, which is why suites stay O(scan) no matter how many rules are
attached). Uniqueness adds one exact count-distinct on the key
(two-level agg, map-side combined). The two referential rules are
left-anti probes on the FK — equi-joins that consume the tables'
bucketing at cluster scale; nothing here is ever per-rule-per-scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_table

# Violation predicates are TOTAL: a NULL rule input never yields a
# NULL verdict (NULL membership/range checks coalesce to "violation"
# for required fields, to "pass" where NULL is allowed and a
# completeness rule owns it). Spark and DuckDB agree because every
# predicate is wrapped before the conditional count.
#
# NaN is an EXPLICIT violation of every numeric-range rule (isnan OR
# …): semantically a NaN price/quantity never satisfies a bound, and
# mechanically the engines' NaN comparison orders disagree — Spark
# orders NaN greater than everything, and DuckDB 1.0's parquet scan
# path even evaluates NaN BETWEEN lo AND hi as TRUE while its Arrow
# path says FALSE (found by this suite's hostile-fixture test). The
# isnan() guard short-circuits before any engine-dependent compare.


def _viol(pred: Column) -> Column:
    """Count of rows where the (total) violation predicate holds."""
    return F.sum(F.when(pred, 1).otherwise(0)).cast("long")


def _rule(rule_id: str, checked: Column, violations: Column) -> Column:
    return F.struct(
        F.lit(rule_id).alias("rule_id"),
        checked.cast("long").alias("n_checked"),
        violations.cast("long").alias("n_violations"),
    )


def _explode_rules(agg: DataFrame, *rules: Column) -> DataFrame:
    return agg.select(F.explode(F.array(*rules)).alias("r")).select("r.*")


CONSTRAINT_AUDIT_ORACLE = """
WITH o AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(o_orderkey) AS BIGINT) AS nk,
         CAST(count(DISTINCT o_orderkey) AS BIGINT) AS ndk,
         CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_cust_null,
         CAST(sum(CASE WHEN NOT coalesce(o_orderstatus IN ('O','F','P'), FALSE)
                  THEN 1 ELSE 0 END) AS BIGINT) AS v_status,
         CAST(sum(CASE WHEN coalesce(isnan(o_totalprice), FALSE)
                  OR NOT coalesce(o_totalprice >= CAST(1000 AS DOUBLE), FALSE)
                  THEN 1 ELSE 0 END) AS BIGINT) AS v_price
  FROM orders
),
l AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN coalesce(isnan(l_quantity), FALSE)
                  OR NOT coalesce(l_quantity BETWEEN CAST(1 AS DOUBLE)
                  AND CAST(50 AS DOUBLE), FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
         CAST(sum(CASE WHEN coalesce(isnan(l_discount), FALSE)
                  OR NOT coalesce(l_discount BETWEEN CAST(0 AS DOUBLE)
                  AND CAST(0.08 AS DOUBLE), FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
         CAST(sum(CASE WHEN coalesce(isnan(l_extendedprice), FALSE)
                  OR NOT coalesce(l_extendedprice > CAST(0 AS DOUBLE), FALSE)
                  THEN 1 ELSE 0 END) AS BIGINT) AS v_eprice
  FROM lineitem
),
e AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_uid,
         CAST(sum(CASE WHEN value IS NOT NULL AND (isnan(value)
                  OR value = CAST('inf' AS DOUBLE) OR value = CAST('-inf' AS DOUBLE))
                  THEN 1 ELSE 0 END) AS BIGINT) AS v_val
  FROM events
),
rl AS (
  SELECT CAST(count(*) AS BIGINT) AS nk,
         CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v
  FROM (SELECT l_orderkey FROM lineitem WHERE l_orderkey IS NOT NULL) li
  LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
    ON li.l_orderkey = o.o_orderkey
),
rc AS (
  SELECT CAST(count(*) AS BIGINT) AS nk,
         CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v
  FROM (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL) ok
  LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
    ON ok.o_custkey = c.c_custkey
)
SELECT 'orders.o_custkey.complete' AS rule_id, n AS n_checked, v_cust_null AS n_violations FROM o
UNION ALL SELECT 'orders.o_orderkey.unique', nk, nk - ndk FROM o
UNION ALL SELECT 'orders.o_orderstatus.in_set', n, v_status FROM o
UNION ALL SELECT 'orders.o_totalprice.min_1000', n, v_price FROM o
UNION ALL SELECT 'lineitem.l_quantity.range_1_50', n, v_qty FROM l
UNION ALL SELECT 'lineitem.l_discount.range_0_008', n, v_disc FROM l
UNION ALL SELECT 'lineitem.l_extendedprice.positive', n, v_eprice FROM l
UNION ALL SELECT 'events.user_id.complete', n, v_uid FROM e
UNION ALL SELECT 'events.value.finite', n, v_val FROM e
UNION ALL SELECT 'lineitem.l_orderkey.ref_orders', nk, v FROM rl
UNION ALL SELECT 'orders.o_custkey.ref_customer', nk, v FROM rc
"""


def _in_set_viol(col: str, allowed: list[str]) -> Column:
    return ~F.coalesce(F.col(col).isin(allowed), F.lit(False))


def _range_viol(col: str, lo: float, hi: float) -> Column:
    return F.isnan(col) | ~F.coalesce(
        (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi)), F.lit(False)
    )


def _orphans(fk: DataFrame, fk_col: str, pk: DataFrame, pk_col: str) -> DataFrame:
    """(n_checked, n_violations) for a referential-integrity rule:
    non-null FK values with no matching PK row. Left join + null
    probe (not anti-join) so the checked count rides the same scan."""
    keys = pk.select(F.col(pk_col).alias("__pk")).distinct()
    probed = fk.where(F.col(fk_col).isNotNull()).join(
        keys, F.col(fk_col) == F.col("__pk"), "left"
    )
    return probed.agg(
        F.count(F.lit(1)).cast("long").alias("nk"),
        _viol(F.col("__pk").isNull()).alias("v"),
    )


@query("constraint_audit", CONSTRAINT_AUDIT_ORACLE)
def q_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eleven-rule data-quality suite over orders / lineitem / events
    plus two cross-table referential rules — one conditional-sum scan
    per table, exploded into per-rule rows (module docstring)."""
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    events = load_table(spark, "events", sf_dir)
    customer = load_table(spark, "customer", sf_dir)

    o_agg = orders.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count("o_orderkey").cast("long").alias("nk"),
        F.countDistinct("o_orderkey").cast("long").alias("ndk"),
        _viol(F.col("o_custkey").isNull()).alias("v_cust_null"),
        _viol(_in_set_viol("o_orderstatus", ["O", "F", "P"])).alias("v_status"),
        _viol(
            F.isnan("o_totalprice")
            | ~F.coalesce(F.col("o_totalprice") >= F.lit(1000.0), F.lit(False))
        ).alias("v_price"),
    )
    o_rules = _explode_rules(
        o_agg,
        _rule("orders.o_custkey.complete", F.col("n"), F.col("v_cust_null")),
        _rule("orders.o_orderkey.unique", F.col("nk"), F.col("nk") - F.col("ndk")),
        _rule("orders.o_orderstatus.in_set", F.col("n"), F.col("v_status")),
        _rule("orders.o_totalprice.min_1000", F.col("n"), F.col("v_price")),
    )

    l_agg = lineitem.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        _viol(_range_viol("l_quantity", 1.0, 50.0)).alias("v_qty"),
        _viol(_range_viol("l_discount", 0.0, 0.08)).alias("v_disc"),
        _viol(
            F.isnan("l_extendedprice")
            | ~F.coalesce(F.col("l_extendedprice") > F.lit(0.0), F.lit(False))
        ).alias("v_eprice"),
    )
    l_rules = _explode_rules(
        l_agg,
        _rule("lineitem.l_quantity.range_1_50", F.col("n"), F.col("v_qty")),
        _rule("lineitem.l_discount.range_0_008", F.col("n"), F.col("v_disc")),
        _rule("lineitem.l_extendedprice.positive", F.col("n"), F.col("v_eprice")),
    )

    e_agg = events.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        _viol(F.col("user_id").isNull()).alias("v_uid"),
        _viol(
            F.col("value").isNotNull()
            & (
                F.isnan("value")
                | (F.col("value") == F.lit(float("inf")))
                | (F.col("value") == F.lit(float("-inf")))
            )
        ).alias("v_val"),
    )
    e_rules = _explode_rules(
        e_agg,
        _rule("events.user_id.complete", F.col("n"), F.col("v_uid")),
        _rule("events.value.finite", F.col("n"), F.col("v_val")),
    )

    rl = _explode_rules(
        _orphans(lineitem, "l_orderkey", orders, "o_orderkey"),
        _rule("lineitem.l_orderkey.ref_orders", F.col("nk"), F.col("v")),
    )
    rc = _explode_rules(
        _orphans(orders, "o_custkey", customer, "c_custkey"),
        _rule("orders.o_custkey.ref_customer", F.col("nk"), F.col("v")),
    )

    return o_rules.unionByName(l_rules).unionByName(e_rules).unionByName(
        rl
    ).unionByName(rc)
