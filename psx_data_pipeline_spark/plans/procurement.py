"""Min-cost supplier selection (the TPC-H Q2 shape rebuilt on the
fixture schema): for every qualifying part, elect the cheapest
observed supplier inside one region — the multi-dimension broadcast
chain + per-group argmin that every procurement / vendor-rating
pipeline runs.

Unit cost is the observed l_extendedprice / l_quantity, quantized to
exact micro-units: both engines divide doubles under IEEE-754
round-nearest and floor identically, and the floor lands the value in
BIGINT so the argmin and the final hash compare exactly (price <=
105k => micro cost < 1.05e11, comfortably in int64).

100 TB shape: the lineitem scan aggregates to (part, supplier) with
map-side combine — the only corpus-scale shuffle; the election window
runs over per-part SUPPLIER rows (bounded by the supplier catalogue);
supplier/nation/region/part are broadcast dims, so the plan is one
exchange plus broadcast hash joins, exactly what a 1000-executor run
wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_table

_REGION = "EUROPE"
_MIN_SIZE = 25  # part-size qualification band

MIN_COST_SUPPLIER_ORACLE = f"""
WITH costs AS (
  SELECT l_partkey, l_suppkey,
         CAST(min(floor(1000000 * (l_extendedprice / l_quantity)))
              AS BIGINT) AS cost_micro
  FROM lineitem
  WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
        AND l_extendedprice IS NOT NULL
        AND l_quantity IS NOT NULL AND l_quantity > 0
  GROUP BY l_partkey, l_suppkey
),
regional AS (
  SELECT c.l_partkey, c.l_suppkey, c.cost_micro,
         s.s_name, s.s_acctbal, n.n_name
  FROM costs c
  JOIN supplier s ON s.s_suppkey = c.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = '{_REGION}'
),
elected AS (
  SELECT *, row_number() OVER (
    PARTITION BY l_partkey ORDER BY cost_micro, l_suppkey) AS rn
  FROM regional
)
SELECT p.p_partkey, p.p_name, p.p_brand,
       e.s_name, e.n_name, e.cost_micro
FROM elected e
JOIN part p ON p.p_partkey = e.l_partkey
WHERE e.rn = 1 AND p.p_size >= {_MIN_SIZE}
"""


@query("min_cost_supplier", MIN_COST_SUPPLIER_ORACLE)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each part of qualifying size: the cheapest supplier (by
    observed micro-unit cost, supplier key breaking exact-cost ties)
    among suppliers in one region, with the supplier's nation — the
    Q2 'minimum-cost supplier' semantics expressed as agg + window
    argmin instead of a correlated subquery (same result, one pass).

    All four dimension joins broadcast (supplier/nation/region/part
    are catalogue-bounded); lineitem is touched exactly once."""
    li = load_table(spark, "lineitem", sf_dir).where(
        F.col("l_partkey").isNotNull()
        & F.col("l_suppkey").isNotNull()
        & F.col("l_extendedprice").isNotNull()
        & F.col("l_quantity").isNotNull()
        & (F.col("l_quantity") > 0)
    )
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.floor(
                F.lit(1000000.0)
                * (F.col("l_extendedprice") / F.col("l_quantity"))
            )
        ).cast("long").alias("cost_micro")
    )
    sup = F.broadcast(load_table(spark, "supplier", sf_dir))
    nat = F.broadcast(load_table(spark, "nation", sf_dir))
    reg = F.broadcast(
        load_table(spark, "region", sf_dir).where(
            F.col("r_name") == _REGION
        )
    )
    regional = (
        costs.join(sup, costs["l_suppkey"] == sup["s_suppkey"])
        .join(nat, sup["s_nationkey"] == nat["n_nationkey"])
        .join(reg, nat["n_regionkey"] == reg["r_regionkey"])
        .select("l_partkey", "l_suppkey", "cost_micro", "s_name",
                "s_acctbal", "n_name")
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.asc("cost_micro"), F.asc("l_suppkey")
    )
    elected = regional.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    part = F.broadcast(
        load_table(spark, "part", sf_dir).where(
            F.col("p_size") >= _MIN_SIZE
        )
    )
    return elected.join(
        part, elected["l_partkey"] == part["p_partkey"]
    ).select(
        "p_partkey", "p_name", "p_brand", "s_name", "n_name", "cost_micro"
    )
