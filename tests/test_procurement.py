"""Pins for min-cost supplier election (plans/procurement.py): the
elected supplier really has the regional minimum cost, and the plan
is the broadcast chain the docstring promises."""

from __future__ import annotations

from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans import QUERIES
from psx_data_pipeline_spark.plans.procurement import _MIN_SIZE, _REGION
from psx_data_pipeline_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.01"


def _regional_suppliers(spark):
    sup = load_table(spark, "supplier", SF)
    nat = load_table(spark, "nation", SF)
    reg = load_table(spark, "region", SF).where(F.col("r_name") == _REGION)
    return {
        r.s_suppkey
        for r in sup.join(nat, sup.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey")
        .collect()
    }


def test_min_cost_supplier_is_regional_argmin(spark):
    out = {r.p_partkey: r for r in
           QUERIES["min_cost_supplier"](spark, SF).collect()}
    assert out
    regional = _regional_suppliers(spark)
    li = load_table(spark, "lineitem", SF).where(
        F.col("l_partkey").isNotNull() & F.col("l_suppkey").isNotNull()
        & F.col("l_extendedprice").isNotNull()
        & F.col("l_quantity").isNotNull() & (F.col("l_quantity") > 0)
    )
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.floor(
            F.lit(1000000.0)
            * (F.col("l_extendedprice") / F.col("l_quantity"))
        )).cast("long").alias("c")
    ).collect()
    best: dict[int, int] = {}
    for r in costs:
        if r.l_suppkey in regional:
            cur = best.get(r.l_partkey)
            if cur is None or r.c < cur:
                best[r.l_partkey] = r.c
    parts = {
        r.p_partkey
        for r in load_table(spark, "part", SF)
        .where(F.col("p_size") >= _MIN_SIZE).collect()
    }
    expected = {p for p in best if p in parts}
    assert set(out) == expected
    for p, r in out.items():
        assert r.cost_micro == best[p]


def test_min_cost_supplier_plan_broadcasts_all_dims(spark):
    plan = QUERIES["min_cost_supplier"](spark, SF)._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
