"""Pins for the Q17/Q4-shaped operators (plans/tpch_extra.py):
threshold semantics and semi-join once-per-order counting match a
brute-force recompute."""

from __future__ import annotations

import datetime as dt
import math
from collections import defaultdict

from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans import QUERIES
from psx_data_pipeline_spark.plans.tpch_extra import _LATE_DAYS
from psx_data_pipeline_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.01"


def test_small_order_revenue_threshold_semantics(spark):
    rows = {r.p_brand: r for r in
            QUERIES["small_order_revenue"](spark, SF).collect()}
    li = load_table(spark, "lineitem", SF).where(
        F.col("l_partkey").isNotNull() & F.col("l_quantity").isNotNull()
        & (F.col("l_quantity") > 0) & F.col("l_extendedprice").isNotNull()
    ).select("l_partkey", "l_quantity", "l_extendedprice").collect()
    brand = {
        r.p_partkey: r.p_brand
        for r in load_table(spark, "part", SF).collect()
    }
    per_part = defaultdict(list)
    for r in li:
        per_part[r.l_partkey].append(r)
    n_small = defaultdict(int)
    rev = defaultdict(float)
    for pk, items in per_part.items():
        sum_q = sum(math.floor(1000 * r.l_quantity) for r in items)
        cnt = len(items)
        for r in items:
            if 5 * math.floor(1000 * r.l_quantity) * cnt < sum_q:
                b = brand.get(pk)
                if b is not None:
                    n_small[b] += 1
                    rev[b] += r.l_extendedprice
    assert {b: r.n_small for b, r in rows.items()} == dict(n_small)
    for b, r in rows.items():
        assert abs(r.avg_yearly - rev[b] / 7.0) < 1e-6 * max(1.0, abs(rev[b]))


def test_late_order_priority_counts_each_order_once(spark):
    rows = {r.o_orderpriority: r.n_orders for r in
            QUERIES["late_order_priority"](spark, SF).collect()}
    orders = load_table(spark, "orders", SF).where(
        F.col("o_orderdate").isNotNull()
    ).collect()
    li = load_table(spark, "lineitem", SF).where(
        F.col("l_shipdate").isNotNull()
    ).select("l_orderkey", "l_shipdate").collect()
    ship = defaultdict(list)
    for r in li:
        ship[r.l_orderkey].append(r.l_shipdate)
    expected = defaultdict(int)
    for o in orders:
        cutoff = o.o_orderdate + dt.timedelta(days=_LATE_DAYS)
        if any(s > cutoff for s in ship.get(o.o_orderkey, [])):
            expected[o.o_orderpriority] += 1
    assert rows == dict(expected)
