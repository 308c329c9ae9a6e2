"""Pins for the round-8 TPC-H shapes (plans/tpch_more.py): Q7's two
directions stay separate rows, Q21's lone-late-supplier logic on a
constructed multi-supplier order book, and the diversity rollup's
exclusion anti-join — each oracle-compared on its constructed input
so the cross-engine hash covers the hostile case, not just sf0.01."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
from tests.oracle_check import compare
from tests.test_nonvacuity import _link_base


def _write_rel(tmp_path, orders=None, lineitem=None, supplier=None,
               customer=None):
    if orders is not None:
        pq.write_table(
            pa.table({
                "o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
                "o_custkey": pa.array([o[1] for o in orders], pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(orders)),
                "o_totalprice": pa.array([100.0] * len(orders)),
                "o_orderdate": pa.array(
                    [o[2] for o in orders], pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * len(orders)),
            }),
            f"{tmp_path}/orders.parquet",
        )
    if lineitem is not None:
        pq.write_table(
            pa.table({
                "l_orderkey": pa.array(
                    [r[0] for r in lineitem], pa.int64()
                ),
                "l_partkey": pa.array([r[3] for r in lineitem], pa.int64()),
                "l_suppkey": pa.array([r[1] for r in lineitem], pa.int64()),
                "l_linenumber": pa.array(
                    list(range(1, len(lineitem) + 1)), pa.int32()
                ),
                "l_quantity": pa.array([1.0] * len(lineitem)),
                "l_extendedprice": pa.array([10.0] * len(lineitem)),
                "l_discount": pa.array([0.0] * len(lineitem)),
                "l_tax": pa.array([0.0] * len(lineitem)),
                "l_returnflag": pa.array(["R"] * len(lineitem)),
                "l_linestatus": pa.array(["O"] * len(lineitem)),
                "l_shipdate": pa.array(
                    [r[2] for r in lineitem], pa.timestamp("us")
                ),
            }),
            f"{tmp_path}/lineitem.parquet",
        )
    if supplier is not None:
        pq.write_table(
            pa.table({
                "s_suppkey": pa.array([s[0] for s in supplier], pa.int64()),
                "s_name": pa.array([s[1] for s in supplier]),
                "s_nationkey": pa.array(
                    [s[2] for s in supplier], pa.int32()
                ),
                "s_acctbal": pa.array([s[3] for s in supplier]),
            }),
            f"{tmp_path}/supplier.parquet",
        )
    if customer is not None:
        pq.write_table(
            pa.table({
                "c_custkey": pa.array([c[0] for c in customer], pa.int64()),
                "c_name": pa.array([c[1] for c in customer]),
                "c_nationkey": pa.array(
                    [c[2] for c in customer], pa.int32()
                ),
                "c_acctbal": pa.array([1.0] * len(customer)),
                "c_mktsegment": pa.array(["BUILDING"] * len(customer)),
            }),
            f"{tmp_path}/customer.parquet",
        )
    _link_base(str(tmp_path))


def test_q7_directions_are_separate_rows(spark, tmp_path):
    """One order ships nation-7 supplier → nation-3 customer, another
    the reverse; the two directions must land in two rows, and a
    same-nation order book contributes nothing."""
    d = dt.datetime(1996, 6, 1)
    _write_rel(
        tmp_path,
        orders=[(1, 1, d), (2, 2, d), (3, 3, d)],
        #         (orderkey, suppkey, shipdate, partkey)
        lineitem=[(1, 10, d, 1), (2, 20, d, 1), (3, 30, d, 1)],
        supplier=[(10, "s7", 7, 1.0), (20, "s3", 3, 1.0),
                  (30, "s3b", 3, 1.0)],
        customer=[(1, "c3", 3), (2, "c7", 7), (3, "c3b", 3)],
    )
    rows = {(r.supp_nation, r.cust_nation): r for r in QUERIES[
        "tpch_q7_volume_shipping"](spark, str(tmp_path)).collect()}
    assert set(rows) == {("NATION_7", "NATION_3"), ("NATION_3", "NATION_7")}
    assert all(r.n_lines == 1 and r.l_year == 1996 for r in rows.values())
    ok, msg = compare(
        QUERIES["tpch_q7_volume_shipping"](spark, str(tmp_path)),
        ORACLE_SQL["tpch_q7_volume_shipping"], str(tmp_path),
    )
    assert ok, msg


def test_q21_lone_late_supplier_only(spark, tmp_path):
    """Order 1: supplier 10 late, supplier 20 on time → 10 waits
    alone and scores. Order 2: both late → neither scores. Order 3:
    single-supplier late → no other supplier exists, no score."""
    od = dt.datetime(1996, 1, 1)
    late = od + dt.timedelta(days=90)
    ontime = od + dt.timedelta(days=10)
    _write_rel(
        tmp_path,
        orders=[(1, 1, od), (2, 1, od), (3, 1, od)],
        lineitem=[
            (1, 10, late, 1), (1, 20, ontime, 1),
            (2, 10, late, 1), (2, 20, late, 1),
            (3, 30, late, 1),
        ],
        supplier=[(10, "sA", 0, 1.0), (20, "sB", 0, 1.0),
                  (30, "sC", 0, 1.0)],
    )
    got = {r.s_name: r.numwait for r in QUERIES[
        "tpch_q21_waiting_supplier"](spark, str(tmp_path)).collect()}
    assert got == {"sA": 1}
    ok, msg = compare(
        QUERIES["tpch_q21_waiting_supplier"](spark, str(tmp_path)),
        ORACLE_SQL["tpch_q21_waiting_supplier"], str(tmp_path),
    )
    assert ok, msg


def test_diversity_excludes_complaint_suppliers(spark, tmp_path):
    """Two suppliers ship the same brand's part; the negative-balance
    one is excluded (its line drops from BOTH counts), so the
    distinct count sees only one — and a NULL l_suppkey row drops
    too (NOT EXISTS and left-anti agree)."""
    d = dt.datetime(1996, 1, 1)
    _write_rel(
        tmp_path,
        orders=[(1, 1, d)],
        lineitem=[(1, 10, d, 1), (1, 20, d, 1), (1, None, d, 1)],
        supplier=[(10, "ok", 0, 5.0), (20, "complained", 0, -5.0)],
    )
    rows = QUERIES["brand_supplier_diversity"](
        spark, str(tmp_path)).collect()
    brands = {r.p_brand: r for r in rows}
    # part 1 comes from the linked base part table; whatever its
    # brand, the qualifying distinct-supplier count is exactly 1
    assert len(brands) == 1
    (row,) = brands.values()
    assert row.supplier_cnt == 1 and row.n_lines == 1
    ok, msg = compare(
        QUERIES["brand_supplier_diversity"](spark, str(tmp_path)),
        ORACLE_SQL["brand_supplier_diversity"], str(tmp_path),
    )
    assert ok, msg
