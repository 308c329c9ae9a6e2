"""Pins for the constraint-audit suite (plans/rules.py): every rule
class fires on a hostile fixture — NULL keys, duplicate keys, orphan
FKs, non-finite values, out-of-set codes — with exact counts, and
the Spark result still hash-matches the DuckDB oracle on that same
hostile data (total predicates: no engine-dependent NULL verdicts)."""

from __future__ import annotations

import math
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
from tests.oracle_check import TABLES, compare

_BASE = "/root/testdata/sf0.01"


def _write_hostile(sf: str) -> None:
    pq.write_table(
        pa.table(
            {
                # row 4: NULL key (skipped by uniqueness), orphan custkey
                "o_orderkey": pa.array([1, 2, 2, None], pa.int64()),
                "o_custkey": pa.array([10, 10, None, 99], pa.int64()),
                "o_orderstatus": pa.array(["O", "F", "X", None]),
                "o_totalprice": pa.array([5000.0, 2000.0, 500.0, None]),
                "o_orderdate": pa.array([None] * 4, pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * 4),
            }
        ),
        f"{sf}/orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                # row 3: orphan orderkey + NULL measures; row 4: NaN qty
                "l_orderkey": pa.array([1, 1, 7, 1], pa.int64()),
                "l_partkey": pa.array([1] * 4, pa.int64()),
                "l_suppkey": pa.array([1] * 4, pa.int64()),
                "l_linenumber": pa.array([1, 2, 3, 4], pa.int32()),
                "l_quantity": pa.array([10.0, 0.0, None, float("nan")]),
                "l_extendedprice": pa.array([100.0, -5.0, None, 1.0]),
                "l_discount": pa.array([0.05, 0.10, None, 0.01]),
                "l_tax": pa.array([0.0] * 4),
                "l_returnflag": pa.array(["N"] * 4),
                "l_linestatus": pa.array(["O"] * 4),
                "l_shipdate": pa.array([None] * 4, pa.timestamp("us")),
            }
        ),
        f"{sf}/lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "ts": pa.array([None] * 4, pa.timestamp("us")),
                "user_id": pa.array([5, None, 6, 7], pa.int64()),
                "event_type": pa.array(["click", "click", "view", "view"]),
                "value": pa.array([1.0, float("nan"), float("inf"), None]),
                "props": pa.array([None] * 4, pa.string()),
            }
        ),
        f"{sf}/events.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([10], pa.int64()),
                "c_name": pa.array(["A"]),
                "c_nationkey": pa.array([0], pa.int32()),
                "c_acctbal": pa.array([1.0]),
                "c_mktsegment": pa.array(["BUILDING"]),
            }
        ),
        f"{sf}/customer.parquet",
    )
    for t in TABLES:  # link the untouched base tables for the oracle views
        dst = f"{sf}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copy(f"{_BASE}/{t}.parquet", dst)


def test_every_rule_class_fires_with_exact_counts(spark, tmp_path):
    sf = str(tmp_path)
    _write_hostile(sf)
    got = {
        r.rule_id: (r.n_checked, r.n_violations)
        for r in QUERIES["constraint_audit"](spark, sf).collect()
    }
    assert got["orders.o_custkey.complete"] == (4, 1)
    # 3 non-null keys, 2 distinct -> 1 duplicate
    assert got["orders.o_orderkey.unique"] == (3, 1)
    # 'X' and NULL status both violate the (total) membership check
    assert got["orders.o_orderstatus.in_set"] == (4, 2)
    # 500.0 and NULL price violate min_1000
    assert got["orders.o_totalprice.min_1000"] == (4, 2)
    # qty 0.0, NULL, NaN violate (NaN > 50 in both engines' ordering)
    assert got["lineitem.l_quantity.range_1_50"] == (4, 3)
    # 0.10 and NULL violate the discount band
    assert got["lineitem.l_discount.range_0_008"] == (4, 2)
    # -5.0 and NULL violate positivity
    assert got["lineitem.l_extendedprice.positive"] == (4, 2)
    assert got["events.user_id.complete"] == (4, 1)
    # NaN and +inf are non-finite; NULL is not counted here
    assert got["events.value.finite"] == (4, 2)
    # 4 non-null FK rows, one (l_orderkey=7) orphaned
    assert got["lineitem.l_orderkey.ref_orders"] == (4, 1)
    # custkeys 10,10,99 non-null; 99 orphaned
    assert got["orders.o_custkey.ref_customer"] == (3, 1)


def test_hostile_fixture_still_oracle_green(spark, tmp_path):
    """The same hostile data must hash-match DuckDB — the rules'
    NULL/NaN handling cannot be engine-dependent."""
    sf = str(tmp_path)
    _write_hostile(sf)
    sdf = QUERIES["constraint_audit"](spark, sf)
    ok, msg = compare(sdf, ORACLE_SQL["constraint_audit"], sf)
    assert ok, msg


def test_clean_table_reports_zero_not_missing(spark, tmp_path):
    """Rules over a fully-clean table still appear, with 0 violations
    (an audit that drops passing rules can't prove it ran them)."""
    sf = str(tmp_path)
    _write_hostile(sf)
    rows = QUERIES["constraint_audit"](spark, sf).collect()
    assert len(rows) == 11
    assert all(not math.isnan(r.n_violations) for r in rows)
