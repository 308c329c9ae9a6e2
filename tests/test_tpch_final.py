"""Pins for the round-8 batch-3 TPC-H shapes (plans/tpch_final.py) —
constructed inputs that force each query's distinguishing branch
(band edges, exact ties, the strict share boundary), oracle-compared
so the cross-engine hash covers the hostile case too."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
from tests.oracle_check import compare
from tests.test_tpch_more import _write_rel


def _check(spark, name, sf):
    ok, msg = compare(QUERIES[name](spark, sf), ORACLE_SQL[name], sf)
    assert ok, msg


def _write_part(tmp_path, rows):
    """rows: (partkey, name, retailprice)."""
    pq.write_table(
        pa.table({
            "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
            "p_name": pa.array([r[1] for r in rows]),
            "p_brand": pa.array(["Brand#12"] * len(rows)),
            "p_type": pa.array(["PROMO"] * len(rows)),
            "p_size": pa.array([3] * len(rows), pa.int32()),
            "p_retailprice": pa.array([float(r[2]) for r in rows]),
        }),
        f"{tmp_path}/part.parquet",
    )


def test_q6_every_predicate_excludes(spark, tmp_path):
    """Only the fully in-band line counts: out-of-band discount,
    too-large quantity, and out-of-window ship date each exclude."""
    d96, d97 = dt.datetime(1996, 6, 1), dt.datetime(1997, 6, 1)
    _write_rel(
        tmp_path,
        orders=[(1, 1, d96)],
        lineitem=[(1, 10, d96, 1), (1, 10, d96, 1),
                  (1, 10, d96, 1), (1, 10, d97, 1)],
        supplier=[(10, "s", 0, 1.0)],
    )
    li = pq.read_table(f"{tmp_path}/lineitem.parquet").to_pydict()
    li["l_extendedprice"] = [100.0, 100.0, 100.0, 100.0]
    li["l_discount"] = [0.06, 0.02, 0.06, 0.06]  # row 2: out of band
    li["l_quantity"] = [10.0, 10.0, 30.0, 10.0]  # row 3: too large
    pq.write_table(pa.table(li), f"{tmp_path}/lineitem.parquet")
    (row,) = QUERIES["tpch_q6_forecast_revenue"](
        spark, str(tmp_path)).collect()
    assert row.n_lines == 1
    assert row.revenue == 6.0  # 100 * 0.06, exact through decimal
    _check(spark, "tpch_q6_forecast_revenue", str(tmp_path))


def test_q9_profit_sign_and_family_filter(spark, tmp_path):
    """Revenue above the 60 %-of-retail cost is profit, below is
    loss (per nation row); a non-family part never contributes."""
    d = dt.datetime(1996, 6, 1)
    _write_rel(
        tmp_path,
        orders=[(1, 1, d)],
        lineitem=[(1, 10, d, 1), (1, 20, d, 1), (1, 10, d, 2)],
        supplier=[(10, "s3", 3, 1.0), (20, "s7", 7, 1.0)],
    )
    li = pq.read_table(f"{tmp_path}/lineitem.parquet").to_pydict()
    li["l_extendedprice"] = [10.0, 2.0, 500.0]  # cost is 6.0 per unit
    pq.write_table(pa.table(li), f"{tmp_path}/lineitem.parquet")
    _write_part(tmp_path, [(1, "red widget", 10.0), (2, "blue bolt", 10.0)])
    got = {r.supp_nation: r for r in QUERIES["tpch_q9_product_profit"](
        spark, str(tmp_path)).collect()}
    assert set(got) == {"NATION_3", "NATION_7"}
    assert got["NATION_3"].profit == 4.0 and got["NATION_3"].n_lines == 1
    assert got["NATION_7"].profit == -4.0
    assert all(r.o_year == 1996 for r in got.values())
    _check(spark, "tpch_q9_product_profit", str(tmp_path))


def test_q11_threshold_splits_parts(spark, tmp_path):
    """Part 1 carries ~99.99 % of revenue, part 2 ~0.01 % — the
    1/1500-of-total bar keeps part 1 and drops part 2 (the HAVING's
    fail branch is live, not just the pass branch)."""
    d = dt.datetime(1996, 6, 1)
    _write_rel(
        tmp_path,
        orders=[(1, 1, d)],
        lineitem=[(1, 10, d, 1), (1, 10, d, 2)],
        supplier=[(10, "s", 0, 1.0)],
    )
    li = pq.read_table(f"{tmp_path}/lineitem.parquet").to_pydict()
    li["l_extendedprice"] = [10000.0, 1.0]  # centi: 1000000 vs 100
    pq.write_table(pa.table(li), f"{tmp_path}/lineitem.parquet")
    rows = QUERIES["tpch_q11_important_parts"](
        spark, str(tmp_path)).collect()
    assert [(r.partkey, r.val_centi) for r in rows] == [(1, 1000000)]
    _check(spark, "tpch_q11_important_parts", str(tmp_path))


def test_q12_band_edges_and_null_priority(spark, tmp_path):
    """The EXACT band boundaries: lag 30 is still FAST and lag 90 is
    still NORMAL (both comparisons are <=), 31/91 fall over the edge;
    a NULL priority counts as low (the CASE ELSE arm) in both
    engines."""
    base = dt.datetime(1996, 1, 1)
    lags = (10, 30, 31, 90, 91, 200)
    ships = [base + dt.timedelta(days=g) for g in lags]
    _write_rel(
        tmp_path,
        orders=[(k, 1, base) for k in range(1, 7)],
        lineitem=[(k, 10, ships[k - 1], 1) for k in range(1, 7)],
        supplier=[(10, "s", 0, 1.0)],
    )
    t = pq.read_table(f"{tmp_path}/orders.parquet").to_pydict()
    #                  10        30(edge) 31      90(edge)   91    200
    t["o_orderpriority"] = [
        "1-URGENT", "2-HIGH", None, "5-LOW", "1-URGENT", "2-HIGH"]
    pq.write_table(pa.table(t), f"{tmp_path}/orders.parquet")
    got = {r.ship_band: r for r in QUERIES["tpch_q12_lateness_priority"](
        spark, str(tmp_path)).collect()}
    # FAST = lags 10, 30 (boundary in); NORMAL = 31, 90; SLOW = 91, 200
    assert (got["FAST"].high_line_count, got["FAST"].low_line_count) == (2, 0)
    assert (got["NORMAL"].high_line_count,
            got["NORMAL"].low_line_count) == (0, 2)
    assert (got["SLOW"].high_line_count, got["SLOW"].low_line_count) == (2, 0)
    _check(spark, "tpch_q12_lateness_priority", str(tmp_path))


def test_q15_exact_tie_keeps_both_leaders(spark, tmp_path):
    """Two suppliers tie on the exact centi-int max — BOTH survive
    the argmax equality join (the classic view semantics); the
    runner-up is dropped."""
    d = dt.datetime(1996, 2, 1)
    _write_rel(
        tmp_path,
        orders=[(1, 1, d)],
        lineitem=[(1, 10, d, 1), (1, 20, d, 1), (1, 30, d, 1)],
        supplier=[(10, "lead-a", 0, 1.0), (20, "lead-b", 0, 1.0),
                  (30, "runner", 0, 1.0)],
    )
    li = pq.read_table(f"{tmp_path}/lineitem.parquet").to_pydict()
    li["l_extendedprice"] = [100.0, 100.0, 50.0]
    pq.write_table(pa.table(li), f"{tmp_path}/lineitem.parquet")
    rows = QUERIES["tpch_q15_top_supplier"](spark, str(tmp_path)).collect()
    assert {r.suppkey for r in rows} == {10, 20}
    assert all(r.rev_centi == 10000 for r in rows)
    _check(spark, "tpch_q15_top_supplier", str(tmp_path))


def test_q20_share_boundary_is_strict(spark, tmp_path):
    """Supplier 10 holds EXACTLY 1/8 of part 1's volume (8*q_ps ==
    q_p) — strictly-greater drops it; supplier 20's 7/8 share
    qualifies; the non-family part never counts."""
    d = dt.datetime(1996, 6, 1)
    _write_rel(
        tmp_path,
        orders=[(1, 1, d)],
        lineitem=[(1, 10, d, 1), (1, 20, d, 1), (1, 30, d, 2)],
        supplier=[(10, "boundary", 0, 1.0), (20, "dominant", 0, 1.0),
                  (30, "other-family", 0, 1.0)],
    )
    li = pq.read_table(f"{tmp_path}/lineitem.parquet").to_pydict()
    li["l_quantity"] = [1.0, 7.0, 100.0]
    pq.write_table(pa.table(li), f"{tmp_path}/lineitem.parquet")
    _write_part(tmp_path, [(1, "small bolt", 10.0),
                           (2, "red widget", 10.0)])
    rows = QUERIES["tpch_q20_surplus_suppliers"](
        spark, str(tmp_path)).collect()
    assert [(r.suppkey, r.n_parts) for r in rows] == [(20, 1)]
    _check(spark, "tpch_q20_surplus_suppliers", str(tmp_path))


def test_q20_gate_max_sums_do_not_overflow(spark, tmp_path):
    """150 gate-max quantity lines (9e12 each → q_ps ≈ 1.35e18) for
    one (part, supplier): the retired x8-multiply form would push
    8·q_ps past int64 — DuckDB raises OutOfRange where non-ANSI
    Spark wraps negative (one-sided crash) — while the div-form
    compare only shrinks. The dominant supplier must still qualify
    and the tiny co-supplier must not."""
    d = dt.datetime(1996, 6, 1)
    n = 150
    _write_rel(
        tmp_path,
        orders=[(1, 1, d)],
        lineitem=[(1, 10, d, 1)] * n + [(1, 20, d, 1)],
        supplier=[(10, "whale", 0, 1.0), (20, "minnow", 0, 1.0)],
    )
    li = pq.read_table(f"{tmp_path}/lineitem.parquet").to_pydict()
    li["l_quantity"] = [9e12] * n + [1.0]
    pq.write_table(pa.table(li), f"{tmp_path}/lineitem.parquet")
    _write_part(tmp_path, [(1, "small giant", 10.0)])
    rows = QUERIES["tpch_q20_surplus_suppliers"](
        spark, str(tmp_path)).collect()
    assert [(r.s_name, r.n_parts) for r in rows] == [("whale", 1)]
    _check(spark, "tpch_q20_surplus_suppliers", str(tmp_path))
