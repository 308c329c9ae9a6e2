"""Pins for the round-8 batch-2 TPC-H shapes (plans/tpch_classics.py)
and the embedding centroid drift (plans/drift.py) — constructed
inputs that force each query's distinguishing branch, oracle-compared
so the cross-engine hash covers the hostile case too."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
from tests.oracle_check import compare
from tests.test_nonvacuity import _link_base
from tests.test_tpch_more import _write_rel

SF = "/root/testdata/sf0.01"


def test_q13_zero_order_customers_survive(spark, tmp_path):
    """Customer 2 has no orders at all, customer 3 only excluded
    ('F') orders — both must land in the c_count=0 bucket; the LEFT
    join cannot drop them."""
    d = dt.datetime(1996, 6, 1)
    _write_rel(
        tmp_path,
        orders=[(1, 1, d), (2, 1, d), (3, 3, d)],
        customer=[(1, "a", 0), (2, "b", 0), (3, "c", 0)],
    )
    # order 3 becomes status 'F' (excluded); _write_rel writes 'O'
    t = pq.read_table(f"{tmp_path}/orders.parquet").to_pydict()
    t["o_orderstatus"] = ["O", "O", "F"]
    pq.write_table(pa.table(t), f"{tmp_path}/orders.parquet")
    got = {r.c_count: r.custdist for r in QUERIES[
        "tpch_q13_customer_distribution"](spark, str(tmp_path)).collect()}
    assert got == {2: 1, 0: 2}
    ok, msg = compare(
        QUERIES["tpch_q13_customer_distribution"](spark, str(tmp_path)),
        ORACLE_SQL["tpch_q13_customer_distribution"], str(tmp_path),
    )
    assert ok, msg


def test_q22_threshold_and_anti_join(spark, tmp_path):
    """The floor-average of POSITIVE balances is the bar: a
    rich customer with no orders scores, the equally rich one WITH
    an order is anti-joined away, the below-bar and negative ones
    never qualify."""
    d = dt.datetime(1996, 6, 1)
    _write_rel(
        tmp_path,
        orders=[(1, 11, d)],
        customer=[(10, "rich-idle", 0), (11, "rich-buyer", 0),
                  (12, "modest", 0), (13, "debtor", 3)],
    )
    t = pq.read_table(f"{tmp_path}/customer.parquet").to_pydict()
    # positive centi: 900000, 900000, 100 -> 1800100 div 3 = 600033
    t["c_acctbal"] = [9000.0, 9000.0, 1.0, -50.0]
    pq.write_table(pa.table(t), f"{tmp_path}/customer.parquet")
    rows = {r.nationkey: r for r in QUERIES["tpch_q22_sales_opportunity"](
        spark, str(tmp_path)).collect()}
    assert set(rows) == {0}
    assert rows[0].numcust == 1
    assert rows[0].total_bal_centi == 900000
    ok, msg = compare(
        QUERIES["tpch_q22_sales_opportunity"](spark, str(tmp_path)),
        ORACLE_SQL["tpch_q22_sales_opportunity"], str(tmp_path),
    )
    assert ok, msg


def test_q19_clause_brand_qty_coupling(spark, tmp_path):
    """A line matches only when its quantity band belongs to ITS
    part's brand clause — brand#12 with qty 25 must not leak in
    through brand#24's band."""
    import pyspark.sql.functions as F  # noqa: F401

    d = dt.datetime(1996, 6, 1)
    _write_rel(
        tmp_path,
        orders=[(1, 1, d)],
        lineitem=[(1, 10, d, 1), (1, 10, d, 2), (1, 10, d, 3)],
        supplier=[(10, "s", 0, 1.0)],
    )
    li = pq.read_table(f"{tmp_path}/lineitem.parquet").to_pydict()
    li["l_quantity"] = [5.0, 25.0, 25.0]   # rows: q12-band, leak, q24-band
    pq.write_table(pa.table(li), f"{tmp_path}/lineitem.parquet")
    pq.write_table(
        pa.table({
            "p_partkey": pa.array([1, 2, 3], pa.int64()),
            "p_name": pa.array(["a", "b", "c"]),
            "p_brand": pa.array(["Brand#12", "Brand#12", "Brand#24"]),
            "p_type": pa.array(["PROMO"] * 3),
            "p_size": pa.array([3, 3, 12], pa.int32()),
            "p_retailprice": pa.array([1.0] * 3),
        }),
        f"{tmp_path}/part.parquet",
    )
    _link_base(str(tmp_path))
    row = QUERIES["tpch_q19_discounted_revenue"](
        spark, str(tmp_path)).collect()[0]
    assert row.n_lines == 2  # the 5.0@Brand#12 and 25.0@Brand#24 rows
    ok, msg = compare(
        QUERIES["tpch_q19_discounted_revenue"](spark, str(tmp_path)),
        ORACLE_SQL["tpch_q19_discounted_revenue"], str(tmp_path),
    )
    assert ok, msg


def test_q8_and_q14_shares_on_fixture(spark):
    """Share invariants the hash alone can't articulate: the
    conditional numerator never exceeds the total, totals are
    positive, and Q8 emits one row per year of the window."""
    rows = QUERIES["tpch_q8_market_share"](spark, SF).collect()
    assert {r.o_year for r in rows} == {1996, 1997}
    for r in rows:
        assert 0 <= r.nation_rev <= r.total_rev
    (q14,) = QUERIES["tpch_q14_promo_share"](spark, SF).collect()
    assert 0 < q14.promo_rev < q14.total_rev


def test_drift_identical_and_opposite_halves(spark, tmp_path):
    """Label 1: the odd half IS the even half (exact copies) →
    cos = 1, not drifted. Label 2: the odd half is the NEGATED even
    half → dot < 0, drifted. Label 3 exists only in one half →
    dropped (no pair to measure)."""
    dim = 64
    v = [0.5] * dim
    neg = [-0.5] * dim
    pq.write_table(
        pa.table({
            "vec_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "embedding": pa.array(
                [v, v, v, neg, v], pa.list_(pa.float32())
            ),
            "label": pa.array([1, 1, 2, 2, 3], pa.int32()),
        }),
        f"{tmp_path}/embeddings.parquet",
    )
    _link_base(str(tmp_path))
    got = {r.label: r for r in QUERIES["embedding_centroid_drift"](
        spark, str(tmp_path)).collect()}
    assert set(got) == {1, 2}
    assert not got[1].drifted and got[1].dot_ab > 0
    assert got[2].drifted and got[2].dot_ab < 0
    ok, msg = compare(
        QUERIES["embedding_centroid_drift"](spark, str(tmp_path)),
        ORACLE_SQL["embedding_centroid_drift"], str(tmp_path),
    )
    assert ok, msg
