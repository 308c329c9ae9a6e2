"""Pin the degenerate-relational semantics the hostile probe
established (tools/hostile_relational_probe.py): NULL keys, NULL
dates, and NULL name/segment fields must not fabricate rows, drop
keyed rows, or shift window frames."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def test_symbol_normalize_null_fields_propagate(spark, tmp_path):
    """A customer with no name (or no segment) has no symbol —
    concat_ws would silently fabricate one from the surviving field."""
    sf = str(tmp_path)
    spark.createDataFrame(
        [
            (1, "Alpha Ltd", 0, 1.0, "BUILDING"),
            (2, None, 0, 1.0, "BUILDING"),
            (3, "Beta Inc", 0, 1.0, None),
        ],
        "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    ).write.parquet(f"{sf}/customer.parquet")
    from psx_data_pipeline_spark.plans import QUERIES

    rows = QUERIES["symbol_normalize"](spark, sf).collect()
    assert {r.c_custkey for r in rows} == {1}


def test_sentinel_parity_keeps_null_symbol_row(spark, tmp_path):
    """The flags projection must not equi-join on symbol: a NULL-key
    row silently vanished through the join before."""
    sf = str(tmp_path)
    spark.createDataFrame(
        [
            (1, "Alpha", 0, 1.0, "BUILDING"),
            (None, "NullKey", 0, 1.0, "BUILDING"),
        ],
        "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    ).write.parquet(f"{sf}/customer.parquet")
    from psx_data_pipeline_spark.plans import QUERIES

    rows = QUERIES["sentinel_parity"](spark, sf).collect()
    assert len(rows) == 2
    assert any(r.symbol is None for r in rows)


def test_ohlc_series_excludes_null_dates(spark, tmp_path):
    """A trade without a date belongs to no bar — otherwise the NULL
    sorts NULLS FIRST into every early window frame."""
    sf = str(tmp_path)
    spark.createDataFrame(
        [
            (1, 1, "O", 10.0, dt.datetime(2024, 1, 1), "1-URGENT"),
            (2, 1, "O", 20.0, None, "1-URGENT"),
            (3, 1, "O", 30.0, dt.datetime(2024, 1, 2), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(f"{sf}/orders.parquet")
    from psx_data_pipeline_spark.plans import QUERIES

    ma = QUERIES["moving_avg"](spark, sf).collect()
    assert [r.trade_date for r in ma] == [
        dt.date(2024, 1, 1), dt.date(2024, 1, 2)]
    # closes are 10 (day 1) and 30 (day 2): the NULL-date 20.0 trade
    # contributes to no bar and no frame
    assert [r.ma7 for r in ma] == [10.0, 20.0]


def test_nonfinite_prices_are_malformed(spark, tmp_path):
    """Round-6 probe find: NaN/Inf prices crashed DuckDB's decimal
    cast one-sidedly (dsum) and skewed percentile hashes; 1e30
    overflowed the centi BIGINT on the Spark side only. Pins: the
    series gate drops non-finite-price trades, and the total-form
    dsum skips non-finite revenue terms instead of crashing."""
    sf = str(tmp_path)
    spark.createDataFrame(
        [
            (1, 1, "O", 10.0, dt.datetime(2024, 1, 1), "1-URGENT"),
            (2, 1, "O", float("nan"), dt.datetime(2024, 1, 1), "1-URGENT"),
            (3, 1, "O", float("inf"), dt.datetime(2024, 1, 1), "1-URGENT"),
            (4, 1, "O", 1e30, dt.datetime(2024, 1, 1), "1-URGENT"),
            (5, 1, "O", 30.0, dt.datetime(2024, 1, 1), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(f"{sf}/orders.parquet")
    from psx_data_pipeline_spark.plans import QUERIES

    bars = QUERIES["ohlc_daily"](spark, sf).collect()
    assert len(bars) == 1
    b = bars[0]
    # only the two finite-priced trades form the bar
    assert b.volume == 2
    assert b.open == 10.0 and b.close == 30.0
    assert b.turnover == 40.0


def test_dsum_total_form_skips_nonfinite(spark):
    from psx_data_pipeline_spark.functions.numeric import dsum

    row = spark.createDataFrame(
        [(1.5,), (float("nan"),), (float("inf",),), (2.5,), (1e30,)],
        "v double",
    ).agg(dsum("v").alias("s")).collect()[0]
    # NaN / Inf / out-of-range terms are NULL (skipped), never a crash
    assert row.s == 4.0


def test_cdc_duplicate_seq_total_tiebreak(spark, tmp_path):
    """Round-7 probe find: an at-least-once change feed can land the
    same (key, seq) twice with different payloads (the probe's
    duplicate-custkey salt). The streaming struct-MAX resolved the
    tie by (op, name, segment) while the batch/oracle row_number
    carried no tiebreak at all — order-of-input luck, and the two
    sides disagreed. Pins: both sides resolve duplicate-seq ties by
    the SAME total order and therefore agree row-for-row."""
    sf = str(tmp_path)
    spark.createDataFrame(
        [
            # 15 is divisible by 3, 5, and 15: its log carries a
            # delete (seq 2) then updates (seq 3, 4) — and every
            # entry twice, because the key appears twice
            (15, "Dup A", 1, 1.0, "BUILDING"),
            (15, "Dup B", 2, 2.0, "MACHINERY"),
            (8, "Solo", 3, 3.0, "HOUSEHOLD"),
        ],
        "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    ).write.parquet(f"{sf}/customer.parquet")
    from psx_data_pipeline_spark.plans import QUERIES

    batch = {
        (r.c_custkey, r.name, r.segment, r.applied_seq)
        for r in QUERIES["cdc_apply"](spark, sf).collect()
    }
    # the delete-then-update key resurfaces at seq 4, and the
    # duplicate-seq tie resolves to the struct-max payload
    assert (15, "Dup B v3", "MACHINERY", 4) in batch
    assert not any(k == 15 and n != "Dup B v3" for (k, n, _, _) in batch)
    stream = {
        (r.c_custkey, r.name, r.segment, r.applied_seq)
        for r in QUERIES["stream_cdc_apply"](spark, sf).collect()
    }
    assert stream == batch


def test_cdc_all_deletes_yields_empty_table(spark, tmp_path):
    """Degenerate all-tombstones stream: every key's final op is a
    delete and nothing resurfaces — the merged table must be EMPTY on
    both the batch and streaming paths, not carry ghost rows (keys
    ending in a live seq < the tombstone's) or crash on the
    zero-survivor aggregate."""
    sf = str(tmp_path)
    # keys divisible by 5 but NOT by 3 get a delete at seq 2 and no
    # later update, so their final state is the tombstone
    spark.createDataFrame(
        [
            (5, "Gone A", 1, 1.0, "BUILDING"),
            (10, "Gone B", 2, 2.0, "MACHINERY"),
            (20, "Gone C", 3, 3.0, "HOUSEHOLD"),
        ],
        "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    ).write.parquet(f"{sf}/customer.parquet")
    from psx_data_pipeline_spark.plans import QUERIES

    assert QUERIES["cdc_apply"](spark, sf).count() == 0
    assert QUERIES["stream_cdc_apply"](spark, sf).count() == 0


def test_q9_nonfinite_retailprice_gated(spark, tmp_path):
    """A NaN/Inf p_retailprice poisons the profit term for ITS line
    only — the dsum TOTAL gate maps it to SQL NULL (skipped)
    identically in both engines, so the group survives with the
    finite lines' profit (round-8 probe class: non-finite values in
    a DIM column crossing an arithmetic seam)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare
    from tests.test_tpch_more import _write_rel

    d = dt.datetime(1996, 6, 1)
    _write_rel(
        tmp_path,
        orders=[(1, 1, d)],
        lineitem=[(1, 10, d, 1), (1, 10, d, 2), (1, 10, d, 3)],
        supplier=[(10, "s3", 3, 1.0)],
    )
    pq.write_table(
        pa.table({
            "p_partkey": pa.array([1, 2, 3], pa.int64()),
            "p_name": pa.array(["red ok", "red nan", "red inf"]),
            "p_brand": pa.array(["Brand#12"] * 3),
            "p_type": pa.array(["PROMO"] * 3),
            "p_size": pa.array([3] * 3, pa.int32()),
            "p_retailprice": pa.array([10.0, float("nan"), float("inf")]),
        }),
        f"{tmp_path}/part.parquet",
    )
    got = {r.supp_nation: r for r in QUERIES["tpch_q9_product_profit"](
        spark, str(tmp_path)).collect()}
    # all three lines keep their rows (n_lines counts them) but only
    # the finite-retailprice line contributes profit: 10 - 0.6*10*1 = 4
    assert got["NATION_3"].n_lines == 3
    assert got["NATION_3"].profit == 4.0
    ok, msg = compare(
        QUERIES["tpch_q9_product_profit"](spark, str(tmp_path)),
        ORACLE_SQL["tpch_q9_product_profit"], str(tmp_path),
    )
    assert ok, msg


def test_q15_duplicate_supplier_dim_fans_out_identically(spark, tmp_path):
    """A duplicate s_suppkey in the supplier dim fans the argmax
    join-back out to one row per dim copy — in BOTH engines, or the
    hash diverges (round-8 probe class: dim-PK violation)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare
    from tests.test_tpch_more import _write_rel

    d = dt.datetime(1996, 2, 1)
    _write_rel(
        tmp_path,
        orders=[(1, 1, d)],
        lineitem=[(1, 10, d, 1), (1, 20, d, 1)],
        supplier=[(10, "winner", 0, 1.0), (20, "loser", 0, 1.0)],
    )
    li = pq.read_table(f"{tmp_path}/lineitem.parquet").to_pydict()
    li["l_extendedprice"] = [100.0, 50.0]
    pq.write_table(pa.table(li), f"{tmp_path}/lineitem.parquet")
    sup = pq.read_table(f"{tmp_path}/supplier.parquet").to_pydict()
    sup["s_suppkey"] = sup["s_suppkey"] + [10]
    sup["s_name"] = sup["s_name"] + ["winner-dup"]
    sup["s_nationkey"] = sup["s_nationkey"] + [1]
    sup["s_acctbal"] = sup["s_acctbal"] + [2.0]
    pq.write_table(pa.table(sup), f"{tmp_path}/supplier.parquet")
    rows = QUERIES["tpch_q15_top_supplier"](spark, str(tmp_path)).collect()
    assert sorted(r.s_name for r in rows) == ["winner", "winner-dup"]
    assert all(r.rev_centi == 10000 for r in rows)
    ok, msg = compare(
        QUERIES["tpch_q15_top_supplier"](spark, str(tmp_path)),
        ORACLE_SQL["tpch_q15_top_supplier"], str(tmp_path),
    )
    assert ok, msg


def test_append_cutoff_date_domain_max(spark, tmp_path):
    """A last trade date of 9999-12-31 (legal, extreme) must yield a
    NULL next_date, not a year-10000 overflow: Spark's date_add
    happily wraps past the date domain and the Arrow/Python
    conversion then raises — one hostile row killed the whole query
    (round-9 probe finding)."""
    sf = str(tmp_path)
    spark.createDataFrame(
        [
            (1, 1, "O", 10.0, dt.datetime(2024, 1, 1), "1-URGENT"),
            (2, 1, "O", 20.0, dt.datetime(9999, 12, 31), "1-URGENT"),
            (3, 2, "O", 30.0, dt.datetime(2024, 1, 2), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.parquet(f"{sf}/orders.parquet")
    from psx_data_pipeline_spark.plans import QUERIES

    rows = {r.symbol_id: r for r in
            QUERIES["append_cutoff"](spark, sf).collect()}
    assert rows[1].last_date == dt.date(9999, 12, 31)
    assert rows[1].next_date is None
    assert rows[2].next_date == dt.date(2024, 1, 3)
