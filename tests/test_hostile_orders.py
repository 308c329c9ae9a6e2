"""Pin the degenerate-orders semantics the hostile-orders probe
established (tools/hostile_orders_probe.py, round 11): duplicate
order keys, duplicate (custkey, orderdate) days, and date-domain-edge
rows must flow through the OHLC/series family deterministically and
identically in both engines."""

from __future__ import annotations

import datetime as dt
import shutil

BASE = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part",
          "lineitem", "events", "documents", "embeddings")


def _write_orders(spark, sf, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    for t in TABLES:  # joins + the oracle's all-table views need these
        shutil.copy(f"{BASE}/{t}.parquet", f"{sf}/{t}.parquet")
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array([r[2] for r in rows], pa.string()),
            "o_totalprice": pa.array([r[3] for r in rows], pa.float64()),
            "o_orderdate": pa.array([r[4] for r in rows],
                                    pa.timestamp("us")),
            "o_orderpriority": pa.array([r[5] for r in rows], pa.string()),
        }),
        f"{sf}/orders.parquet",
    )


def test_duplicate_trade_id_has_total_open_close_tiebreak(spark, tmp_path):
    """Round-11 probe find: open/close were arg_min/arg_max on the
    trade id alone, so an exact-key twin (same orderkey, custkey AND
    date, two prices) tied on the ordering key and Spark vs DuckDB
    picked DIFFERENT prices — the divergent close then poisoned every
    downstream return/moving-average/EWMA frame (4 of 36 probe
    queries red). Pins: the pick orders by the TOTAL (id, price) key,
    so the twin's bar is (open=min-price, close=max-price) on both
    engines, deterministically."""
    sf = str(tmp_path)
    _write_orders(spark, sf, [
        (13, 8, "O", 33.0, dt.datetime(2000, 6, 16), "2-HIGH"),
        (13, 8, "F", 44.0, dt.datetime(2000, 6, 16), "4-NOT SPECIFIED"),
        (14, 8, "O", 10.0, dt.datetime(2000, 6, 17), "1-URGENT"),
    ])
    from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare

    bars = {r.trade_date: r for r in
            QUERIES["ohlc_daily"](spark, sf).collect()}
    twin = bars[dt.date(2000, 6, 16)]
    # same id ⇒ price breaks the tie: struct-min picks 33, struct-max 44
    assert (twin.open, twin.close) == (33.0, 44.0)
    assert (twin.high, twin.low, twin.volume) == (44.0, 33.0, 2)
    for name in ("ohlc_daily", "daily_returns", "moving_avg",
                 "ewma_prices"):
        ok, msg = compare(QUERIES[name](spark, sf), ORACLE_SQL[name], sf)
        assert ok, f"{name}: {msg}"


def test_null_trade_id_sorts_identically(spark, tmp_path):
    """A NULL orderkey must occupy the same slot in the open/close
    ordering on both sides (the struct key coalesces it to long-min,
    i.e. FIRST): open = the NULL-id trade, close = the max-id one."""
    sf = str(tmp_path)
    _write_orders(spark, sf, [
        (None, 3, "O", 50.0, dt.datetime(2000, 1, 5), "1-URGENT"),
        (7, 3, "O", 60.0, dt.datetime(2000, 1, 5), "1-URGENT"),
    ])
    from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare

    bar = QUERIES["ohlc_daily"](spark, sf).collect()[0]
    assert (bar.open, bar.close) == (50.0, 60.0)
    ok, msg = compare(
        QUERIES["ohlc_daily"](spark, sf), ORACLE_SQL["ohlc_daily"], sf)
    assert ok, msg


def test_date_domain_min_flows_through_series(spark, tmp_path):
    """0001-01-01 (the date-domain MINIMUM — the probe's new edge; the
    maximum was the round-9 find) must stay an ordinary first bar:
    no underflowing date arithmetic, window frames anchored on it."""
    sf = str(tmp_path)
    _write_orders(spark, sf, [
        (1, 2, "O", 10.0, dt.datetime(1, 1, 1), "1-URGENT"),
        (2, 2, "O", 30.0, dt.datetime(2000, 1, 2), "1-URGENT"),
    ])
    from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare

    ma = {r.trade_date: r.ma7 for r in
          QUERIES["moving_avg"](spark, sf).collect()}
    assert ma[dt.date(1, 1, 1)] == 10.0
    assert ma[dt.date(2000, 1, 2)] == 20.0  # 7-ROW frame spans both bars
    for name in ("moving_avg", "daily_returns", "latest_per_key"):
        ok, msg = compare(QUERIES[name](spark, sf), ORACLE_SQL[name], sf)
        assert ok, f"{name}: {msg}"


def test_hostile_status_and_priority_strings_survive(spark, tmp_path):
    """Unicode/fullwidth, SQL-wildcard, regex-metachar, embedded
    newline/quote, padded and empty status/priority strings must pass
    through the orders pipelines as opaque values — no LIKE/regexp
    seam may treat them differently from the oracle."""
    sf = str(tmp_path)
    d = dt.datetime(2000, 7, 1)
    strs = ["", "   ", "状态", "a%b_c", "x.*y", "line1\nline2",
            'qu"ote,comma', "1-URGENT ", "1-urgent", "１-ＵＲＧＥＮＴ"]
    _write_orders(spark, sf, [
        (100 + i, 9, s, 1.0 + i, d + dt.timedelta(days=i), s)
        for i, s in enumerate(strs)
    ])
    from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare

    for name in ("late_order_priority", "symbol_rollup",
                 "top_building_orders", "latest_per_key"):
        ok, msg = compare(QUERIES[name](spark, sf), ORACLE_SQL[name], sf)
        assert ok, f"{name}: {msg}"
