"""Hostile-orders probe: the dedicated salt for the LAST previously
under-salted fact table (round-10 judge ask #1). `orders` feeds the
22 TPC-H shapes, the OHLC/price families, the calendar/window
queries, and the incremental-ingest stream — and the driver's oracle
is known to be sensitive to the date-domain maximum.

The relational probe already covers the NULL-key / dup-key / NaN-Inf
basics on orders; THIS probe adds the classes the benign fixture (and
that probe) still lack, one hostile row per class:

- date-domain MINIMUM (0001-01-01) as well as the maximum — min/max
  aggregates, calendar sequence generation, and window frames must
  survive both ends without overflowing a date cast in either engine;
- duplicate (custkey, orderdate) pairs with different prices — any
  per-key "latest"/ordering pick without a TOTAL tiebreak is
  order-of-input luck and cross-engine divergent;
- an exact-key twin (same orderkey, custkey, AND date, different
  price) — row_number ties that leak a non-key column diverge;
- orphan custkey (no customer row) — join-type asymmetries between
  the Spark plan and its oracle become visible;
- string classes on status/priority (the orders schema's only text
  columns — the reference's clerk/comment fields don't exist here):
  empty, whitespace-only, lowercase, unicode/CJK/fullwidth,
  SQL-wildcard (%/_), regex metacharacters, the CSV NULL sentinel as
  a LITERAL value, embedded newline/tab/quote/comma, a 1000-char
  string, and near-miss priorities ("1-URGENT " padded, "1-urgent"
  cased, "0-EXTREME" unseen) — any LIKE/regexp/prefix/equality seam
  that treats these differently from DuckDB diverges;
- price classes: -0.0 (sign-of-zero hashing), denormal 5e-324
  (quantization floors), large-negative.

Any MISMATCH or one-sided crash is a real latent bug in either the
Spark plan or the oracle SQL.

Usage:
    python tools/hostile_orders_probe.py
    python tools/hostile_orders_probe.py --queries ohlc_daily
"""

from __future__ import annotations

import datetime as dt
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hostile_common import BASE, copy_untouched, run_probe  # noqa: E402

OUT = "/tmp/hostile_orders_corpus"

# fixture domain at sf0.01: orderkey ≤ 14999, custkey ≤ 1499,
# dates 1995-01-01 .. 2001-08-01, status ∈ {P,O,F},
# priority ∈ {1-URGENT .. 5-LOW}
_K = 950000


def _rows() -> list[dict]:
    def o(key, cust, status, price, date, prio):
        return {
            "o_orderkey": key, "o_custkey": cust, "o_orderstatus": status,
            "o_totalprice": price, "o_orderdate": date,
            "o_orderpriority": prio,
        }

    return [
        # --- date-domain EDGES (both ends; the max is the driver's
        # known sensitivity, the min is new here) ---
        o(_K + 1, 3, "O", 10.0, dt.datetime(1, 1, 1), "1-URGENT"),
        o(_K + 2, 3, "O", 20.0, dt.datetime(9999, 12, 31), "2-HIGH"),
        o(_K + 3, 3, "O", 30.0, dt.datetime(1899, 12, 31), "3-MEDIUM"),
        # --- duplicate (custkey, orderdate): the window-tiebreak
        # class — two orders, same key and day, different everything
        # else ---
        o(_K + 11, 7, "O", 11.0, dt.datetime(2000, 6, 15), "1-URGENT"),
        o(_K + 12, 7, "F", 22.0, dt.datetime(2000, 6, 15), "5-LOW"),
        # --- exact-key twin: same orderkey AND custkey AND date,
        # different price/status — any pick leaking a non-key column
        # must still agree across engines ---
        o(_K + 13, 8, "O", 33.0, dt.datetime(2000, 6, 16), "2-HIGH"),
        o(_K + 13, 8, "F", 44.0, dt.datetime(2000, 6, 16), "4-NOT SPECIFIED"),
        # --- orphan custkey: no such customer row exists ---
        o(_K + 14, 999999, "O", 55.0, dt.datetime(2000, 6, 17), "3-MEDIUM"),
        # --- status string classes ---
        o(_K + 21, 9, "", 1.0, dt.datetime(2000, 7, 1), "1-URGENT"),
        o(_K + 22, 9, "   ", 1.0, dt.datetime(2000, 7, 2), "1-URGENT"),
        o(_K + 23, 9, "o", 1.0, dt.datetime(2000, 7, 3), "1-URGENT"),
        o(_K + 24, 9, "FO", 1.0, dt.datetime(2000, 7, 4), "1-URGENT"),
        o(_K + 25, 9, "状态", 1.0, dt.datetime(2000, 7, 5), "1-URGENT"),
        o(_K + 26, 9, "\\N", 1.0, dt.datetime(2000, 7, 6), "1-URGENT"),
        o(_K + 27, 9, "a%b_c", 1.0, dt.datetime(2000, 7, 7), "1-URGENT"),
        o(_K + 28, 9, "x.*y", 1.0, dt.datetime(2000, 7, 8), "1-URGENT"),
        o(_K + 29, 9, "S" * 1000, 1.0, dt.datetime(2000, 7, 9), "1-URGENT"),
        o(_K + 30, 9, "line1\nline2", 1.0, dt.datetime(2000, 7, 10),
          "1-URGENT"),
        o(_K + 31, 9, 'qu"ote,comma', 1.0, dt.datetime(2000, 7, 11),
          "1-URGENT"),
        # --- priority string classes (near-misses of the enum) ---
        o(_K + 41, 11, "O", 2.0, dt.datetime(2000, 8, 1), "1-URGENT "),
        o(_K + 42, 11, "O", 2.0, dt.datetime(2000, 8, 2), "1-urgent"),
        o(_K + 43, 11, "O", 2.0, dt.datetime(2000, 8, 3), "0-EXTREME"),
        o(_K + 44, 11, "O", 2.0, dt.datetime(2000, 8, 4), "6-"),
        o(_K + 45, 11, "O", 2.0, dt.datetime(2000, 8, 5), "１-ＵＲＧＥＮＴ"),
        o(_K + 46, 11, "O", 2.0, dt.datetime(2000, 8, 6), "2-HIGH\t"),
        o(_K + 47, 11, "O", 2.0, dt.datetime(2000, 8, 7), ""),
        # --- price classes the relational probe lacks ---
        o(_K + 51, 13, "O", -0.0, dt.datetime(2000, 9, 1), "1-URGENT"),
        o(_K + 52, 13, "O", 5e-324, dt.datetime(2000, 9, 2), "1-URGENT"),
        o(_K + 53, 13, "O", -999999.99, dt.datetime(2000, 9, 3), "1-URGENT"),
    ]


def build_corpus() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    copy_untouched(OUT, salted=("orders",))
    tbl = pq.read_table(f"{BASE}/orders.parquet")
    hostile = pa.Table.from_pylist(_rows(), schema=tbl.schema)
    pq.write_table(
        pa.concat_tables([tbl, hostile.cast(tbl.schema)]),
        f"{OUT}/orders.parquet",
    )


def main() -> int:
    return run_probe(
        build_corpus, OUT,
        lambda sql: re.search(r"\borders\b", sql.lower()) is not None,
    )


if __name__ == "__main__":
    raise SystemExit(main())
