"""Hostile relational probe: the third hostile-data probe, covering
the TPC-H-ish tables (customer / orders / lineitem / part) that feed
the relational, ticker-sync, SCD, and OHLC query families.

Salts sf0.01 with adversarial rows — NULL keys (join/partition
behavior), NULL dates (window ordering: Spark NULLS FIRST vs DuckDB
NULLS LAST), NULL and negative prices/quantities (SUM/percentile
null-skipping, sign-sensitive arithmetic), NULL group keys
(segment/brand/status), pre-1900 and far-future dates, and NULL
text fields feeding the symbol/name derivations — then re-runs the
full DuckDB oracle comparison for every query whose oracle reads one
of these tables. Any MISMATCH or one-sided crash is a real latent
bug in either the Spark plan or the oracle SQL.

Usage:
    python tools/hostile_relational_probe.py
    python tools/hostile_relational_probe.py --queries pricing_summary
"""

from __future__ import annotations

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hostile_common import BASE, copy_untouched, run_probe  # noqa: E402

OUT = "/tmp/hostile_relational_corpus"

_SALTED = ("customer", "orders", "lineitem", "part", "supplier")


def _append(table: str, rows: list[dict]) -> None:
    """Append hostile rows through pyarrow, preserving the fixture's
    exact physical types (COPY-through-DuckDB normalizes timestamps)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{BASE}/{table}.parquet")
    hostile = pa.Table.from_pylist(rows, schema=tbl.schema)
    pq.write_table(
        pa.concat_tables([tbl, hostile.cast(tbl.schema)]),
        f"{OUT}/{table}.parquet",
    )


def build_corpus() -> None:
    copy_untouched(OUT, salted=_SALTED)

    _append("customer", [
        # NULL name/segment/balance; NULL nationkey (drops from joins)
        {"c_custkey": 900001, "c_name": None, "c_nationkey": 0,
         "c_acctbal": 10.0, "c_mktsegment": "BUILDING"},
        {"c_custkey": 900002, "c_name": "Hostile Corp", "c_nationkey": None,
         "c_acctbal": 10.0, "c_mktsegment": "BUILDING"},
        {"c_custkey": 900003, "c_name": "Null Segment", "c_nationkey": 1,
         "c_acctbal": None, "c_mktsegment": None},
        {"c_custkey": 900004, "c_name": "Negative Balance", "c_nationkey": 2,
         "c_acctbal": -9999.99, "c_mktsegment": "AUTOMOBILE"},
        {"c_custkey": None, "c_name": "Null Key Inc", "c_nationkey": 3,
         "c_acctbal": 5.0, "c_mktsegment": "MACHINERY"},
        {"c_custkey": 900005, "c_name": "NaN Balance", "c_nationkey": 1,
         "c_acctbal": float("nan"), "c_mktsegment": "BUILDING"},
        {"c_custkey": 900006, "c_name": "Inf Balance", "c_nationkey": 1,
         "c_acctbal": float("inf"), "c_mktsegment": "BUILDING"},
        # DUPLICATE KEY rows: the same custkey appears twice with
        # different attributes. For the CDC family this manufactures
        # duplicate (k, seq) log entries — an at-least-once change
        # feed replaying a batch — where any last-writer-wins pick
        # without a TOTAL tiebreak is nondeterministic (and therefore
        # cross-engine divergent). 900015 is divisible by 3 and 5
        # (dup delete + dup update batches), 900007 by 7 (dup insert
        # batch); one pair carries a NULL name so the tiebreak's NULL
        # ordering is exercised too.
        {"c_custkey": 900015, "c_name": "Dup A", "c_nationkey": 1,
         "c_acctbal": 1.0, "c_mktsegment": "BUILDING"},
        {"c_custkey": 900015, "c_name": "Dup B", "c_nationkey": 2,
         "c_acctbal": 2.0, "c_mktsegment": "MACHINERY"},
        {"c_custkey": 900007, "c_name": "Dup C", "c_nationkey": 3,
         "c_acctbal": 3.0, "c_mktsegment": "HOUSEHOLD"},
        {"c_custkey": 900007, "c_name": None, "c_nationkey": 4,
         "c_acctbal": 4.0, "c_mktsegment": None},
        # PAYLOAD twins (round 12): identical (custkey, name),
        # differing only in segment/balance — any pick ordered by
        # (key, name) alone emits engine-arbitrary ride-along columns.
        # 900021 (%5=1, %7=3) sits in BOTH snapshot views (unchanged
        # class); 900011 (%7=0, %5=1) is the deleted class, so the
        # twins flow through the diff's full-outer join too.
        {"c_custkey": 900021, "c_name": "Payload Twin Co",
         "c_nationkey": 1, "c_acctbal": 5.0, "c_mktsegment": "BUILDING"},
        {"c_custkey": 900021, "c_name": "Payload Twin Co",
         "c_nationkey": 1, "c_acctbal": 7.5, "c_mktsegment": "MACHINERY"},
        {"c_custkey": 900011, "c_name": "Deleted Twin Co",
         "c_nationkey": 2, "c_acctbal": 1.0, "c_mktsegment": "BUILDING"},
        {"c_custkey": 900011, "c_name": "Deleted Twin Co",
         "c_nationkey": 2, "c_acctbal": 2.0, "c_mktsegment": "FURNITURE"},
    ])
    _append("orders", [
        {"o_orderkey": 900001, "o_custkey": None, "o_orderstatus": "O",
         "o_totalprice": 100.0,
         "o_orderdate": dt.datetime(2024, 1, 10), "o_orderpriority": "1-URGENT"},
        {"o_orderkey": 900002, "o_custkey": 1, "o_orderstatus": None,
         "o_totalprice": 100.0,
         "o_orderdate": dt.datetime(2024, 1, 11), "o_orderpriority": None},
        {"o_orderkey": 900003, "o_custkey": 1, "o_orderstatus": "F",
         "o_totalprice": None,
         "o_orderdate": None, "o_orderpriority": "2-HIGH"},
        {"o_orderkey": 900004, "o_custkey": 2, "o_orderstatus": "F",
         "o_totalprice": -500.0,
         "o_orderdate": dt.datetime(1899, 12, 31), "o_orderpriority": "3-MEDIUM"},
        {"o_orderkey": 900006, "o_custkey": 3, "o_orderstatus": "O",
         "o_totalprice": float("nan"), "o_orderdate": dt.datetime(2024, 1, 6),
         "o_orderpriority": "3-MEDIUM"},
        {"o_orderkey": 900007, "o_custkey": 3, "o_orderstatus": "O",
         "o_totalprice": float("inf"), "o_orderdate": dt.datetime(2024, 1, 7),
         "o_orderpriority": "3-MEDIUM"},
        {"o_orderkey": 900008, "o_custkey": 3, "o_orderstatus": "O",
         "o_totalprice": 1e30, "o_orderdate": dt.datetime(2024, 1, 8),
         "o_orderpriority": "3-MEDIUM"},
        {"o_orderkey": 900005, "o_custkey": 2, "o_orderstatus": "O",
         "o_totalprice": 0.0,
         "o_orderdate": dt.datetime(2099, 6, 1), "o_orderpriority": "4-LOW"},
        # DUPLICATE orderkey: a fact-PK violation — the lineitem ↔
        # orders joins (Q4/Q12/Q21's exists/anti shapes, Q13's counts)
        # must fan out identically in both engines, and any
        # keep-one-per-key pick must carry a TOTAL tiebreak
        {"o_orderkey": 900010, "o_custkey": 4, "o_orderstatus": "O",
         "o_totalprice": 10.0,
         "o_orderdate": dt.datetime(2024, 2, 1), "o_orderpriority": "1-URGENT"},
        {"o_orderkey": 900010, "o_custkey": 5, "o_orderstatus": "F",
         "o_totalprice": 20.0,
         "o_orderdate": dt.datetime(2024, 2, 2), "o_orderpriority": "5-LOW"},
        # timestamp-domain maximum: 9999-12-31 must stay a plain
        # comparable date (band predicates put it in the last band,
        # never overflow a date cast) in BOTH engines
        {"o_orderkey": 900011, "o_custkey": 4, "o_orderstatus": "O",
         "o_totalprice": 30.0,
         "o_orderdate": dt.datetime(9999, 12, 31),
         "o_orderpriority": "2-HIGH"},
        # REFERENTIAL twins (round 12): orders pointing AT the
        # duplicated/payload-twinned customer keys — the c↔o joins
        # (Q13 counts, Q10/Q22 aggregates, the snapshot views) must
        # fan out 2× identically in both engines
        {"o_orderkey": 900030, "o_custkey": 900015, "o_orderstatus": "O",
         "o_totalprice": 40.0,
         "o_orderdate": dt.datetime(2024, 3, 1), "o_orderpriority": "1-URGENT"},
        {"o_orderkey": 900031, "o_custkey": 900015, "o_orderstatus": "F",
         "o_totalprice": 50.0,
         "o_orderdate": dt.datetime(2024, 3, 2), "o_orderpriority": "4-LOW"},
        {"o_orderkey": 900032, "o_custkey": 900021, "o_orderstatus": "O",
         "o_totalprice": 60.0,
         "o_orderdate": dt.datetime(2024, 3, 3), "o_orderpriority": "2-HIGH"},
    ])
    _append("lineitem", [
        {"l_orderkey": 900001, "l_partkey": 1, "l_suppkey": 1,
         "l_linenumber": 1, "l_quantity": None, "l_extendedprice": 10.0,
         "l_discount": 0.0, "l_tax": 0.0, "l_returnflag": "N",
         "l_linestatus": "O", "l_shipdate": dt.datetime(2024, 1, 12)},
        {"l_orderkey": 900001, "l_partkey": 1, "l_suppkey": 1,
         "l_linenumber": 2, "l_quantity": -5.0, "l_extendedprice": -50.0,
         "l_discount": 1.0, "l_tax": 0.5, "l_returnflag": None,
         "l_linestatus": None, "l_shipdate": None},
        {"l_orderkey": 900002, "l_partkey": None, "l_suppkey": None,
         "l_linenumber": 1, "l_quantity": 1.0, "l_extendedprice": None,
         "l_discount": None, "l_tax": None, "l_returnflag": "R",
         "l_linestatus": "F", "l_shipdate": dt.datetime(1899, 12, 31)},
        # non-finite / overflow doubles: the class that one-sided-
        # crashed four events queries (floor(Inf) errors in DuckDB's
        # BIGINT cast, overflows differently under Spark ANSI) —
        # every quantity/price seam must route them through a TOTAL
        # quantization form or an explicit finite gate
        {"l_orderkey": 900003, "l_partkey": 2, "l_suppkey": 2,
         "l_linenumber": 1, "l_quantity": float("nan"),
         "l_extendedprice": 10.0, "l_discount": 0.0, "l_tax": 0.0,
         "l_returnflag": "N", "l_linestatus": "O",
         "l_shipdate": dt.datetime(2024, 1, 13)},
        {"l_orderkey": 900003, "l_partkey": 2, "l_suppkey": 2,
         "l_linenumber": 2, "l_quantity": float("inf"),
         "l_extendedprice": float("inf"), "l_discount": 0.0, "l_tax": 0.0,
         "l_returnflag": "N", "l_linestatus": "O",
         "l_shipdate": dt.datetime(2024, 1, 14)},
        {"l_orderkey": 900003, "l_partkey": 2, "l_suppkey": 2,
         "l_linenumber": 3, "l_quantity": float("-inf"),
         "l_extendedprice": -10.0, "l_discount": 0.0, "l_tax": 0.0,
         "l_returnflag": "N", "l_linestatus": "O",
         "l_shipdate": dt.datetime(2024, 1, 15)},
        {"l_orderkey": 900003, "l_partkey": 2, "l_suppkey": 2,
         "l_linenumber": 4, "l_quantity": 1e30, "l_extendedprice": 1e30,
         "l_discount": 0.0, "l_tax": 0.0, "l_returnflag": "N",
         "l_linestatus": "O", "l_shipdate": dt.datetime(2024, 1, 16)},
        # shipdate at the timestamp-domain maximum (see orders 900011)
        {"l_orderkey": 900004, "l_partkey": 2, "l_suppkey": 2,
         "l_linenumber": 1, "l_quantity": 1.0, "l_extendedprice": 10.0,
         "l_discount": 0.0, "l_tax": 0.0, "l_returnflag": "N",
         "l_linestatus": "O", "l_shipdate": dt.datetime(9999, 12, 31)},
        # Q15 FORCED MULTI-WAY TIE: suppliers 900021/900022 each ship
        # exactly one line in the Q15 quarter with identical revenue
        # (1e7·100 = 1e9 centi, exact in double, far above any
        # fixture supplier's quarter) — the max-equality join must
        # return BOTH co-leaders in both engines, and the bsum centi
        # quantization must make the tie exact, never float-fuzzy
        {"l_orderkey": 900020, "l_partkey": 3, "l_suppkey": 900021,
         "l_linenumber": 1, "l_quantity": 1.0,
         "l_extendedprice": 10000000.0, "l_discount": 0.0, "l_tax": 0.0,
         "l_returnflag": "N", "l_linestatus": "O",
         "l_shipdate": dt.datetime(1996, 2, 15)},
        {"l_orderkey": 900020, "l_partkey": 3, "l_suppkey": 900022,
         "l_linenumber": 2, "l_quantity": 1.0,
         "l_extendedprice": 10000000.0, "l_discount": 0.0, "l_tax": 0.0,
         "l_returnflag": "N", "l_linestatus": "O",
         "l_shipdate": dt.datetime(1996, 2, 16)},
        # REFERENTIAL twins (round 12): lines pointing AT the
        # duplicated o_orderkey 900010 — the o↔l equi/exists/anti
        # joins (Q4/Q12/Q18/Q21 shapes, late_order_priority) see a
        # 2×2 fan on the equi side and a did-any-line-exist answer
        # on the semi side; both engines must agree on both
        {"l_orderkey": 900010, "l_partkey": 4, "l_suppkey": 3,
         "l_linenumber": 1, "l_quantity": 2.0, "l_extendedprice": 20.0,
         "l_discount": 0.0, "l_tax": 0.0, "l_returnflag": "N",
         "l_linestatus": "O", "l_shipdate": dt.datetime(2024, 2, 5)},
        {"l_orderkey": 900010, "l_partkey": 4, "l_suppkey": 3,
         "l_linenumber": 2, "l_quantity": 3.0, "l_extendedprice": 30.0,
         "l_discount": 0.1, "l_tax": 0.0, "l_returnflag": "R",
         "l_linestatus": "F", "l_shipdate": dt.datetime(2024, 2, 6)},
    ])
    _append("part", [
        {"p_partkey": 900001, "p_name": None, "p_brand": None,
         "p_type": None, "p_size": None, "p_retailprice": None},
        {"p_partkey": 900002, "p_name": "hostile part", "p_brand": "Brand#H",
         "p_type": "HOSTILE", "p_size": -1, "p_retailprice": -1.0},
        # non-finite retail prices flow into Q9's profit expression
        # (extprice·(1-disc) − 0.6·retailprice·qty): the whole term
        # must route through the dsum TOTAL gate, not crash one
        # engine's decimal cast
        {"p_partkey": 900003, "p_name": "red hostile", "p_brand": "Brand#H",
         "p_type": "HOSTILE", "p_size": 1, "p_retailprice": float("nan")},
        {"p_partkey": 900004, "p_name": "red hostile inf",
         "p_brand": "Brand#H", "p_type": "HOSTILE", "p_size": 1,
         "p_retailprice": float("inf")},
        # DUPLICATE partkey: a dim-PK violation fans the fact join
        # out — both engines must fan out (and gate) identically
        {"p_partkey": 1, "p_name": "small dup", "p_brand": "Brand#D",
         "p_type": "DUP", "p_size": 2, "p_retailprice": 5.0},
    ])
    _append("supplier", [
        # NULL key never equi-joins; NULL name must survive output
        {"s_suppkey": None, "s_name": "Null Key Supplies",
         "s_nationkey": 1, "s_acctbal": 1.0},
        {"s_suppkey": 900001, "s_name": None, "s_nationkey": None,
         "s_acctbal": float("nan")},
        # DUPLICATE suppkey: Q15/Q20's join-back to the supplier dim
        # fans out — identically in both engines or not at all
        {"s_suppkey": 1, "s_name": "Dup Supplier", "s_nationkey": 2,
         "s_acctbal": -5.0},
        # the Q15 forced-tie co-leaders (see lineitem 900020)
        {"s_suppkey": 900021, "s_name": "Tie Supplier A",
         "s_nationkey": 1, "s_acctbal": 0.0},
        {"s_suppkey": 900022, "s_name": "Tie Supplier B",
         "s_nationkey": 2, "s_acctbal": 0.0},
    ])


def main() -> int:
    return run_probe(
        build_corpus, OUT,
        lambda sql: any(t in sql.lower() for t in _SALTED),
    )


if __name__ == "__main__":
    raise SystemExit(main())
