"""Fixture-contract canary: fail LOUDLY and DIAGNOSTICALLY when the
driver-generated parquet fixtures change shape under the engine.

Round 3's only red came from exactly such a change — events.ts flipped
from int64 TIMESTAMP(NANOS) to timestamp[µs] between rounds, and the
local suite only caught it incidentally via nine query failures. This
test names the drifted table/column/type directly, so the next
environment change is a one-line diagnosis instead of a forensic one.

Also asserts the ts_us seam (sources/fixtures.ts_us_expr) agrees with
the DuckDB oracle's epoch_us(ts) value-for-value on sample rows — the
property every event-time oracle comparison rests on.
"""

from __future__ import annotations

import duckdb
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from psx_data_pipeline_spark.schemas import FIXTURE_TABLES
from psx_data_pipeline_spark.sources.fixtures import load_events, ts_us_expr
from tests.conftest import SF_CORRECT, SF_SMOKE

# Column name → acceptable Spark types, per table. Types the engine
# actually relies on; extra columns in the fixtures are fine, missing
# or re-typed ones are a contract break.
_INT = (T.LongType, T.IntegerType)
_STR = (T.StringType,)
_DOUBLE = (T.DoubleType,)
_DATEISH = (T.DateType, T.StringType, T.TimestampNTZType, T.TimestampType)
# every physical type events.ts has shipped as (or plausibly will):
_EVENT_TS = (T.LongType, T.TimestampNTZType, T.TimestampType)

EXPECTED: dict[str, dict[str, tuple[type, ...]]] = {
    "region": {"r_regionkey": _INT, "r_name": _STR},
    "nation": {"n_nationkey": _INT, "n_name": _STR, "n_regionkey": _INT},
    "customer": {"c_custkey": _INT, "c_name": _STR, "c_nationkey": _INT,
                 "c_acctbal": _DOUBLE, "c_mktsegment": _STR},
    "supplier": {"s_suppkey": _INT, "s_name": _STR, "s_nationkey": _INT,
                 "s_acctbal": _DOUBLE},
    "part": {"p_partkey": _INT, "p_name": _STR, "p_brand": _STR,
             "p_retailprice": _DOUBLE},
    "orders": {"o_orderkey": _INT, "o_custkey": _INT,
               "o_orderstatus": _STR, "o_totalprice": _DOUBLE,
               "o_orderdate": _DATEISH, "o_orderpriority": _STR},
    "lineitem": {"l_orderkey": _INT, "l_partkey": _INT, "l_suppkey": _INT,
                 "l_linenumber": _INT,
                 "l_quantity": (T.LongType, T.IntegerType, T.DoubleType),
                 "l_extendedprice": _DOUBLE, "l_discount": _DOUBLE,
                 "l_tax": _DOUBLE, "l_returnflag": _STR, "l_linestatus": _STR,
                 "l_shipdate": _DATEISH},
    "events": {"event_id": _INT, "ts": _EVENT_TS, "user_id": _INT,
               "event_type": _STR, "value": _DOUBLE, "props": _STR},
    "documents": {"doc_id": _INT, "text": _STR, "source": _STR,
                  "lang": _STR},
    "embeddings": {"vec_id": _INT, "embedding": (T.ArrayType,),
                   "label": _INT},
}


@pytest.mark.parametrize("table", FIXTURE_TABLES)
def test_fixture_schema_contract(spark, table):
    df = spark.read.parquet(f"{SF_CORRECT}/{table}.parquet")
    got = {f.name: f.dataType for f in df.schema.fields}
    expected = EXPECTED[table]
    problems = []
    for col, ok_types in expected.items():
        if col not in got:
            problems.append(f"column {col!r} MISSING (have: {sorted(got)})")
        elif not isinstance(got[col], ok_types):
            arrow = pq.read_schema(f"{SF_CORRECT}/{table}.parquet")
            problems.append(
                f"column {col!r} is {got[col].simpleString()} "
                f"(parquet physical: {arrow.field(col).type}); engine "
                f"handles {[t().simpleString() for t in ok_types if t is not T.ArrayType]}"
            )
    assert not problems, (
        f"fixture contract drift in {table}.parquet — the driver's "
        f"fixture writer changed under the engine: {'; '.join(problems)}"
    )


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_CORRECT])
def test_ts_us_seam_matches_oracle_epoch_us(spark, sf_dir):
    """The seam's epoch-µs must match DuckDB's epoch_us(ts) on the
    order-free (count, min, max) envelope; exact per-row parity is the
    next test."""
    ev = load_events(spark, sf_dir).select("event_id", "ts_us")
    s = ev.agg(
        F.count("*").alias("n"),
        F.min("ts_us").alias("lo"),
        F.max("ts_us").alias("hi"),
    ).first()
    d = duckdb.sql(
        f"""SELECT count(*) AS n, min(e) AS lo, max(e) AS hi
            FROM (SELECT epoch_us(ts) AS e
                  FROM '{sf_dir}/events.parquet')"""
    ).fetchone()
    assert (s["n"], s["lo"], s["hi"]) == d, (
        f"ts_us seam disagrees with DuckDB epoch_us at {sf_dir}: "
        f"spark (n,lo,hi)={(s['n'], s['lo'], s['hi'])} vs duckdb {d} — "
        "check ts_us_expr's handling of the current events.ts type "
        f"({ev.sparkSession.read.parquet(f'{sf_dir}/events.parquet').schema['ts'].dataType.simpleString()})"
    )


def test_ts_us_seam_exact_rows(spark):
    """Exact per-row parity on a deterministic sample (min/max guard
    above can miss interior drift)."""
    got = dict(
        load_events(spark, SF_SMOKE)
        .select("event_id", "ts_us")
        .where(F.col("event_id") % 97 == 0)
        .collect()
    )
    want = dict(
        duckdb.sql(
            f"""SELECT event_id, epoch_us(ts)
                FROM '{SF_SMOKE}/events.parquet'
                WHERE event_id % 97 = 0"""
        ).fetchall()
    )
    assert got == want


def test_testdata_checksums_unchanged():
    """The driver-generated fixtures are READ-ONLY inputs; every
    registered hash and floor derives from them. Round 8 proved they
    are corruptible from tests anyway: a test overwrote a HARD-LINKED
    base-table path, truncating the shared inode under the read-only
    sf0.01 part.parquet (restored from the hostile-probe corpus
    copies, byte-verified against two independent snapshots). The
    committed manifest pins every fixture file's md5 so any future
    mutation fails the suite immediately instead of silently skewing
    every oracle comparison after it."""
    import hashlib
    import json
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    manifest = json.load(open(os.path.join(here, "testdata_manifest.json")))
    bad = []
    for rel, want in manifest.items():
        path = f"/root/testdata/{rel}"
        got = hashlib.md5(open(path, "rb").read()).hexdigest()
        if got != want:
            bad.append((rel, want, got))
    assert not bad, (
        f"fixture files changed on disk: {bad} — /root/testdata is "
        "read-only input; find and fix the writer (a test writing "
        "over a linked/copied base path?), then restore the bytes"
    )
