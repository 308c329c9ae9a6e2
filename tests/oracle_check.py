"""Local stand-in for the driver's DuckDB oracle comparison.

Mirrors the documented check (__spark_entry__.py): row count, column
names, and an order-insensitive value hash. Round-1 lesson: the
driver's hash is TYPE-sensitive (DuckDB ``SUM(int)`` returns HUGEINT,
which hashed differently from Spark's BIGINT even though the values
were equal), so this harness fetches DuckDB results through Arrow —
where HUGEINT surfaces as Decimal — and canonicalizes ints, floats,
and Decimals distinctly. Local green must predict driver green.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    tbl = con.execute(sql).arrow()
    cols = tbl.column_names
    rows = [tuple(d[c] for c in cols) for d in tbl.to_pylist()]
    con.close()
    return cols, rows


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # kept distinct from both int and float on purpose: a query
        # that leaks an unconverted decimal/HUGEINT must fail locally
        return "dec:" + format(v.normalize(), "f")
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, dict, set)):
        # The DRIVER's pandas canonicalizer crashes on list cells
        # ("unhashable type: 'list'"), so the local gate must reject
        # them too — round 7 shipped two driver-red queries because
        # this branch used to stringify lists and pass. Serialize
        # arrays in the final projection on BOTH sides instead
        # (concat_ws vs array_to_string; coalesce the empty-array
        # NULL-vs-'' divergence).
        raise TypeError(
            f"driver-unhashable container cell {type(v).__name__}: "
            "registered queries must serialize array/map/struct "
            "outputs to strings in the final projection"
        )
    return str(v)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon(r[i]) for i in order) for r in rows)


def compare(spark_df, oracle_sql: str, sf_dir: str):
    """Return (ok, message) comparing a Spark DataFrame against DuckDB."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = duckdb_run(oracle_sql, sf_dir)
    if sorted(map(str.lower, s_cols)) != sorted(map(str.lower, d_cols)):
        return False, f"schema mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    s_canon = _canon_rows([c.lower() for c in s_cols], s_rows)
    d_canon = _canon_rows([c.lower() for c in d_cols], d_rows)
    if s_canon != d_canon:
        diffs = [(a, b) for a, b in zip(s_canon, d_canon) if a != b][:5]
        return False, f"value mismatch; first diffs: {diffs}"
    return True, "ok"
