"""Registry mapping query name → (spark, sf_dir) -> DataFrame callables
plus the equivalent DuckDB oracle SQL for the driver's correctness gate.

Contract (driver, __spark_entry__.py): every queries() entry should
have an oracle_sql() entry unless the operator is genuinely not
SQL-expressible (then the driver records a rows-only check). Column
names must match exactly between the Spark result and the oracle —
the driver sorts columns by name before hashing values.

Determinism rules every registered query follows:
  * no rand(), no now() — results depend only on the input tables;
  * floating aggregates go through exact decimal arithmetic
    internally and are cast to double at the end, so Spark and
    DuckDB produce bit-identical values regardless of partial-agg
    ordering (double summation is not associative; decimal is exact);
  * every computed column is aliased identically in both forms.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is the DuckDB SQL the
    driver runs side-by-side (omit only for non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco
