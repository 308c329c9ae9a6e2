"""Deterministic floating aggregation.

Double summation is not associative, so a Spark partial-agg tree and
DuckDB's serial sum can disagree in the last bits — enough to fail an
exact value-hash oracle check. The fix: round each input double to a
fixed decimal scale (exact), sum exactly in decimal, and cast the
exact total back to double. Both engines then produce bit-identical
results for any partitioning, which also makes the operators safe to
re-plan under AQE at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Wide enough to never overflow a 100 TB-scale sum of prices:
# decimal(38, s) with s=6 leaves 32 integer digits.
_PREC = 38


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Exact sum: cast to decimal(38, scale), sum, cast back to double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({_PREC},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 6) -> Column:
    """Deterministic mean: exact decimal sum divided (in double) by count."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def dsum_sql(expr: str, scale: int = 6) -> str:
    """DuckDB oracle-side twin of dsum()."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({_PREC},{scale}))) AS DOUBLE)"


def davg_sql(expr: str, scale: int = 6) -> str:
    """DuckDB oracle-side twin of davg()."""
    return f"({dsum_sql(expr, scale)} / COUNT({expr}))"
