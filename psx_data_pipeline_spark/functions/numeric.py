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


# TOTAL-form gate for the decimal cast: NaN / ±Inf crash DuckDB's
# DECIMAL conversion (and 1e30-scale values would exhaust the 32
# integer digits within ~100 summed rows), where Spark raises at a
# different point — a one-sided crash on hostile doubles (round-6
# relational-probe finding, same class as MILLI_SQL's events fix).
# BETWEEN is false for NaN and ±Inf in BOTH engines (both order NaN
# above all values), so the gate maps every non-finite/out-of-range
# value to SQL NULL — skipped by SUM — identically. 1e24 leaves 10^8
# rows of worst-case decimal(38,6) headroom and is far beyond any
# real measure.
DSUM_BOUND = 1e24


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Exact TOTAL sum: non-finite/out-of-range → NULL (skipped),
    else cast to decimal(38, scale), sum exactly, cast back."""
    c = F.col(col) if isinstance(col, str) else col
    g = F.when(c.between(-DSUM_BOUND, DSUM_BOUND), c)
    return F.sum(g.cast(f"decimal({_PREC},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 6) -> Column:
    """Deterministic mean: exact decimal sum divided (in double) by count."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def dsum_sql(expr: str, scale: int = 6) -> str:
    """DuckDB oracle-side twin of dsum()."""
    g = (
        f"CASE WHEN ({expr}) BETWEEN -{DSUM_BOUND:g} AND {DSUM_BOUND:g}"
        f" THEN ({expr}) END"
    )
    return f"CAST(SUM(CAST(({g}) AS DECIMAL({_PREC},{scale}))) AS DOUBLE)"


def davg_sql(expr: str, scale: int = 6) -> str:
    """DuckDB oracle-side twin of davg()."""
    return f"({dsum_sql(expr, scale)} / COUNT({expr}))"


# --- total milli-int quantization ---------------------------------------------

# floor(value*1000) as BIGINT is the repo's quantized-value convention
# for events; it is PARTIAL on raw doubles: floor(Inf/NaN/1e30)·1000
# crashes Spark's ANSI long cast (and DuckDB's BIGINT cast) — found
# by extending the hostile events probe to non-finite values
# (round 6; it one-sided-crashed skew_salted_counts, event_cube and
# both value-summing stream jobs). MILLI_SQL is the TOTAL form:
# non-finite and out-of-range values map to NULL (skipped by SUM,
# like SQL NULLs), identically in both engines. The ±9e12 gate keeps
# each term ≤ 9e15, so an int64 SUM has ≥ 10^3-row headroom of
# worst-case terms and ~10^13 rows of realistic (≤ 10^6-milli)
# ones — the same documented-bound convention as BM25's rational.
MILLI_BOUND = 9e12  # single source for every gate below and in callers
MILLI_SQL = (
    "CASE WHEN {0} IS NULL OR isnan({0}) "
    f"OR {{0}} NOT BETWEEN -{MILLI_BOUND:g} AND {MILLI_BOUND:g} THEN NULL "
    "ELSE CAST(floor({0} * 1000) AS BIGINT) END"
)


def milli(col: str) -> Column:
    """Spark twin of MILLI_SQL (same expression text, same NULLs).
    Takes a column NAME, not a Column — the expression is a shared
    SQL template so both engines parse identical text."""
    if not isinstance(col, str):
        raise TypeError("milli() takes a column NAME (shared SQL template)")
    return F.expr(MILLI_SQL.format(col))


# Centi-int twin for 2-decimal money columns (account balances):
# same TOTAL form and bound as MILLI_SQL, scale 100. One template
# consumed verbatim by both engines — hand-spelling the gate twice
# is how the engines silently desynchronize (round-8 review find).
CENTI_SQL = (
    "CASE WHEN {0} IS NULL OR isnan({0}) "
    f"OR {{0}} NOT BETWEEN -{MILLI_BOUND:g} AND {MILLI_BOUND:g} THEN NULL "
    "ELSE CAST(floor({0} * 100) AS BIGINT) END"
)


def centi(col: str) -> Column:
    """Spark twin of CENTI_SQL (same expression text, same NULLs)."""
    if not isinstance(col, str):
        raise TypeError("centi() takes a column NAME (shared SQL template)")
    return F.expr(CENTI_SQL.format(col))


# --- exact BIGINT sum through DECIMAL(38,0) -------------------------------------

# SUM of already-quantized centi/milli BIGINT terms into a plain long
# wraps silently in non-ANSI Spark where DuckDB's BIGINT sum raises —
# the one-sided crash class the hostile probes hunt, reachable after
# only ~10^4 worst-case gated centi terms (9e14 each). Summing
# through DECIMAL(38,0) is exact for any feasible corpus (>10^22
# worst-case rows of headroom), and the final BIGINT cast is TOTAL:
# a beyond-int64 total degrades to NULL identically in both engines
# (NULL then propagates through compares/filters the same way).
# Deliberately NOT a decimal division helper: DECIMAL `div`/`//`
# rounding diverges between the engines (measured: 1.8e16 div 1500
# is 11999999999999 in Spark, 12000000000000 in DuckDB), so callers
# must divide AFTER this gate, on BIGINT, where both truncate alike.
BSUM_GATE = 9e18  # just inside int64 max (9.223e18)


def bsum_sql(expr: str) -> str:
    """Exact gated BIGINT sum — one SQL template for both engines."""
    s = f"SUM(CAST(({expr}) AS DECIMAL(38,0)))"
    return (
        f"CAST(CASE WHEN {s} BETWEEN -{BSUM_GATE:g} AND {BSUM_GATE:g} "
        f"THEN {s} END AS BIGINT)"
    )


def bsum(expr: str) -> Column:
    """Spark twin of bsum_sql (identical expression text)."""
    if not isinstance(expr, str):
        raise TypeError("bsum() takes SQL text (shared template)")
    return F.expr(bsum_sql(expr))
