"""Sessionization + incremental/temporal operators.

The reference's temporal surface is the planned daily-append OHLC
layer (reference README.md:62-71) — last-date lookup, gap detection,
calendar ranges. Generalized here to the events stream: gap-based
sessionization (the batch twin of streaming session_window), keyed
latest-row selection, and windowed per-key incremental cutoffs.

Everything is window-function based: one shuffle on the partition
key, no driver-side state. At scale the partition key (user, symbol)
is the natural distribution key and skew is handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap from the
    previous event of the same key exceeds ``gap`` (same units as
    ts_col — pass µs for the events fixture).

    lag → gap flag → running sum = the classic batch sessionization;
    returns the input plus ``session_id`` (1-based per key).
    ``tiebreak`` makes the event order (hence the ids) deterministic
    when two events of a key share a timestamp.
    """
    order = [ts_col] + ([tiebreak] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    new_sess = F.when(
        (F.col(ts_col) - F.lag(ts_col).over(w)) > gap, 1
    ).otherwise(0)
    first = F.when(F.lag(ts_col).over(w).isNull(), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_sess + first).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )


def latest_per_key(df: DataFrame, key: str, order_col: str, tiebreak: str) -> DataFrame:
    """Data-borne 'latest snapshot' selection (replaces the reference's
    mtime-based file pick, reference update_ticker_info.py:47-56)."""
    w = Window.partitionBy(key).orderBy(F.desc(order_col), F.desc(tiebreak))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def detect_gaps(df: DataFrame, key: str, date_col: str, max_gap_days: int = 1) -> DataFrame:
    """Per-key date gaps larger than max_gap_days (the OHLC
    gap-detection check, SURVEY.md §7.3 step 5).

    Returns (key, gap_start, gap_end, gap_days) for each hole."""
    w = Window.partitionBy(key).orderBy("d")
    return (
        df.select(key, F.col(date_col).alias("d"))
        .withColumn("prev_d", F.lag("d").over(w))
        .where(
            F.col("prev_d").isNotNull()
            & (F.datediff(F.col("d"), F.col("prev_d")) > max_gap_days)
        )
        .select(
            F.col(key),
            F.col("prev_d").alias("gap_start"),
            F.col("d").alias("gap_end"),
            (F.datediff("d", "prev_d") - 1).cast("long").alias("gap_days"),
        )
    )
