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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    strict: bool = True,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Point-in-time (as-of) join: for each left row, the single
    latest right row of the same key with right_ts < left_ts
    (``strict=False`` allows <=). Matches DuckDB's ASOF JOIN.

    Implementation is the union-and-carry-forward form, NOT a range
    join: tag both inputs, union them, and carry the most recent
    right-side values forward with one window over (key, ts). A
    range/theta join explodes with the match-window width; this
    shape shuffles each row exactly once regardless of time spans —
    the scalable as-of at any data size. Ties within a timestamp are
    resolved by sorting right rows first (strict) or last (<=);
    ``right_tiebreak`` names a right-side column that makes the pick
    among DUPLICATE (key, right_ts) right rows deterministic (the row
    with the greatest tiebreak value wins — max_by semantics);
    without it the winner is partitioning-dependent.
    """
    lt = left.withColumn("__t", F.col(left_ts).cast("long")).withColumn(
        "__side", F.lit(1)
    )
    # strict: a right row at the same instant must NOT be visible to
    # the left row → right sorts after left at equal ts. Non-strict:
    # right sorts first so last_value picks it up.
    rt = (
        right.select(
            key,
            F.col(right_ts).cast("long").alias("__t"),
            *[F.col(c).alias(f"__r_{c}") for c in right_cols],
            (
                F.col(right_tiebreak).cast("long")
                if right_tiebreak
                else F.lit(0)
            ).alias("__tb"),
        )
        .withColumn("__side", F.lit(2) if strict else F.lit(0))
    )
    carried = [f"__r_{c}" for c in right_cols]
    # left rows get a NULL __tb (nulls sort first under asc, and left
    # ordering among themselves is immaterial — they carry no values)
    allcols = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy("__t", "__side", "__tb")
        .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    )
    # strict mode looks at rows strictly before the current row in
    # (ts, side) order; right rows at an equal ts sort later, so the
    # preceding frame can only contain right rows with __t < left __t
    filled = allcols.select(
        "*",
        *[F.last(c, ignorenulls=True).over(w).alias(f"__f_{c}") for c in carried],
    )
    out = filled.where(F.col("__side") == 1).drop(*carried, "__side", "__tb")
    for c in right_cols:
        out = out.withColumnRenamed(f"__f___r_{c}", f"right_{c}")
    return out.drop("__t")
