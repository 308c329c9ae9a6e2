"""Exponentially weighted technical indicators over the OHLC layer.

The reference's planned Phase-4 analytics (/root/reference/README.md:
67-71: "moving averages and other indicators") names the EMA next to
the SMA `moving_avg` already implements; this module adds it in the
repo's integer-exact form so the oracle can hash-match it.

``ewma_prices`` — per-symbol EWMA of the daily close with a dyadic
kernel: weights 2^(K-1-i) for lags i = 0..K-1 (alpha = 1/2 over a
K = 8-day horizon, which carries 99.6 % of the infinite-kernel mass).
Dyadic weights make the indicator EXACTLY representable in integer
arithmetic: close quantizes through the MILLI_SQL total gate, the
kernel is an integer dot product, and the normalization divides by
the weight mass actually present (series heads and gate-NULLed days
shrink the denominator instead of biasing toward zero). Engine
parity notes: BIGINT intdiv truncates toward zero in BOTH engines
(Spark ``div``, DuckDB ``//`` — verified on negatives), and |num| <=
255 * 9e15 < 2^62, so ANSI never overflows.

100 TB shape: one shuffle to the (symbol, day) OHLC bars (map-side
combinable), then K-1 lag() columns over a per-symbol ordered window
— state is K values per symbol, no corpus-sized sort, no join at
all. At cluster scale the window partitions by symbol exactly like
``moving_avg``/``daily_returns`` and reuses their exchange when run
in the same stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from psx_data_pipeline_spark.functions.numeric import MILLI_SQL
from psx_data_pipeline_spark.plans.analytics import OHLC_SQL, _ohlc
from psx_data_pipeline_spark.plans.registry import query

_K = 8  # kernel horizon (days); weight of lag i is 2^(K-1-i)

_CM = MILLI_SQL.format("close")


def _kernel_sql() -> tuple[str, str]:
    """(numerator, denominator) over columns cm, l1..l{K-1} — the
    same expression text in both engines."""
    num, den = [], []
    for i in range(_K):
        w = 1 << (_K - 1 - i)
        col = "cm" if i == 0 else f"l{i}"
        num.append(f"{w} * coalesce({col}, 0)")
        den.append(f"CASE WHEN {col} IS NOT NULL THEN {w} ELSE 0 END")
    return " + ".join(num), " + ".join(den)


_NUM, _DEN = _kernel_sql()

_LAGS_SQL = ", ".join(f"lag(cm, {i}) OVER w AS l{i}" for i in range(1, _K))

EWMA_ORACLE = f"""
WITH ohlc AS ({OHLC_SQL}),
cm AS (
  SELECT symbol_id, trade_date, {_CM} AS cm FROM ohlc
),
lagged AS (
  SELECT symbol_id, trade_date, cm, {_LAGS_SQL}
  FROM cm
  WINDOW w AS (PARTITION BY symbol_id ORDER BY trade_date)
)
SELECT symbol_id, trade_date, cm AS close_milli,
       CAST({_DEN} AS BIGINT) AS weight_mass,
       CASE WHEN ({_DEN}) > 0
            THEN ({_NUM}) // ({_DEN}) END AS ewma_milli
FROM lagged
"""


@query("ewma_prices", EWMA_ORACLE)
def q_ewma_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dyadic-kernel EWMA of the daily close, integer-exact
    (module docstring)."""
    w = Window.partitionBy("symbol_id").orderBy("trade_date")
    df = _ohlc(spark, sf_dir).select(
        "symbol_id", "trade_date", F.expr(_CM).alias("cm")
    )
    for i in range(1, _K):
        df = df.withColumn(f"l{i}", F.lag("cm", i).over(w))
    return df.select(
        "symbol_id", "trade_date",
        F.col("cm").alias("close_milli"),
        F.expr(f"CAST({_DEN} AS BIGINT)").alias("weight_mass"),
        F.expr(
            f"CASE WHEN ({_DEN}) > 0 THEN ({_NUM}) div ({_DEN}) END"
        ).alias("ewma_milli"),
    )
