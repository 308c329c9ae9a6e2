"""Sentinel↔NULL boundary (SURVEY.md §7.4).

The reference encodes "missing" as sentinel strings — name "No record
found" or the symbol itself (scrape_tickers.py:101,
update_ticker_info.py:172), sector "Unknown" (:102, :175), url ""
(update_ticker_info.py:142). Inside the engine those are real NULLs
(so predicates compose null-safely); reference-parity output views
re-materialize the sentinels via coalesce. Both directions are pure
scan-side expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from psx_data_pipeline_spark.schemas import (
    SENTINEL_NAME,
    SENTINEL_SECTOR,
    SENTINEL_URL,
)


def sentinel_to_null(df: DataFrame, symbol_col: str = "symbol") -> DataFrame:
    """Ingest normalizer: sentinel values (and name == symbol, the
    reference's 'name never resolved' marker) become NULL."""
    name_null = F.when(
        F.col("name").eqNullSafe(F.lit(SENTINEL_NAME))
        | F.col("name").eqNullSafe(F.col(symbol_col)),
        F.lit(None).cast("string"),
    ).otherwise(F.col("name"))
    return (
        df.withColumn("name", name_null)
        .withColumn("sector", F.nullif(F.col("sector"), F.lit(SENTINEL_SECTOR)))
        .withColumn("url", F.nullif(F.col("url"), F.lit(SENTINEL_URL)))
    )


def parity_view(df: DataFrame, symbol_col: str = "symbol") -> DataFrame:
    """Reference-parity projection: NULLs re-materialize as the
    reference's sentinels (name falls back to the symbol,
    scrape_tickers.py:101-102). Columns beyond the normalized trio
    pass through untouched, so callers can carry flags derived from
    the pre-coalesce NULLs in the SAME projection (joining them back
    on the symbol would silently drop NULL-keyed rows)."""
    return df.withColumns({
        "name": F.coalesce(F.col("name"), F.col(symbol_col)),
        "sector": F.coalesce(F.col("sector"), F.lit(SENTINEL_SECTOR)),
        "url": F.coalesce(F.col("url"), F.lit(SENTINEL_URL)),
    })
