"""Structured-Streaming queries, oracle-checked.

Each query runs a checkpointed `Trigger.AvailableNow` stream over the
static events fixture to completion and returns the materialized
result — deterministic under replay, so the driver's DuckDB oracle
checks the *streaming* engine's output value-for-value against the
equivalent batch SQL (the strongest correctness statement available
for a streaming operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.streaming.jobs import (
    running_user_totals,
    streaming_sessionize,
    windowed_event_counts,
)

_HOUR_US = 3600 * 1_000_000
_GAP_US = 30 * 60 * 1_000_000

STREAM_WINDOW_ORACLE = f"""
SELECT (epoch_us(ts) // {_HOUR_US}) * {_HOUR_US} AS win_start_us,
       event_type, COUNT(*) AS n,
       CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS value_k
FROM events GROUP BY 1, 2
"""


@query("stream_window_counts", STREAM_WINDOW_ORACLE)
def q_stream_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked hourly tumbling-window counts, run as a real
    streaming query (streaming/jobs.py)."""
    return windowed_event_counts(spark, sf_dir)


STREAM_SESSIONIZE_ORACLE = f"""
WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
lagged AS (
  SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS prev
  FROM ev
),
flagged AS (
  SELECT *, CASE WHEN prev IS NULL OR ts_us - prev >= {_GAP_US}
                 THEN 1 ELSE 0 END AS new_s
  FROM lagged
),
sess AS (
  SELECT *, SUM(new_s) OVER (
    PARTITION BY user_id ORDER BY ts_us
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id, MIN(ts_us) AS session_start_us,
       MAX(ts_us) + {_GAP_US} AS session_end_us,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id, sid
"""


@query("stream_sessionize", STREAM_SESSIONIZE_ORACLE)
def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native `session_window` stateful sessionization (30-min gap,
    session end = last event + gap). The oracle is the batch
    gaps-and-islands SQL with the session_window boundary rule
    (a gap of exactly 30 min starts a new session — half-open
    windows), which must and does agree with the streaming state
    machine."""
    return streaming_sessionize(spark, sf_dir)


STREAM_USER_TOTALS_ORACLE = """
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS value_k,
       MAX(event_id) AS max_event_id
FROM events GROUP BY user_id
"""


@query("stream_user_totals", STREAM_USER_TOTALS_ORACLE)
def q_stream_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (`applyInPandasWithState`) carrying
    per-user running totals; over a single-batch replay the 'update'
    stream emits exactly the final aggregates."""
    return running_user_totals(spark, sf_dir)


STREAM_ATTRIBUTION_ORACLE = """
WITH c AS (
  SELECT event_id AS click_id, user_id, epoch_us(ts) AS click_ts_us
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS purchase_ts_us
  FROM events WHERE event_type = 'purchase'
)
SELECT p.user_id, p.purchase_id, c.click_id,
       p.purchase_ts_us, c.click_ts_us
FROM p JOIN c ON p.user_id = c.user_id
 AND c.click_ts_us >= p.purchase_ts_us - 3600000000
 AND c.click_ts_us <= p.purchase_ts_us
"""


@query("stream_click_attribution", STREAM_ATTRIBUTION_ORACLE)
def q_stream_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (purchase ← clicks within the
    preceding hour), run as a real watermark-bounded streaming join;
    the oracle is the equivalent batch range join."""
    from psx_data_pipeline_spark.streaming.jobs import (
        stream_stream_click_attribution,
    )

    return stream_stream_click_attribution(spark, sf_dir)


STREAM_DEDUP_ORACLE = """
SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
FROM events
"""


@query("stream_dedup", STREAM_DEDUP_ORACLE)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-bounded streaming deduplication
    (`dropDuplicatesWithinWatermark`) over a twice-delivered feed;
    the oracle is simply the distinct batch table — every event
    exactly once."""
    from psx_data_pipeline_spark.streaming.jobs import streaming_dedup

    return streaming_dedup(spark, sf_dir)
