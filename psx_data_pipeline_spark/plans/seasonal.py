"""Seasonal traffic baseline and latest-day deviation: the
(day-of-week, hour) profile an on-call dashboard compares today's
event volume against — the operational complement of ks_drift
(distribution drift) and stream_window_counts (raw volume).

Engine-safe calendar arithmetic: day-of-week and hour derive from
epoch-microsecond integer division only (dow 0 = Thursday, the
1970-01-01 anchor; the sign-safe nonnegative residue handles
pre-epoch rows) — never from dayofweek()/strftime(), whose week
conventions differ across engines.

100 TB shape: one (day, dow, hour) aggregate — map-side combinable,
output bounded by the observation window — then a 168-cell profile;
the latest-day join is a broadcast of one scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_events

_DAY_US = 86_400 * 1_000_000
_HOUR_US = 3_600 * 1_000_000

# floor-divide via the sign-safe residue so pre-epoch timestamps
# bucket consistently in both engines (same device as
# stream_window_counts)
_DAY_SQL = (
    f"(epoch_us(ts) - ((epoch_us(ts) % {_DAY_US}) + {_DAY_US})"
    f" % {_DAY_US}) // {_DAY_US}"
)
SEASONAL_BASELINE_ORACLE = f"""
WITH cells AS (
  SELECT {_DAY_SQL} AS day_idx,
         ((({_DAY_SQL}) % 7) + 7) % 7 AS dow,
         ((epoch_us(ts) % {_DAY_US}) + {_DAY_US}) % {_DAY_US}
           // {_HOUR_US} AS hour,
         CAST(count(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1, 2, 3
),
latest AS (SELECT max(day_idx) AS last_day FROM cells),
profile AS (
  SELECT c.dow, c.hour,
         CAST(sum(c.n) AS BIGINT) AS n_events,
         CAST(count(DISTINCT c.day_idx) AS BIGINT) AS days_observed,
         CAST(sum(CASE WHEN c.day_idx = l.last_day THEN c.n ELSE 0 END)
              AS BIGINT) AS last_day_events
  FROM cells c CROSS JOIN latest l
  GROUP BY c.dow, c.hour
)
SELECT dow, hour, n_events, days_observed, last_day_events,
       CAST(n_events * 1000 // days_observed AS BIGINT) AS rate_milli,
       CAST(CASE WHEN n_events = 0 THEN 0
            ELSE last_day_events * days_observed * 1000 // n_events
            END AS BIGINT) AS deviation_permille
FROM profile
"""


@query("seasonal_baseline", SEASONAL_BASELINE_ORACLE)
def q_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (day-of-week, hour): total events, days observed, the
    per-day baseline rate in milli-events, and the LATEST observed
    day's volume as a permille of its cell baseline (1000 = a typical
    day; the number an anomaly pager thresholds). The latest day is
    data-borne (max day index), the json_snapshot_latest convention.

    The hour residue is computed from epoch µs with the sign-safe
    nonnegative modulus, so pre-epoch rows land in stable buckets on
    both engines (documented truncation-convention values)."""
    ev = load_events(spark, sf_dir).where(F.col("ts_us").isNotNull())
    day = F.expr(
        f"(ts_us - ((ts_us % {_DAY_US}) + {_DAY_US}) % {_DAY_US})"
        f" div {_DAY_US}"
    )
    hour = F.expr(
        f"((ts_us % {_DAY_US}) + {_DAY_US}) % {_DAY_US} div {_HOUR_US}"
    )
    cells = ev.select(
        day.alias("day_idx"),
        F.expr(f"(((ts_us - ((ts_us % {_DAY_US}) + {_DAY_US})"
               f" % {_DAY_US}) div {_DAY_US}) % 7 + 7) % 7").alias("dow"),
        hour.alias("hour"),
    ).groupBy("day_idx", "dow", "hour").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    latest = cells.agg(F.max("day_idx").alias("last_day"))
    profile = cells.crossJoin(F.broadcast(latest)).groupBy(
        "dow", "hour"
    ).agg(
        F.sum("n").cast("long").alias("n_events"),
        F.countDistinct("day_idx").cast("long").alias("days_observed"),
        F.sum(
            F.when(F.col("day_idx") == F.col("last_day"), F.col("n"))
            .otherwise(0)
        ).cast("long").alias("last_day_events"),
    )
    return profile.select(
        "dow", "hour", "n_events", "days_observed", "last_day_events",
        F.expr("CAST(n_events * 1000 div days_observed AS BIGINT)")
        .alias("rate_milli"),
        F.expr(
            "CAST(CASE WHEN n_events = 0 THEN 0"
            " ELSE last_day_events * days_observed * 1000 div n_events"
            " END AS BIGINT)"
        ).alias("deviation_permille"),
    )
