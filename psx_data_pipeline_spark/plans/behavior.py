"""Conversion-lag analysis: how long after signup users first
purchase — the activation metric every funnel review reads next to
event_funnel's step counts and user_retention's cohort grid.

Percentiles run over SECOND-bucketed lags, so the quantile window's
input is bounded by the observation window's time resolution
(histogram_quantiles' argument), never by the user count — at 100 TB
the per-user reduction is the only corpus-scale shuffle and the
distribution table stays tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_events


def _clq(q: int, div: str) -> str:
    return f"min(CASE WHEN cum >= ({q} * n + 99) {div} 100 THEN lag_s END)"


CONVERSION_LAG_ORACLE = f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_type IS NOT NULL
),
su AS (
  SELECT user_id, min(CASE WHEN event_type = 'signup' THEN ts_us END)
           AS signup_us
  FROM ev GROUP BY user_id
),
conv AS (
  SELECT e.user_id,
         CAST((min(e.ts_us) - s.signup_us) // 1000000 AS BIGINT) AS lag_s
  FROM ev e JOIN su s ON s.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND s.signup_us IS NOT NULL
        AND e.ts_us >= s.signup_us
  GROUP BY e.user_id, s.signup_us
),
dist AS (
  SELECT lag_s, count(*) AS c FROM conv GROUP BY lag_s
),
cw AS (
  SELECT lag_s, c,
         sum(c) OVER (ORDER BY lag_s
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER () AS n
  FROM dist
),
pct AS (
  SELECT CAST(max(n) AS BIGINT) AS n_converted,
         CAST({_clq(50, '//')} AS BIGINT) AS p50_s,
         CAST({_clq(90, '//')} AS BIGINT) AS p90_s,
         CAST({_clq(99, '//')} AS BIGINT) AS p99_s
  FROM cw
),
base AS (
  SELECT CAST(count(*) AS BIGINT) AS n_signup_users
  FROM su WHERE signup_us IS NOT NULL
)
SELECT b.n_signup_users, p.n_converted,
       CAST(CASE WHEN b.n_signup_users = 0 THEN 0
            ELSE p.n_converted * 1000 // b.n_signup_users END AS BIGINT)
         AS conversion_permille,
       p.p50_s, p.p90_s, p.p99_s
FROM pct p CROSS JOIN base b
"""


@query("conversion_lag", CONVERSION_LAG_ORACLE)
def q_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row activation report: signup cohort size, how many of
    them ever purchased at-or-after their first signup, the
    conversion rate in permille, and p50/p90/p99 of the signup→first-
    purchase lag in whole seconds. A purchase logged the same
    microsecond as the signup counts (lag 0) — the >= contract every
    time-keyed query here uses.

    Shape: one user-key shuffle shared by the signup reduction and
    the purchase join (co-located); the percentile window runs over
    distinct second-bucketed lags; the final join is two single-row
    broadcasts (whitelisted bounded cross join)."""
    ev = load_events(spark, sf_dir).where(
        F.col("ts_us").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    ).select("user_id", "event_type", "ts_us")
    su = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.col("ts_us"))
        ).alias("signup_us")
    )
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .where(
            F.col("signup_us").isNotNull()
            & (F.col("ts_us") >= F.col("signup_us"))
        )
        .groupBy("user_id", "signup_us")
        .agg(
            F.expr("CAST((min(ts_us) - signup_us) div 1000000 AS BIGINT)")
            .alias("lag_s")
        )
    )
    dist = conv.groupBy("lag_s").agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.orderBy("lag_s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    cw = dist.select(
        "lag_s", "c",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    pct = cw.agg(
        F.max("n").cast("long").alias("n_converted"),
        F.expr(f"CAST({_clq(50, 'div')} AS BIGINT)").alias("p50_s"),
        F.expr(f"CAST({_clq(90, 'div')} AS BIGINT)").alias("p90_s"),
        F.expr(f"CAST({_clq(99, 'div')} AS BIGINT)").alias("p99_s"),
    )
    base = su.where(F.col("signup_us").isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n_signup_users")
    )
    return pct.crossJoin(F.broadcast(base)).select(
        "n_signup_users", "n_converted",
        F.expr(
            "CAST(CASE WHEN n_signup_users = 0 THEN 0"
            " ELSE n_converted * 1000 div n_signup_users END AS BIGINT)"
        ).alias("conversion_permille"),
        "p50_s", "p90_s", "p99_s",
    )
