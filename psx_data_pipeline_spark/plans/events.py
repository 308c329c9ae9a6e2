"""Event-stream queries: sessionization, gap detection, per-key
incremental cutoffs — the batch twins of the reference's planned
daily-append layer (reference README.md:62-71) generalized to the
``events`` fixture stream.

All window-function based: one shuffle on the partition key, no
driver-side state. The oracle SQL uses the identical window spec, so
ordering (and therefore every session id) matches by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from psx_data_pipeline_spark.functions.numeric import MILLI_SQL, milli
from psx_data_pipeline_spark.operators.sessions import asof_join, detect_gaps, sessionize
from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_events, load_table

# 30-minute session gap, in microseconds. Event time always enters as
# the ts_us epoch-µs column from the type-adaptive loader seam
# (sources/fixtures.ts_us_expr) — never from raw ts arithmetic.
_GAP_US = 30 * 60 * 1_000_000

SESSIONIZE_ORACLE = f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events
  WHERE ts IS NOT NULL
),
lagged AS (
  SELECT *, lag(ts_us) OVER (
    PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us
  FROM ev
)
SELECT event_id, user_id, event_type, ts_us,
  CAST(SUM(CASE WHEN prev_us IS NULL OR ts_us - prev_us > {_GAP_US}
       THEN 1 ELSE 0 END) OVER (
    PARTITION BY user_id ORDER BY ts_us, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
FROM lagged
"""


@query("sessionize_events", SESSIONIZE_ORACLE)
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (batch twin of streaming
    session_window): lag → new-session flag → running sum, one shuffle
    on user_id."""
    # an event without a timestamp cannot be sessioned — and the
    # engines would disagree on where to sort it anyway (Spark
    # NULLS FIRST, DuckDB NULLS LAST; hostile-probe finding)
    ev = load_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "ts_us"
    ).where(F.col("ts_us").isNotNull())
    out = sessionize(ev, "user_id", "ts_us", _GAP_US, tiebreak="event_id")
    return out.select(
        "event_id", "user_id", "event_type", "ts_us",
        F.col("session_id").cast("long").alias("session_id"),
    )


# Gap detection over per-customer order dates (the OHLC trading-gap
# check, SURVEY.md §7.3 step 5, exercised on the orders fixture).
_MAX_GAP_DAYS = 60

DETECT_GAPS_ORACLE = f"""
WITH d AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders
),
lagged AS (
  SELECT o_custkey, d,
         lag(d) OVER (PARTITION BY o_custkey ORDER BY d) AS prev_d
  FROM d
)
SELECT o_custkey, prev_d AS gap_start, d AS gap_end,
       CAST(date_diff('day', prev_d, d) - 1 AS BIGINT) AS gap_days
FROM lagged
WHERE prev_d IS NOT NULL AND date_diff('day', prev_d, d) > {_MAX_GAP_DAYS}
"""


@query("detect_gaps", DETECT_GAPS_ORACLE)
def q_detect_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key date-gap detection via lag: holes longer than
    {_MAX_GAP_DAYS} days in each customer's order history."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("order_date")
    )
    return detect_gaps(o, "o_custkey", "order_date", max_gap_days=_MAX_GAP_DAYS)


# --- as-of (point-in-time) join ---------------------------------------------

# Explicit window form rather than DuckDB's native ASOF LEFT JOIN:
# when several purchases share a user's max earlier timestamp, ASOF's
# pick is arbitrary — this form pins the tie to the greatest
# purchase_id, matching the Spark side's right_tiebreak (max_by).
# PARTITION BY rid (a per-physical-row surrogate, the round-11 fix
# recipe), NOT click_id: the engine pairs every physical click row,
# so two clicks wearing one id must stay two output rows (round-12
# exact-payload-twin probe find — partitioning by the "unique" id
# silently merged them on the oracle side only).
ASOF_ORACLE = """
WITH c AS (
  SELECT event_id AS click_id, user_id, epoch_us(ts) AS click_ts_us,
         row_number() OVER () AS rid
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'purchase'
),
ranked AS (
  SELECT c.rid, c.click_id, c.user_id, c.click_ts_us, p.purchase_id,
         row_number() OVER (
           PARTITION BY c.rid
           ORDER BY p.ts_us DESC NULLS LAST, p.purchase_id DESC NULLS LAST
         ) AS rn
  FROM c LEFT JOIN p
    ON c.user_id = p.user_id AND p.ts_us < c.click_ts_us
)
SELECT click_id, user_id, click_ts_us, purchase_id
FROM ranked WHERE rn = 1
"""


@query("asof_join_clicks", ASOF_ORACLE)
def q_asof_join_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click paired with the same user's latest
    strictly-earlier purchase (point-in-time correctness — the
    backbone of feature stores and trade/quote matching).

    Spark lacks ASOF JOIN; operators/sessions.asof_join implements it
    as union + carry-forward window (one shuffle, no range-join
    explosion). The oracle is DuckDB's native ASOF LEFT JOIN."""
    ev = load_events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id",
        F.col("ts_us").alias("click_ts_us"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts_us",
    )
    out = asof_join(
        clicks, purchases, key="user_id",
        left_ts="click_ts_us", right_ts="ts_us",
        right_cols=["purchase_id"], strict=True,
        right_tiebreak="purchase_id",
    )
    return out.select(
        "click_id", "user_id", "click_ts_us",
        F.col("right_purchase_id").alias("purchase_id"),
    )


# --- binned range join (point-in-interval, no equi-key) ----------------------

_HOUR_US = 3600 * 1_000_000

RANGE_JOIN_ORACLE = f"""
WITH p AS (
  SELECT event_id AS purchase_id, epoch_us(ts) AS purchase_ts_us
  FROM events WHERE event_type = 'purchase' AND value > 0.95
),
c AS (
  SELECT event_id AS click_id, epoch_us(ts) AS click_ts_us
  FROM events WHERE event_type = 'click'
)
SELECT purchase_id, click_id, purchase_ts_us, click_ts_us
FROM p JOIN c
  ON c.click_ts_us >= p.purchase_ts_us
 AND c.click_ts_us <  p.purchase_ts_us + {_HOUR_US}
"""


@query("range_join_binned", RANGE_JOIN_ORACLE)
def q_range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join — every click (any user) within the hour after
    a high-value purchase — as a BINNED equi-join. There is no equi
    key here, and Spark has no native range-join optimization: the
    naive form is a broadcast nested-loop scan of |purchases|×|clicks|
    comparisons, which test_plan_guards forbids as a scale killer.

    The standard fix: quantize time into interval-sized bins. Each
    interval [t, t+1h) overlaps at most two hour bins, so the
    interval side explodes ≤2×, joins clicks on the bin as a plain
    hash join, and the exact range predicate filters the candidates.
    A (purchase, click) pair meets in exactly one bin — the click's
    own — so no dedup pass is needed. Shuffle volume is bounded by
    events-per-bin, not |p|×|c|; skewed bins fall to AQE. The asof
    join (operators/sessions.py) covers the keyed flavor; this is
    the keyless one (trade/quote matching across the whole book,
    ad attribution across users)."""
    ev = load_events(spark, sf_dir)
    purchases = ev.where(
        (F.col("event_type") == "purchase") & (F.col("value") > 0.95)
    ).select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts_us").alias("purchase_ts_us"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("ts_us").alias("click_ts_us"),
    )
    p = purchases.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.expr(f"purchase_ts_us div {_HOUR_US}"),
                F.expr(f"(purchase_ts_us + {_HOUR_US} - 1) div {_HOUR_US}"),
            )
        ),
    )
    c = clicks.withColumn("bin", F.expr(f"click_ts_us div {_HOUR_US}"))
    return (
        p.join(c, "bin")
        .where(
            (F.col("click_ts_us") >= F.col("purchase_ts_us"))
            & (F.col("click_ts_us") < F.col("purchase_ts_us") + _HOUR_US)
        )
        .select("purchase_id", "click_id", "purchase_ts_us", "click_ts_us")
    )


# --- salted two-phase aggregation (skew pattern) -----------------------------

SALTED_COUNTS_ORACLE = f"""
SELECT event_type, COUNT(*) AS n,
       CAST(SUM({MILLI_SQL.format('value')}) AS BIGINT) AS value_k
FROM events GROUP BY event_type
"""


@query("skew_salted_counts", SALTED_COUNTS_ORACLE)
def q_skew_salted_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key aggregation via explicit salting: phase 1 groups on
    (key, salt) — spreading each hot key over 32 reducers — phase 2
    merges the partials per key. The result is salt-independent (the
    oracle is the plain GROUP BY); counts and quantized sums re-merge
    exactly. This is the manual fallback when AQE skew handling
    can't apply (e.g. pre-AQE clusters or custom partitioners)."""
    ev = load_table(spark, "events", sf_dir)
    partial = (
        ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(32)))
        .groupBy("event_type", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(milli("value")).alias("pvk"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.sum("pvk").alias("value_k"),
    )


# --- pivot (event-type counts as columns) ------------------------------------

_ETYPES = ["click", "error", "purchase", "signup", "view"]

PIVOT_ORACLE = """
SELECT user_id,
  COUNT(*) FILTER (event_type = 'click') AS click,
  COUNT(*) FILTER (event_type = 'error') AS error,
  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
  COUNT(*) FILTER (event_type = 'signup') AS signup,
  COUNT(*) FILTER (event_type = 'view') AS view
FROM events GROUP BY user_id
"""


@query("event_type_pivot", PIVOT_ORACLE)
def q_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-user event profile via pivot with an EXPLICIT value
    list — without it Spark runs a distinct-values job first and the
    output schema becomes data-dependent (both forbidden at scale and
    for a stable driver contract)."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", _ETYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _ETYPES)
    )


# --- funnel: ordered conversion within a session -----------------------------

FUNNEL_ORACLE = f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
firsts AS (
  SELECT user_id,
         MIN(ts_us) FILTER (event_type = 'view') AS t_view,
         MIN(ts_us) FILTER (event_type = 'click') AS t_click,
         MIN(ts_us) FILTER (event_type = 'purchase') AS t_purchase
  FROM ev GROUP BY user_id
)
SELECT user_id,
       (t_view IS NOT NULL) AS saw,
       (t_view IS NOT NULL AND t_click > t_view) AS clicked_after,
       (t_view IS NOT NULL AND t_click > t_view
        AND t_purchase > t_click) AS purchased_after
FROM firsts
"""


@query("event_funnel", FUNNEL_ORACLE)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase funnel per user on first-occurrence
    times: one aggregation with filtered MINs (map-side combinable),
    stage flags from time ordering — no self-joins, no windows."""
    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts_us")
    first_of = lambda t: F.min(  # noqa: E731
        F.when(F.col("event_type") == t, F.col("ts_us"))
    )
    firsts = ev.groupBy("user_id").agg(
        first_of("view").alias("t_view"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    saw = F.col("t_view").isNotNull()
    clicked = saw & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return firsts.select(
        "user_id",
        saw.alias("saw"),
        clicked.alias("clicked_after"),
        purchased.alias("purchased_after"),
    )


# --- cohort retention --------------------------------------------------------

_US_PER_DAY = 86_400 * 1_000_000

USER_RETENTION_ORACLE = """
WITH ev AS (
  SELECT user_id,
         epoch_us(ts) // 86400000000 // 7 AS week
  FROM events
),
cohorted AS (
  SELECT user_id, week,
         min(week) OVER (PARTITION BY user_id) AS cohort_week
  FROM ev
)
SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
       CAST(week - cohort_week AS BIGINT) AS week_offset,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM cohorted
GROUP BY cohort_week, week_offset
"""


@query("user_retention", USER_RETENTION_ORACLE)
def q_user_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-activity week,
    counted per (cohort_week, week_offset) cell — the classic
    retention triangle. Week indices are pure integer division on the
    seam's epoch-µs event time (bit-identical across engines). Two
    shuffles: the per-user min-week window and the final cell
    aggregate (map-side-combinable distinct). At 100 TB the per-user
    window partitions by user_id — high cardinality, no skew
    concern."""
    ev = load_events(spark, sf_dir).select(
        "user_id", F.expr(f"ts_us div {_US_PER_DAY} div 7").alias("week")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    cohorted = ev.withColumn("cohort_week", F.min("week").over(w))
    return (
        cohorted.groupBy(
            F.col("cohort_week").cast("long").alias("cohort_week"),
            (F.col("week") - F.col("cohort_week")).cast("long").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


# --- JSON property extraction ------------------------------------------------

# jk mirrors Spark's TYPED from_json('k BIGINT') exactly: only a JSON
# integer extracts (json_type BIGINT/UBIGINT); quoted numbers
# ('{"k":"12"}'), doubles (7.0/7.5), booleans, JSON null, missing
# keys, non-objects, and malformed/empty props are all NULL — a bare
# TRY_CAST of ->> would coerce '"12"' to 12 where Spark's strict
# typed parse yields NULL (verified on both engines; review finding).
# The inner cast must still be TRY_CAST: DuckDB tags EVERY
# non-negative JSON integer UBIGINT, so a value > 2^63-1 passes the
# type gate and a plain CAST raises where Spark's from_json returns
# NULL (review finding, round 5)
EVENT_PROPS_JSON_ORACLE = """
WITH ev AS (
  SELECT event_type,
         CASE WHEN json_valid(props)
                   AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
              THEN TRY_CAST(props->>'k' AS BIGINT) END AS jk
  FROM events
)
SELECT event_type,
       count(*) AS n,
       CAST(sum(jk) AS BIGINT) AS sum_k,
       CAST(count(DISTINCT jk) AS BIGINT) AS n_distinct_k,
       CAST(max(jk) AS BIGINT) AS max_k
FROM ev GROUP BY event_type
"""


@query("event_props_json", EVENT_PROPS_JSON_ORACLE)
def q_event_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured property extraction: the ``props`` JSON column
    is parsed ONCE with a typed ``from_json`` schema (codegen'd
    JsonToStructs — never per-row Python), then aggregated per event
    type. At 100 TB the parse rides the scan and the aggregate is one
    map-side-combinable shuffle on a low-cardinality key; schema-typed
    extraction also lets Catalyst prune unreferenced JSON fields."""
    ev = load_table(spark, "events", sf_dir)
    k = F.from_json("props", "k BIGINT")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.countDistinct("k").alias("n_distinct_k"),
            F.max("k").alias("max_k"),
        )
    )


# --- CUBE (all-subtotal grid) ------------------------------------------------

EVENT_CUBE_ORACLE = f"""
SELECT event_type, user_id % 10 AS user_bucket,
       count(*) AS n,
       CAST(SUM({MILLI_SQL.format('value')}) AS BIGINT) AS value_k,
       CAST(CASE WHEN event_type IS NULL THEN 2 ELSE 0 END
          + CASE WHEN user_id % 10 IS NULL THEN 1 ELSE 0 END AS INT) AS lvl
FROM events
GROUP BY CUBE (event_type, user_id % 10)
"""


@query("event_cube", EVENT_CUBE_ORACLE)
def q_event_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full subtotal grid via CUBE over (event_type, user_bucket) —
    2^2 grouping sets in ONE shuffle (Spark expands the sets
    map-side, the aggregate stays partial-combinable). The level
    indicator derives from NULL group keys (source keys never NULL),
    engine-agnostic like symbol_rollup. Quantized value sums keep the
    doubles exact across engines."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        F.pmod(F.col("user_id"), F.lit(10)).alias("user_bucket"),
        milli("value").alias("vk"),
    )
    lvl = (
        F.when(F.col("event_type").isNull(), 2).otherwise(0)
        + F.when(F.col("user_bucket").isNull(), 1).otherwise(0)
    ).cast("int")
    return (
        ev.cube("event_type", "user_bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("vk").alias("value_k"))
        .select("event_type", "user_bucket", "n", "value_k", lvl.alias("lvl"))
    )


# --- hourly resample + forward fill ------------------------------------------

# Per-user dense hourly grid with the last known (gated-milli) value
# carried forward — the feature-engineering resample that turns an
# irregular event stream into a fixed-step series. The grid span is
# CLAMPED to the trailing _RESAMPLE_SPAN hours of each user's
# activity so one user with events decades apart cannot explode the
# grid (the union-fill below still seeds the first grid hour from
# pre-clamp history). Hour index uses the sign-safe floor residue
# (pre-epoch timestamps truncate wrong under plain integer division
# — the stream-window hostile finding, same class).
_RESAMPLE_SPAN = 10_000

_HB_SQL = (
    f"(ts_us - ((ts_us % {_HOUR_US}) + {_HOUR_US}) % {_HOUR_US})"
    f" / {_HOUR_US}"
)

RESAMPLE_FFILL_ORACLE = f"""
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         {{milli}} AS vm
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_id IS NOT NULL
),
hb AS (
  SELECT user_id, event_id, ts_us,
         CAST({_HB_SQL} AS BIGINT) AS hb, vm
  FROM base
),
hour_n AS (
  SELECT user_id, hb, count(*) AS n FROM hb GROUP BY 1, 2
),
hour_vm AS (
  SELECT user_id, hb, vm FROM (
    SELECT user_id, hb, vm,
           row_number() OVER (PARTITION BY user_id, hb
             ORDER BY ts_us DESC, event_id DESC, vm DESC) AS rn
    FROM hb WHERE vm IS NOT NULL
  ) WHERE rn = 1
),
bounds AS (
  SELECT user_id, max(hb) AS hi,
         greatest(min(hb), max(hb) - {_RESAMPLE_SPAN - 1}) AS lo
  FROM hour_n GROUP BY user_id
),
grid AS (
  SELECT b.user_id, g.hb
  FROM bounds b, unnest(generate_series(b.lo, b.hi)) AS g(hb)
),
unioned AS (
  SELECT user_id, hb, vm, 0 AS ord FROM hour_vm
  UNION ALL
  SELECT user_id, hb, NULL AS vm, 1 AS ord FROM grid
),
filled AS (
  SELECT user_id, hb, ord,
         last_value(vm IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY hb, ord
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv
  FROM unioned
)
SELECT f.user_id, CAST(f.hb * {_HOUR_US} AS BIGINT) AS hour_start_us,
       CAST(coalesce(n.n, 0) AS BIGINT) AS n_events,
       CAST(f.fv AS BIGINT) AS filled_milli
FROM filled f
LEFT JOIN hour_n n ON n.user_id = f.user_id AND n.hb = f.hb
WHERE f.ord = 1
""".format(milli=MILLI_SQL.format("value"))


@query("resample_ffill", RESAMPLE_FFILL_ORACLE)
def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with forward fill: per user, a dense hour grid
    over the trailing {_RESAMPLE_SPAN}h of activity, each grid hour
    carrying the per-hour event count and the last known gated-milli
    value at or before that hour (SQL last_value IGNORE NULLS over a
    union of value rows and grid rows — value rows sort first within
    an hour, so a grid hour sees its own hour's last value, and
    pre-clamp history still seeds the first grid hour).

    Scale shape: events collapse to (user, hour) rows map-side before
    any window; the grid is a bounded sequence explode (≤
    {_RESAMPLE_SPAN} rows/user by the clamp); the fill window runs
    over (user)-partitioned bounded rows — no corpus-sized sort, no
    cross join. The in-hour representative is picked by a TOTAL order
    (ts desc, event_id desc, vm desc), so duplicated (ts, id) rows
    cannot make the result partitioning-dependent; values pass the
    MILLI_SQL total gate (non-finite safe)."""
    ev = (
        load_events(spark, sf_dir)
        .filter(
            F.col("ts_us").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("event_id").isNotNull()
        )
        .select(
            "user_id", "event_id", "ts_us",
            milli("value").alias("vm"),
            F.expr(f"CAST({_HB_SQL} AS BIGINT)").alias("hb"),
        )
    )
    hour_n = ev.groupBy("user_id", "hb").agg(F.count(F.lit(1)).alias("n"))
    # the in-hour pick is a lexicographic struct MAX — the same total
    # order as the oracle's row_number (ts desc, id desc, vm desc over
    # all-non-null fields), but partial-aggregable map-side, so event
    # rows genuinely collapse to (user, hour) before any exchange
    hour_vm = (
        ev.filter(F.col("vm").isNotNull())
        .groupBy("user_id", "hb")
        .agg(
            F.max(F.struct("ts_us", "event_id", "vm"))
            .getField("vm")
            .alias("vm")
        )
    )
    bounds = hour_n.groupBy("user_id").agg(
        F.max("hb").alias("hi"),
        F.greatest(
            F.min("hb"), F.max("hb") - (_RESAMPLE_SPAN - 1)
        ).alias("lo"),
    )
    grid = bounds.select(
        "user_id", F.explode(F.sequence("lo", "hi")).alias("hb")
    )
    unioned = hour_vm.select(
        "user_id", "hb", "vm", F.lit(0).alias("ord")
    ).unionByName(
        grid.select(
            "user_id", "hb",
            F.lit(None).cast("long").alias("vm"), F.lit(1).alias("ord"),
        )
    )
    w_fill = (
        Window.partitionBy("user_id")
        .orderBy("hb", "ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("fv", F.last("vm", ignorenulls=True).over(w_fill))
        .filter(F.col("ord") == 1)
        .join(hour_n, ["user_id", "hb"], "left")
        .select(
            "user_id",
            (F.col("hb") * _HOUR_US).cast("long").alias("hour_start_us"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
            F.col("fv").cast("long").alias("filled_milli"),
        )
    )


# --- event-type transition matrix ---------------------------------------------

# First-order Markov transitions over each user's time-ordered event
# chain: the per-user lead() pairs adjacent events, the (from, to)
# tally is vocabulary-bounded, and the row-conditional probability is
# kept exact in milli-units. This is the behavioral "what happens
# next" report next-event prediction and funnel design read.
EVENT_TRANSITIONS_ORACLE = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
        AND event_type IS NOT NULL AND event_id IS NOT NULL
),
chain AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts_us, event_id) AS to_type
  FROM ev
),
tally AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM chain WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       CAST(n * 1000 // sum(n) OVER (PARTITION BY from_type) AS BIGINT)
         AS prob_milli
FROM tally
"""


@query("event_transitions", EVENT_TRANSITIONS_ORACLE)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(from, to) transition counts and exact milli-probabilities over
    per-user time-ordered event chains; the (ts_us, event_id) ordering
    is total within a user, so chains — and therefore every count —
    are cross-engine identical even on same-microsecond ties. Rows
    missing time, user, type, or id carry no chain position.

    Shape: one shuffle on user_id for the lead() window (per-user
    state = that user's events), then a vocabulary-bounded tally whose
    conditional-probability window runs over |types|^2 rows at most."""
    ev = load_events(spark, sf_dir).where(
        F.col("ts_us").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("event_id").isNotNull()
    )
    w_chain = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    chain = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w_chain).alias("to_type"),
    )
    tally = (
        chain.where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return tally.select(
        "from_type", "to_type", "n",
        F.expr("CAST(n * 1000 div sum(n) OVER "
               "(PARTITION BY from_type) AS BIGINT)").alias("prob_milli"),
    )
