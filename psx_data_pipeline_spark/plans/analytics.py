"""OHLC / window analytics — the reference's planned Phases 3-4
(reference README.md:62-71, SURVEY.md §7.3 step 5) built on the
fixture star schema: a daily per-symbol price series is derived from
``orders`` (symbol = o_custkey mod N, price = o_totalprice), then the
full window pack runs on top — OHLC roll-up, lag returns, frame-based
moving averages, per-key top-k, rollup subtotals, incremental-append
cutoffs — plus the multi-join top-k queries that exercise the
relational surface the reference never had (joins, sort, limit).

Scale notes: every window partitions by symbol (the natural
distribution key); the OHLC roll-up is one shuffle with map-side
combine; top-k over a full sort lowers to TakeOrderedAndProject (no
global sort materialization); dimension joins broadcast the small
side automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from psx_data_pipeline_spark.functions.numeric import dsum, dsum_sql
from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_table

_NSYM = 25

# Shared derivation: deterministic daily per-symbol series.
# a trade without a date belongs to no daily bar — and the engines
# would disagree on where a NULL date sorts in the windowed views
# anyway (Spark NULLS FIRST, DuckDB NULLS LAST; hostile-probe
# finding). The price gate is BETWEEN ±1e24: it excludes NULL, NaN
# and ±Inf identically in both engines (NaN/Inf crash DuckDB's
# decimal turnover cast and skew percentile hashes — round-6
# relational-probe finding). A trade without a PRICE is equally
# malformed: it would
# make open/close diverge (DuckDB's arg_min skips NULL values,
# Spark's min_by returns them — generative-fuzz finding). price
# + 0.0 canonicalizes the sign of zero: -0.0 and 0.0 are IEEE-equal,
# so min/max/percentile may surface either sign depending on engine
# tie behavior — visible to the value hash (fuzz finding); adding
# +0.0 is a bit-exact no-op for every other value.
_SERIES_SQL = f"""
  SELECT o_orderkey AS trade_id, o_custkey % {_NSYM} AS symbol_id,
         CAST(o_orderdate AS DATE) AS trade_date,
         o_totalprice + 0.0 AS price
  FROM orders
  WHERE o_orderdate IS NOT NULL
    AND o_totalprice BETWEEN -1e24 AND 1e24
"""

# open/close order by the TOTAL key (trade_id, price), not trade_id
# alone: the id is a fact PK that hostile data can violate, and on a
# duplicate-id twin carrying two prices arg_min/min_by tie on the key
# and pick engine-arbitrarily — the round-11 hostile-orders probe
# caught Spark and DuckDB disagreeing on exactly that bar (and the
# divergent close then poisoned every downstream return/MA/EWMA
# frame). A struct MIN/MAX over (id, price) is total for every input
# (full-duplicate rows agree in both fields), stays a map-side
# combine, and orders identically in both engines; the id is
# coalesced to long-min so a NULL id sorts first on both sides too.
_TID = "coalesce(trade_id, -9223372036854775807 - 1)"

OHLC_SQL = f"""
  SELECT symbol_id, trade_date,
         (min(struct_pack(i := {_TID}, p := price))).p AS open,
         max(price) AS high,
         min(price) AS low,
         (max(struct_pack(i := {_TID}, p := price))).p AS close,
         count(*) AS volume,
         {dsum_sql('price')} AS turnover
  FROM ({_SERIES_SQL})
  GROUP BY symbol_id, trade_date
"""


def _series(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return o.where(
        F.col("o_orderdate").isNotNull()
        # BETWEEN excludes NULL, NaN and ±Inf identically in both
        # engines (a trade without a FINITE price is malformed —
        # NaN/Inf crash the decimal turnover cast and percentile
        # hashes; round-6 relational-probe finding)
        & F.col("o_totalprice").between(-1e24, 1e24)
    ).select(
        F.col("o_orderkey").alias("trade_id"),
        (F.col("o_custkey") % _NSYM).alias("symbol_id"),
        F.col("o_orderdate").cast("date").alias("trade_date"),
        (F.col("o_totalprice") + F.lit(0.0)).alias("price"),
    )


def _ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars: one shuffle on (symbol, day); open/close are
    struct-MIN/MAX over the TOTAL key (trade_id, price) — still a
    map-side combine, no sort, and deterministic even when hostile
    data duplicates the trade id (see OHLC_SQL)."""
    long_min = F.lit(-9223372036854775807 - 1).cast("long")
    tid = F.coalesce(F.col("trade_id"), long_min).alias("i")
    key = F.struct(tid, F.col("price").alias("p"))
    return (
        _series(spark, sf_dir)
        .groupBy("symbol_id", "trade_date")
        .agg(
            F.min(key).getField("p").alias("open"),
            F.max("price").alias("high"),
            F.min("price").alias("low"),
            F.max(key).getField("p").alias("close"),
            F.count(F.lit(1)).alias("volume"),
            dsum("price").alias("turnover"),
        )
    )


@query("ohlc_daily", OHLC_SQL)
def q_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ohlc(spark, sf_dir)


DAILY_RETURNS_ORACLE = f"""
WITH ohlc AS ({OHLC_SQL})
SELECT symbol_id, trade_date, close,
       CASE WHEN lag(close) OVER w = 0 THEN NULL
            ELSE close / lag(close) OVER w - 1 END AS ret
FROM ohlc
WINDOW w AS (PARTITION BY symbol_id ORDER BY trade_date)
"""


@query("daily_returns", DAILY_RETURNS_ORACLE)
def q_daily_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol daily returns via lag — the canonical OHLC analytic
    (reference README.md:62-71). Division of identical doubles is
    bit-deterministic; the first bar of each symbol yields NULL."""
    w = Window.partitionBy("symbol_id").orderBy("trade_date")
    prev = F.lag("close").over(w)
    # a zero previous close has no defined return — and under ANSI
    # the bare division crashes the job (generative-fuzz finding)
    return _ohlc(spark, sf_dir).select(
        "symbol_id", "trade_date", "close",
        F.when(prev == 0, F.lit(None).cast("double"))
        .otherwise(F.col("close") / prev - 1)
        .alias("ret"),
    )


MOVING_AVG_ORACLE = f"""
WITH ohlc AS ({OHLC_SQL})
SELECT symbol_id, trade_date, close,
       CAST(SUM(CAST(close AS DECIMAL(38,6))) OVER w AS DOUBLE)
         / COUNT(*) OVER w AS ma7
FROM ohlc
WINDOW w AS (PARTITION BY symbol_id ORDER BY trade_date
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


@query("moving_avg", MOVING_AVG_ORACLE)
def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-bar moving average over a rowsBetween frame. The frame sum
    goes through exact decimal so sliding-window accumulation order
    can't flip low bits across engines."""
    w = (
        Window.partitionBy("symbol_id")
        .orderBy("trade_date")
        .rowsBetween(-6, Window.currentRow)
    )
    return _ohlc(spark, sf_dir).select(
        "symbol_id", "trade_date", "close",
        (
            F.sum(F.col("close").cast("decimal(38,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("ma7"),
    )


TOPK_VOLUME_ORACLE = f"""
WITH ohlc AS ({OHLC_SQL})
SELECT symbol_id, trade_date, volume, CAST(rk AS INT) AS rk FROM (
  SELECT symbol_id, trade_date, volume, row_number() OVER (
    PARTITION BY symbol_id ORDER BY volume DESC, trade_date) AS rk
  FROM ohlc
) WHERE rk <= 3
"""


@query("topk_by_volume", TOPK_VOLUME_ORACLE)
def q_topk_by_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key top-k (busiest 3 days per symbol): row_number + filter
    — the distributed top-k that needs no global sort."""
    w = Window.partitionBy("symbol_id").orderBy(
        F.desc("volume"), F.asc("trade_date")
    )
    return (
        _ohlc(spark, sf_dir)
        .select("symbol_id", "trade_date", "volume")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
    )


ROLLUP_ORACLE = f"""
WITH s AS ({_SERIES_SQL})
SELECT symbol_id % 5 AS bucket, symbol_id,
       {dsum_sql('price')} AS turnover, count(*) AS n,
       CAST(CASE WHEN symbol_id % 5 IS NULL THEN 2 ELSE 0 END
          + CASE WHEN symbol_id IS NULL THEN 1 ELSE 0 END AS INT) AS lvl
FROM s
GROUP BY ROLLUP (symbol_id % 5, symbol_id)
"""


@query("symbol_rollup", ROLLUP_ORACLE)
def q_symbol_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP (bucket → symbol → grand
    total). The level indicator derives from NULL group keys (the
    source keys are never NULL), which is engine-agnostic — Spark's
    grouping_id() bit order needn't match DuckDB's."""
    s = _series(spark, sf_dir).withColumn("bucket", F.col("symbol_id") % 5)
    lvl = (
        F.when(F.col("bucket").isNull(), 2).otherwise(0)
        + F.when(F.col("symbol_id").isNull(), 1).otherwise(0)
    ).cast("int")
    return (
        s.rollup("bucket", "symbol_id")
        .agg(dsum("price").alias("turnover"), F.count(F.lit(1)).alias("n"))
        .select("bucket", "symbol_id", "turnover", "n", lvl.alias("lvl"))
    )


APPEND_CUTOFF_ORACLE = f"""
WITH s AS ({_SERIES_SQL})
SELECT symbol_id, max(trade_date) AS last_date,
       CASE WHEN max(trade_date) < DATE '9999-12-31'
            THEN CAST(max(trade_date) + INTERVAL 1 DAY AS DATE) END
         AS next_date,
       count(DISTINCT trade_date) AS n_days
FROM s GROUP BY symbol_id
"""


@query("append_cutoff", APPEND_CUTOFF_ORACLE)
def q_append_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental daily-append cutoff (reference README.md:66-71):
    per-symbol last ingested date + the next date to fetch — a
    metadata-scale aggregate, partition-pruned on a date-partitioned
    table at scale. next_date is gated at the date-domain maximum:
    a symbol whose last bar is 9999-12-31 has NO next fetch date
    (NULL), because +1 day overflows the date domain — Spark's
    date_add wraps to year 10000 and the Arrow/Python conversion
    raises, i.e. a single legal-but-extreme row crashed the query
    (round-9 hostile-relational finding)."""
    last = F.max("trade_date")
    return (
        _series(spark, sf_dir)
        .groupBy("symbol_id")
        .agg(
            last.alias("last_date"),
            F.when(
                last < F.lit("9999-12-31").cast("date"), F.date_add(last, 1)
            ).alias("next_date"),
            F.countDistinct("trade_date").alias("n_days"),
        )
    )


# --- multi-join relational queries (coverage the reference lacked) ----------

TOP_ORDERS_ORACLE = f"""
SELECT l.l_orderkey, CAST(o.o_orderdate AS DATE) AS order_date,
       o.o_orderpriority,
       {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("top_building_orders", TOP_ORDERS_ORACLE)
def q_top_building_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: selective dimension filter → fact joins →
    group → global top-10. orderBy+limit lowers to
    TakeOrderedAndProject (per-partition heaps, no full sort)."""
    c = load_table(spark, "customer", sf_dir).where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # no broadcast hint: customer scales with SF (SF·150k rows),
        # so the strategy is AQE's call — broadcast at small SF,
        # shuffle hash at 100 TB instead of a forced-broadcast OOM
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


REGIONAL_REVENUE_ORACLE = f"""
SELECT r.r_name AS region, n.n_name AS nation,
       {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       count(*) AS n_lines
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
"""


@query("regional_revenue", REGIONAL_REVENUE_ORACLE)
def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped star join: the supplier→nation→region
    dimension chain is broadcast (small side), so the fact table
    never shuffles for the join — only the final low-cardinality
    aggregation shuffles."""
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    dim = F.broadcast(
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", F.col("r_name").alias("region"),
                F.col("n_name").alias("nation"))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(dim, li.l_suppkey == dim.s_suppkey)
        .groupBy("region", "nation")
        .agg(dsum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


# --- calendar-range window (RANGE frame over days) ---------------------------

ROLLING_RANGE_ORACLE = f"""
WITH d AS (
  SELECT symbol_id, trade_date,
         date_diff('day', DATE '1970-01-01', trade_date) AS dnum,
         COUNT(*) AS n_trades
  FROM ({_SERIES_SQL}) GROUP BY 1, 2, 3
)
SELECT symbol_id, trade_date,
       CAST(SUM(n_trades) OVER (
         PARTITION BY symbol_id ORDER BY dnum
         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS trades_7d
FROM d
"""


@query("rolling_range_7d", ROLLING_RANGE_ORACLE)
def q_rolling_range_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-correct 7-day rolling trade count: a RANGE frame over
    the day number, so gaps in the trading calendar shorten the
    window (unlike a ROWS frame, which silently spans them). One
    shuffle on symbol_id; the frame is value-based so AQE re-splits
    freely."""
    d = (
        _series(spark, sf_dir)
        .groupBy("symbol_id", "trade_date")
        .agg(F.count(F.lit(1)).alias("n_trades"))
        .withColumn("dnum", F.datediff("trade_date", F.lit("1970-01-01")))
    )
    w = (
        Window.partitionBy("symbol_id")
        .orderBy("dnum")
        .rangeBetween(-6, Window.currentRow)
    )
    return d.select(
        "symbol_id", "trade_date",
        F.sum("n_trades").over(w).cast("long").alias("trades_7d"),
    )


# --- exact percentiles -------------------------------------------------------

PERCENTILES_ORACLE = f"""
WITH s AS ({_SERIES_SQL})
SELECT symbol_id,
       quantile_cont(price, 0.25) AS p25,
       quantile_cont(price, 0.5) AS p50,
       quantile_cont(price, 0.95) AS p95,
       count(*) AS n
FROM s GROUP BY symbol_id
"""


@query("price_percentiles", PERCENTILES_ORACLE)
def q_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-symbol price percentiles (linear interpolation —
    Spark `percentile` and DuckDB `quantile_cont` agree bit-for-bit:
    sort-based, no summation-order sensitivity). One shuffle; at
    corpus scale swap in approx_percentile for the sketch path (not
    oracle-hashable, deliberately not registered)."""
    s = _series(spark, sf_dir)
    return s.groupBy("symbol_id").agg(
        F.expr("percentile(price, 0.25)").alias("p25"),
        F.expr("percentile(price, 0.5)").alias("p50"),
        F.expr("percentile(price, 0.95)").alias("p95"),
        F.count(F.lit(1)).alias("n"),
    )


# --- calendar-gap check: missing trading days per symbol ---------------------

MISSING_DAYS_ORACLE = f"""
WITH obs AS (
  SELECT DISTINCT symbol_id, trade_date AS d FROM ({_SERIES_SQL})
),
b AS (
  SELECT symbol_id, min(d) AS lo, max(d) AS hi FROM obs GROUP BY symbol_id
),
cal AS (
  SELECT symbol_id,
         CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
  FROM b
)
SELECT c.symbol_id, c.d AS missing_date
FROM cal c LEFT JOIN obs o ON c.symbol_id = o.symbol_id AND c.d = o.d
WHERE o.symbol_id IS NULL
"""


@query("ohlc_missing_days", MISSING_DAYS_ORACLE)
def q_ohlc_missing_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's planned per-symbol 'missing trading days' check
    (reference README.md:66-71): generate each symbol's calendar from
    its own first to last observed date (F11's sequence dimension,
    data-derived bounds, no driver loop) and anti-join the observed
    dates away. Two shuffles on symbol_id — bounds aggregation and
    the anti-join — both map-side combinable / AQE-broadcastable; the
    calendar explode is a projection, never materialized wide."""
    obs = (
        _series(spark, sf_dir)
        .select("symbol_id", F.col("trade_date").alias("d"))
        .distinct()
    )
    bounds = obs.groupBy("symbol_id").agg(
        F.min("d").alias("lo"), F.max("d").alias("hi")
    )
    cal = bounds.select(
        "symbol_id", F.explode(F.sequence("lo", "hi")).alias("d")
    )
    return cal.join(obs, ["symbol_id", "d"], "left_anti").select(
        "symbol_id", F.col("d").alias("missing_date")
    )


# --- brand revenue share (part-dimension join) -------------------------------

BRAND_SHARE_ORACLE = f"""
WITH per_brand AS (
  SELECT p.p_brand AS brand,
         {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
         count(*) AS n_lines
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand
)
SELECT brand, revenue, n_lines,
       revenue / (SELECT CAST(SUM(CAST(revenue AS DECIMAL(38,6))) AS DOUBLE)
                  FROM per_brand) AS share
FROM per_brand
"""


@query("brand_revenue_share", BRAND_SHARE_ORACLE)
def q_brand_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped part-dimension join: per-brand discounted
    revenue and its share of the total. The part side joins on the
    partkey — at fixture scale Catalyst broadcasts it, at 100 TB it
    is a shuffle (or bucketed, zero-exchange) equi-join; the brand
    rollup is map-side-combinable. Both the per-brand revenue and the
    share's denominator go through exact decimal sums, so the doubles
    are bit-identical at any partitioning."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_brand = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(dsum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )
    total = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    denom = F.sum(F.col("revenue").cast("decimal(38,6)")).over(total).cast(
        "double"
    )
    return per_brand.select(
        "brand", "revenue", "n_lines", (F.col("revenue") / denom).alias("share")
    )
