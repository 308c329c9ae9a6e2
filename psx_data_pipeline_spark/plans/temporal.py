"""Temporal-shape operators: keyed run-length compression and the
SCD-2 point-in-time join — the two time-semantics shapes the
registry did not yet carry.

* run_compress: per-key consecutive-duplicate elimination (the CDC
  compaction that keeps only STATE CHANGES of an event stream —
  Debezium's "drop unchanged heartbeats"). A change flag via lag()
  and a run id via a cumulative sum, both in windows partitioned by
  the key — corpus-cardinality never funnels through one task.

* pit_enrich: enrich a fact row with the dimension attributes that
  were valid AT FACT TIME against an SCD-2 versioned dimension.
  Every version carries [valid_from, valid_to); the join is the
  EQUI join on the business key with the validity range as a
  residual predicate — per-key version counts are bounded by change
  cadence, so the range never explodes the equi match (this is the
  point-in-time join every feature-store backfill runs). The
  versioned dimension derives deterministically from the customer
  fixture (the cdc_log precedent).

NULL-ts events are out of scope for run ordering (the governance
convention); ties at the same microsecond break by event_id, and a
duplicated (ts, event_id) pair — at-least-once replay landing the
same event twice, possibly with a corrupted payload — breaks by
event_type. NULLS FIRST is explicit on BOTH tiebreak columns in both
engines (Spark's ASC default is NULLS FIRST, DuckDB's is NULLS
LAST — a NULL event_id tied on ts diverged until pinned). The order
is TOTAL over every column the lag chain reads, so the run census
cannot depend on either engine's sort-internal tie order (the
round-7 stream_cdc_apply lesson; pinned in
tests/test_hostile_temporal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_table, ts_us_expr

RUN_COMPRESS_ORACLE = """
WITH ev AS (
  SELECT user_id, event_id, event_type,
         CAST(epoch_us(ts) AS BIGINT) AS ts_us
  FROM events WHERE ts IS NOT NULL
),
flagged AS (
  SELECT user_id, event_type, ts_us, event_id,
         CASE WHEN event_type IS DISTINCT FROM
                   lag(event_type) OVER w
              THEN 1 ELSE 0 END AS changed
  FROM ev WINDOW w AS (PARTITION BY user_id
                       ORDER BY ts_us, event_id NULLS FIRST,
                                event_type NULLS FIRST)
),
runs AS (
  SELECT user_id,
         sum(changed) OVER (
           PARTITION BY user_id
           ORDER BY ts_us, event_id NULLS FIRST,
                    event_type NULLS FIRST
           ROWS UNBOUNDED PRECEDING) AS run_id
  FROM flagged
),
run_sizes AS (
  SELECT user_id, run_id, CAST(count(*) AS BIGINT) AS run_len
  FROM runs GROUP BY user_id, run_id
)
SELECT user_id,
       CAST(sum(run_len) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_runs,
       CAST(max(run_len) AS BIGINT) AS longest_run
FROM run_sizes GROUP BY user_id
"""


@query("run_compress", RUN_COMPRESS_ORACLE)
def q_run_compress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-duplicate run census per user: total events,
    number of state-change runs, longest run (module docstring).
    Both windows partition by user_id; the run sizes collapse in a
    map-side-combinable groupBy before the per-user rollup."""
    ev = load_table(spark, "events", sf_dir)
    ev = ev.withColumn("ts_us", ts_us_expr(ev)).where(
        F.col("ts_us").isNotNull()
    ).select("user_id", "event_id", "event_type", "ts_us")
    # event_type closes the total order for duplicated (ts, id) pairs;
    # NULLS FIRST explicit on BOTH tiebreak columns: Spark's ASC
    # default is NULLS FIRST but DuckDB's is NULLS LAST, so a NULL
    # event_id tied on ts ordered differently per engine until the
    # oracle pinned it (round-8 review find, pinned in
    # tests/test_hostile_temporal.py)
    w = Window.partitionBy("user_id").orderBy(
        "ts_us",
        F.col("event_id").asc_nulls_first(),
        F.col("event_type").asc_nulls_first(),
    )
    flagged = ev.withColumn(
        "changed",
        F.when(
            ~F.col("event_type").eqNullSafe(
                F.lag("event_type").over(w)
            ),
            1,
        ).otherwise(0),
    )
    runs = flagged.withColumn(
        "run_id",
        F.sum("changed").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    run_sizes = runs.groupBy("user_id", "run_id").agg(
        F.count(F.lit(1)).cast("long").alias("run_len")
    )
    return run_sizes.groupBy("user_id").agg(
        F.sum("run_len").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_runs"),
        F.max("run_len").cast("long").alias("longest_run"),
    )


# SCD-2 dimension derived from the customer fixture: two versions per
# key with a deterministic attribute change at the version boundary
_PIT_SPLIT = "1998-01-01"

_SCD2_SQL = f"""
  SELECT c_custkey AS k, c_mktsegment AS segment,
         DATE '1992-01-01' AS valid_from, DATE '{_PIT_SPLIT}' AS valid_to
  FROM customer WHERE c_custkey IS NOT NULL
  UNION ALL
  -- || not concat(): DuckDB's concat SKIPS NULLs (NULL segment would
  -- become '/v2') while Spark's F.concat propagates them — the
  -- NULL-propagating || matches Spark exactly (the _CDC_SQL
  -- precedent in plans/lakehouse.py)
  SELECT c_custkey, c_mktsegment || '/v2',
         DATE '{_PIT_SPLIT}', DATE '9999-01-01'
  FROM customer WHERE c_custkey IS NOT NULL
"""

PIT_ENRICH_ORACLE = f"""
WITH dim AS ({_SCD2_SQL}),
enriched AS (
  SELECT d.segment, CAST(o.o_orderdate AS DATE) AS od
  FROM orders o
  JOIN dim d ON o.o_custkey = d.k
   AND CAST(o.o_orderdate AS DATE) >= d.valid_from
   AND CAST(o.o_orderdate AS DATE) <  d.valid_to
  WHERE o.o_orderdate IS NOT NULL
)
SELECT segment, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(min(od) AS DATE) AS first_order,
       CAST(max(od) AS DATE) AS last_order
FROM enriched GROUP BY segment
"""


@query("pit_enrich", PIT_ENRICH_ORACLE)
def q_pit_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment: each order joins the customer
    segment VERSION valid at order date (module docstring). The join
    is equi on the business key with the validity range as a
    residual predicate — exactly one version matches per fact row,
    so output cardinality equals the fact side; rolled up per
    (versioned) segment."""
    cust = load_table(spark, "customer", sf_dir).where(
        F.col("c_custkey").isNotNull()
    )
    v1 = cust.select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("1992-01-01").cast("date").alias("valid_from"),
        F.lit(_PIT_SPLIT).cast("date").alias("valid_to"),
    )
    v2 = cust.select(
        F.col("c_custkey").alias("k"),
        F.concat(F.col("c_mktsegment"), F.lit("/v2")).alias("segment"),
        F.lit(_PIT_SPLIT).cast("date").alias("valid_from"),
        F.lit("9999-01-01").cast("date").alias("valid_to"),
    )
    dim = v1.unionByName(v2)
    o = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderdate").isNotNull()
    ).select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("od")
    )
    j = o.join(
        dim,
        (o.o_custkey == dim.k)
        & (F.col("od") >= dim.valid_from)
        & (F.col("od") < dim.valid_to),
    )
    return j.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.min("od").alias("first_order"),
        F.max("od").alias("last_order"),
    )
