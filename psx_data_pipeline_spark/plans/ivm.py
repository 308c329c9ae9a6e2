"""Incremental view maintenance: keep a materialized aggregate correct
under a change feed WITHOUT recomputing it from the base table.

The reference's whole sync loop is this pattern at row granularity —
fetch the delta, merge into the store (/root/reference/
psx_data_automation/scrape_tickers.py:414-470 and the planned daily
OHLC delta-append, README.md:61-71). This operator lifts it to
AGGREGATE granularity, the shape every 100 TB reporting pipeline
needs: the per-user totals view V is materialized ONCE (bucketed by
its group key), and each maintenance cycle touches only the delta —
inserts carry +1 multiplicity, deletes carry -1 (the classic
delta-rule / DBToaster formulation: SUM and COUNT are
self-maintainable, so V' = V ⊎ agg(signed delta) needs no base scan).

100 TB shape:
  * V is written bucketed by user_id, so the merge join consumes the
    bucket layout — V-side exchange-free, proven the same way as
    bucketed_join (tests assert no Exchange over the V scan);
  * only the delta is scanned, shuffled (one map-side-combinable
    signed aggregate), and merged: maintenance cost is O(|delta|),
    not O(|base|);
  * SQL-NULL correctness under retraction: the view carries the
    non-null-value count nv alongside the signed milli-sum, so a
    user whose remaining values are all NULL reports SUM = NULL,
    exactly like a recompute (the stream_user_totals sentinel
    lesson, applied to deletes);
  * groups whose row count reaches zero leave the view entirely.

The change feed is data-borne and deterministic: rows with
event_id % 5 = 4 are the day's inserts, base rows with
event_id % 17 = 0 are the day's deletes (a GDPR-style purge); NULL
event_ids belong to neither side in either engine (NULL % n is NULL,
comparisons are UNKNOWN), so the cycle never touches them. The
oracle is the full recompute over the post-change base — the merge
matches it value-for-value or the maintenance rule is wrong.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psx_data_pipeline_spark.functions.numeric import MILLI_SQL, milli
from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.scratch import scratch_dir
from psx_data_pipeline_spark.sources.fixtures import load_events

_INSERT_PRED = "event_id % 5 = 4"
_BASE_PRED = "event_id % 5 <> 4"
_DELETE_PRED = f"({_BASE_PRED}) AND event_id % 17 = 0"

_MILLI = MILLI_SQL.format("value")

IVM_USER_TOTALS_ORACLE = f"""
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM({_MILLI}) AS BIGINT) AS value_k
FROM events
WHERE ({_INSERT_PRED})
   OR (({_BASE_PRED}) AND event_id % 17 <> 0)
GROUP BY user_id
"""

_V_BUCKETS = 32


def _nn_key(df: DataFrame) -> DataFrame:
    """Encode the nullable group key as the NON-NULL pair
    (k = coalesce(user_id, 0), knull = user_id IS NULL): GROUP BY
    keeps a NULL group on both sides, and a plain equi-join would
    never match it — the merged view carried TWO rows for the NULL
    user where a recompute has one (hostile-events probe finding,
    this round). Doing the null-safe expansion EXPLICITLY (instead
    of eqNullSafe) keeps the join keys identical to V's bucket
    columns, so the bucket layout still satisfies the merge's
    distribution — eqNullSafe's internal (coalesce, isnull) keys do
    not match a user_id bucketing and silently re-shuffle V."""
    return df.withColumn("k", F.coalesce(F.col("user_id"), F.lit(0))).withColumn(
        "knull", F.col("user_id").isNull()
    )


def materialize_view(spark: SparkSession, sf_dir: str) -> str:
    """Build and persist the pre-change view V over the base rows,
    bucketed by the (non-null-encoded) group key; returns the table
    name. In production this runs once (or per compaction), not per
    maintenance cycle."""
    base = _nn_key(load_events(spark, sf_dir).where(F.expr(_BASE_PRED)))
    v = base.groupBy("k", "knull").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(milli("value")).alias("vk"),
        F.count(milli("value")).alias("nv"),
    )
    name = "ivm_user_totals_v"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        v.write.bucketBy(_V_BUCKETS, "k", "knull")
        .sortBy("k", "knull")
        .option("path", f"{scratch_dir('ivm_view')}/{name}")
        .mode("overwrite")
        .saveAsTable(name)
    )
    return name


def signed_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The day's change feed with +1/-1 multiplicities, aggregated to
    one row per touched user — the only corpus-derived shuffle a
    maintenance cycle pays, and it is map-side combinable."""
    ev = load_events(spark, sf_dir)
    inserts = ev.where(F.expr(_INSERT_PRED)).withColumn("sign", F.lit(1))
    deletes = ev.where(F.expr(_DELETE_PRED)).withColumn("sign", F.lit(-1))
    feed = _nn_key(inserts.unionByName(deletes))
    sm = milli("value")
    return feed.groupBy("k", "knull").agg(
        F.sum("sign").alias("dn"),
        F.sum(F.col("sign") * sm).alias("dvk"),
        F.sum(F.when(sm.isNotNull(), F.col("sign"))).alias("dnv"),
    )


@query("ivm_user_totals", IVM_USER_TOTALS_ORACLE)
def q_ivm_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full maintenance cycle: materialize V, apply the signed
    delta, return the maintained view — which the oracle checks
    against a from-scratch recompute (module docstring)."""
    vname = materialize_view(spark, sf_dir)
    v = spark.table(vname)
    d = signed_delta(spark, sf_dir)
    # plain equi-join on the non-null (k, knull) pair — NULL-group
    # correct (see _nn_key) AND bucket-layout compatible, so the V
    # side stays exchange-free (pinned by tests/test_ivm.py)
    merged = v.join(d, ["k", "knull"], "full_outer").select(
        F.when(~F.col("knull"), F.col("k")).alias("user_id"),
        (F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("dn"), F.lit(0)))
        .alias("n2"),
        (F.coalesce(F.col("vk"), F.lit(0)) + F.coalesce(F.col("dvk"), F.lit(0)))
        .alias("vk2"),
        (F.coalesce(F.col("nv"), F.lit(0)) + F.coalesce(F.col("dnv"), F.lit(0)))
        .alias("nv2"),
    )
    return merged.where(F.col("n2") > 0).select(
        "user_id",
        F.col("n2").alias("n_events"),
        # SUM over zero remaining non-null values is NULL, not 0
        F.when(F.col("nv2") > 0, F.col("vk2")).alias("value_k"),
    )
