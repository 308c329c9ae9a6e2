"""Lakehouse table-maintenance operators: compaction planning and
ordered CDC application — the storage-layer jobs (Delta OPTIMIZE /
Iceberg rewrite, Debezium-style merge) that keep a 100 TB table
readable while the analytic queries in the rest of this package run
against it.

Both derive their inputs deterministically from the fixture tables
(the same convention as corpus_diff's two versions), so both engines
reproduce the file manifest / change log exactly and the oracle can
hash-compare the PLAN and the APPLIED SNAPSHOT, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_table

# --- compaction planning -----------------------------------------------------

_TARGET_BYTES = 4096  # per-output-file target in the simulated units

# Simulated small-file manifest: one "file" per (order day, writer
# bucket) with bytes = 64·rows — the classic streaming-ingest debris
# pattern (each micro-batch wrote one file per partition per writer).
_MANIFEST_SQL = """
  SELECT CAST(o_orderdate AS DATE) AS part_date,
         o_orderkey % 8 AS writer,
         CAST(64 * count(*) AS BIGINT) AS bytes
  FROM orders WHERE o_orderdate IS NOT NULL
  GROUP BY 1, 2
"""

COMPACTION_PLAN_ORACLE = f"""
WITH manifest AS ({_MANIFEST_SQL}),
ordered AS (
  SELECT part_date, writer, bytes,
         CAST(sum(bytes) OVER (
           PARTITION BY part_date ORDER BY bytes DESC, writer
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cume
  FROM manifest
),
binned AS (
  SELECT part_date, bytes,
         (cume - bytes) // {_TARGET_BYTES} AS bin
  FROM ordered
)
SELECT part_date, CAST(bin AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(bytes) AS BIGINT) AS total_bytes
FROM binned GROUP BY part_date, bin
"""


@query("compaction_plan", COMPACTION_PLAN_ORACLE)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan: within each date partition, files
    ordered largest-first (the first-fit-decreasing ordering) are
    packed into output bins by running-size — a file starts a new bin
    when the bytes BEFORE it cross a target multiple, so every bin
    except possibly the last is >= target once closed. Output is the
    per-(partition, bin) rewrite group a table-maintenance service
    would submit.

    Scale: the window runs per date partition over that partition's
    FILE COUNT (writer-bounded, not row count) — the manifest
    aggregate is the only corpus-wide shuffle."""
    orders = load_table(spark, "orders", sf_dir)
    manifest = (
        orders.where(F.col("o_orderdate").isNotNull())
        .groupBy(
            F.col("o_orderdate").cast("date").alias("part_date"),
            (F.col("o_orderkey") % 8).alias("writer"),
        )
        .agg((64 * F.count(F.lit(1))).cast("long").alias("bytes"))
    )
    w = (
        Window.partitionBy("part_date")
        .orderBy(F.desc("bytes"), F.asc("writer"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = manifest.select(
        "part_date", "bytes",
        ((F.sum("bytes").over(w) - F.col("bytes"))
         .cast("long")).alias("cume_before"),
    ).select(
        "part_date", "bytes",
        F.expr(f"cume_before div {_TARGET_BYTES}").alias("bin"),
    )
    return binned.groupBy(
        "part_date", F.col("bin").cast("long").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("bytes").cast("long").alias("total_bytes"),
    )


# --- ordered CDC application -------------------------------------------------

# Deterministic change log over the customer base (seq orders the
# operations; doubled updates prove last-writer-wins):
#   seq 1: INSERT fresh keys (+200000) for custkey % 7 = 0
#   seq 2: DELETE custkey % 5 = 0
#   seq 3: UPDATE name -> name || ' v2' for custkey % 3 = 0
#   seq 4: UPDATE name -> name || ' v3' for custkey % 15 = 0
# A deleted key later updated (15 | 3·5) resurfaces via seq 3/4 with
# the updated payload — upsert semantics, exactly how a Debezium 'u'
# event after a tombstone behaves when the consumer treats updates as
# upserts.
_CDC_SQL = """
  SELECT c_custkey AS k, 0 AS seq, 'U' AS op, c_name AS name,
         c_mktsegment AS segment FROM customer
  UNION ALL
  SELECT c_custkey + 200000, 1, 'U', c_name || ' new', c_mktsegment
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey, 2, 'D', NULL, NULL
  FROM customer WHERE c_custkey % 5 = 0
  UNION ALL
  SELECT c_custkey, 3, 'U', c_name || ' v2', c_mktsegment
  FROM customer WHERE c_custkey % 3 = 0
  UNION ALL
  SELECT c_custkey, 4, 'U', c_name || ' v3', c_mktsegment
  FROM customer WHERE c_custkey % 15 = 0
"""

# The LWW order is TOTAL: seq leads, then (op, name, segment) —
# exactly the field order of the streaming twin's MAX(struct(...)),
# where a NULL field compares smallest (= DESC NULLS LAST here). An
# at-least-once feed can replay a batch and land the same (k, seq)
# twice with different payloads; without the full tiebreak the pick
# is order-of-input luck (the hostile relational probe's
# duplicate-key salt caught the streaming/batch sides disagreeing).
CDC_APPLY_ORACLE = f"""
WITH log AS ({_CDC_SQL}),
latest AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY k ORDER BY seq DESC, op DESC,
      name DESC NULLS LAST, segment DESC NULLS LAST) AS rn
    FROM log WHERE k IS NOT NULL
  ) WHERE rn = 1
)
SELECT k AS c_custkey, name, segment, CAST(seq AS BIGINT) AS applied_seq
FROM latest WHERE op <> 'D'
"""


def cdc_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic change log (module comment above): base
    snapshot at seq 0 plus the four derived operation batches.
    Shared by the batch merge below and the streaming twin
    (streaming/jobs.streaming_cdc_apply)."""
    cust = load_table(spark, "customer", sf_dir)
    base = cust.select(
        F.col("c_custkey").alias("k"), F.lit(0).alias("seq"),
        F.lit("U").alias("op"), F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )
    ins = cust.where(F.col("c_custkey") % 7 == 0).select(
        (F.col("c_custkey") + 200000).alias("k"), F.lit(1).alias("seq"),
        F.lit("U").alias("op"),
        F.concat(F.col("c_name"), F.lit(" new")).alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )
    dels = cust.where(F.col("c_custkey") % 5 == 0).select(
        F.col("c_custkey").alias("k"), F.lit(2).alias("seq"),
        F.lit("D").alias("op"),
        F.lit(None).cast("string").alias("name"),
        F.lit(None).cast("string").alias("segment"),
    )
    upd2 = cust.where(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("k"), F.lit(3).alias("seq"),
        F.lit("U").alias("op"),
        F.concat(F.col("c_name"), F.lit(" v2")).alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )
    upd3 = cust.where(F.col("c_custkey") % 15 == 0).select(
        F.col("c_custkey").alias("k"), F.lit(4).alias("seq"),
        F.lit("U").alias("op"),
        F.concat(F.col("c_name"), F.lit(" v3")).alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )
    return base.unionByName(ins).unionByName(dels).unionByName(
        upd2
    ).unionByName(upd3).where(F.col("k").isNotNull())


@query("cdc_apply", CDC_APPLY_ORACLE)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered CDC merge: base snapshot (seq 0) unioned with the
    change log, ONE per-key last-writer-wins reduction (row_number
    over seq desc — never max_by, whose NULL handling differs across
    engines), tombstones dropped last so a delete-then-update key
    correctly resurfaces. This is SCD-1 (plans/ticker.py) generalized
    to multi-operation batches with total ordering — the shape every
    log-ingest (Debezium/Kafka) compaction job has. The order is the
    streaming twin's struct-MAX field order (seq, op, name, segment)
    so a duplicate-seq replay resolves identically batch-side and
    stream-side (oracle comment above).

    Scale: one shuffle on the key; per-key state is the ops for that
    key in the batch (bounded by batch cadence, not table size)."""
    log = cdc_log(spark, sf_dir)
    w = Window.partitionBy("k").orderBy(
        F.desc("seq"), F.desc("op"),
        F.desc_nulls_last("name"), F.desc_nulls_last("segment"),
    )
    latest = (
        log.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    return latest.where(F.col("op") != "D").select(
        F.col("k").alias("c_custkey"), "name", "segment",
        F.col("seq").cast("long").alias("applied_seq"),
    )
