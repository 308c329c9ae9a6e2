"""Corpus version diff: what changed between two releases of a
100 TB document store.

The reference's core loop diffs two ticker-universe snapshots and
reports added/deleted/renamed (scrape_tickers.py:414-470,
`snapshot_diff`); this is the same operator at corpus scale — every
dataset release pipeline publishes exactly this churn report
(added / removed / changed / unchanged, per source) next to the new
version, and regression review starts from it.

The two versions derive deterministically from the fixture table so
both engines reproduce them: v2 removes every doc_id % 11 = 0 row,
appends a fresh doc (id + shift) for every doc_id % 13 = 0 row, and
revises the text of every remaining doc_id % 7 = 0 row. The diff
itself never compares text bodies across the join — each side
reduces to (doc_id, source, md5 fingerprint) at scan time, the
full-outer join runs on the 8-byte-key projection, and change
classes fall out of null-ness + fingerprint equality. Output is the
per-(source, change_type) count table — bounded by the source
catalogue, not the corpus.

100 TB shape: two fingerprint projections (scan-side md5, no
shuffle), ONE full-outer equi-join on doc_id, one bounded aggregate.
At cluster scale both sides would be bucketed by doc_id like the IVM
view and the join consumes the layout; nothing here is more than the
reference's diff done with hashes instead of strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psx_data_pipeline_spark.functions.textfns import TOKENS_SQL
from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_table

_TOKS = TOKENS_SQL.format("text")

_ID_SHIFT = 1_000_000  # new-doc ids in v2 (disjoint from v1 by fixture contract)

_V1_SQL = """
  SELECT doc_id, source, md5(text) AS fp FROM documents
  WHERE doc_id IS NOT NULL
"""

_V2_SQL = f"""
  SELECT doc_id, source,
         CASE WHEN doc_id % 7 = 0 THEN md5(text || ' rev2')
              ELSE md5(text) END AS fp
  FROM documents
  WHERE doc_id IS NOT NULL AND doc_id % 11 <> 0
  UNION ALL
  SELECT doc_id + {_ID_SHIFT}, source, md5(text || ' new')
  FROM documents
  WHERE doc_id IS NOT NULL AND doc_id % 13 = 0
"""

CORPUS_DIFF_ORACLE = f"""
WITH v1 AS ({_V1_SQL}),
v2 AS ({_V2_SQL}),
j AS (
  SELECT coalesce(v1.source, v2.source) AS source,
         CASE
           WHEN v1.doc_id IS NULL THEN 'ADDED'
           WHEN v2.doc_id IS NULL THEN 'REMOVED'
           WHEN v1.fp IS DISTINCT FROM v2.fp THEN 'CHANGED'
           ELSE 'UNCHANGED'
         END AS change_type
  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
)
SELECT source, change_type, count(*) AS n
FROM j GROUP BY source, change_type
"""


def _v1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, "documents", sf_dir)
        .where(F.col("doc_id").isNotNull())
        .select("doc_id", "source", F.md5("text").alias("fp"))
    )


def _v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir).where(
        F.col("doc_id").isNotNull()
    )
    survivors = d.where(F.col("doc_id") % 11 != 0).select(
        "doc_id", "source",
        F.when(
            F.col("doc_id") % 7 == 0, F.md5(F.concat(F.col("text"), F.lit(" rev2")))
        ).otherwise(F.md5("text")).alias("fp"),
    )
    fresh = d.where(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + _ID_SHIFT).alias("doc_id"), "source",
        F.md5(F.concat(F.col("text"), F.lit(" new"))).alias("fp"),
    )
    return survivors.unionByName(fresh)


@query("corpus_diff", CORPUS_DIFF_ORACLE)
def q_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, change class) churn counts between two corpus
    versions (module docstring)."""
    v1 = _v1(spark, sf_dir).alias("v1")
    v2 = _v2(spark, sf_dir).alias("v2")
    j = v1.join(v2, F.col("v1.doc_id") == F.col("v2.doc_id"), "full_outer")
    classified = j.select(
        F.coalesce(F.col("v1.source"), F.col("v2.source")).alias("source"),
        F.when(F.col("v1.doc_id").isNull(), "ADDED")
        .when(F.col("v2.doc_id").isNull(), "REMOVED")
        .when(
            ~F.col("v1.fp").eqNullSafe(F.col("v2.fp")), "CHANGED"
        )
        .otherwise("UNCHANGED")
        .alias("change_type"),
    )
    return classified.groupBy("source", "change_type").agg(
        F.count(F.lit(1)).alias("n")
    )


# --- epoch mixing schedule ---------------------------------------------------

_MIX_SLOTS = 10_000  # batch slots apportioned per epoch block

MIXING_SCHEDULE_ORACLE = f"""
WITH per_source AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(floor(1000 * sqrt(CAST(
           sum(len({_TOKS})) AS DOUBLE)))
           AS BIGINT) AS weight_milli
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(sum(weight_milli) AS BIGINT) AS w_total FROM per_source),
quotas AS (
  SELECT p.source, p.n_docs, p.weight_milli,
         CASE WHEN t.w_total = 0 THEN 0
              ELSE ({_MIX_SLOTS} * p.weight_milli) // t.w_total END AS q0,
         CASE WHEN t.w_total = 0 THEN 0
              ELSE ({_MIX_SLOTS} * p.weight_milli) % t.w_total END AS rem,
         t.w_total
  FROM per_source p CROSS JOIN tot t
),
ranked AS (
  SELECT *, CAST(row_number() OVER (ORDER BY rem DESC, source) AS BIGINT)
           AS rk,
         CAST(sum(q0) OVER () AS BIGINT) AS q_sum
  FROM quotas
)
SELECT source, n_docs, weight_milli,
       CAST(q0 + CASE WHEN w_total > 0
                 AND rk <= {_MIX_SLOTS} - q_sum THEN 1 ELSE 0 END AS BIGINT)
         AS quota
FROM ranked
"""


@query("mixing_schedule", MIXING_SCHEDULE_ORACLE)
def q_mixing_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch data-mixing plan: apportion a fixed block of batch slots
    across sources by temperature weight (alpha = 0.5: weight =
    floor(1000·sqrt(source tokens)) — sqrt is IEEE correctly-rounded,
    so the integer weight is cross-engine exact) using LARGEST-
    REMAINDER apportionment: floor quotas first, then the leftover
    slots go to the largest fractional remainders (ties by source
    name). Sums to exactly the slot count by construction — the
    property a training scheduler needs from a mixing manifest.

    Everything after the one per-source aggregate runs on the
    source-catalogue table (bounded rows): the unpartitioned windows
    are over that catalogue, never the corpus."""
    from psx_data_pipeline_spark.functions.textfns import tokens
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.floor(
            F.lit(1000.0)
            * F.sqrt(F.sum(F.size(tokens("text"))).cast("double"))
        ).cast("long").alias("weight_milli"),
    )
    tot = per_source.agg(
        F.sum("weight_milli").cast("long").alias("w_total")
    )
    quotas = per_source.crossJoin(F.broadcast(tot)).select(
        "source", "n_docs", "weight_milli", "w_total",
        F.when(F.col("w_total") == 0, F.lit(0).cast("long"))
        .otherwise(F.expr(f"({_MIX_SLOTS} * weight_milli) div w_total"))
        .alias("q0"),
        F.when(F.col("w_total") == 0, F.lit(0).cast("long"))
        .otherwise(F.expr(f"({_MIX_SLOTS} * weight_milli) % w_total"))
        .alias("rem"),
    )
    w_rank = Window.orderBy(F.desc("rem"), F.asc("source"))
    w_all = Window.partitionBy()
    ranked = quotas.select(
        "source", "n_docs", "weight_milli", "w_total", "q0",
        F.row_number().over(w_rank).cast("long").alias("rk"),
        F.sum("q0").over(w_all).cast("long").alias("q_sum"),
    )
    return ranked.select(
        "source", "n_docs", "weight_milli",
        (
            F.col("q0")
            + F.when(
                (F.col("w_total") > 0)
                & (F.col("rk") <= F.lit(_MIX_SLOTS) - F.col("q_sum")),
                1,
            ).otherwise(0)
        ).cast("long").alias("quota"),
    )
