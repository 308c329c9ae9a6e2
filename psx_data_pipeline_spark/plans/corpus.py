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

from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_table

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
