"""Cross-source score calibration: quantile normalization.

A training-data pipeline scores documents with per-source
heuristics or per-shard classifier versions whose raw scales are not
comparable — a "0.8" from one source is not a "0.8" from another.
The standard fix (quantile normalization, as in the limma/
microarray literature and every multi-source data-mixing pipeline)
maps each document's WITHIN-SOURCE rank onto the POOLED score
distribution, so downstream thresholds ("keep the top 30 %") mean
the same thing for every source. Generalizes the reference's
per-category update statistics (scrape_tickers.py:503-533) from
counts to distribution alignment.

Integer-exact construction (both engines reproduce every value):

  * score = n_chars (data-borne BIGINT); NULL score / NULL source
    rows are out of contract on both sides;
  * within-source position: distinct-value cumulative counts (the
    ``group_quantiles`` trick) → permille = (cum_before * 1000) //
    (n_s - 1) — the rank of a value's FIRST occurrence; ties share
    the permille by convention;
  * pooled mapping: a 1001-point pooled-quantile grid (permille p →
    pooled value at index (p * (N-1)) // 1000) built with the
    union-fill as-of pattern (``resample_ffill``): pooled distinct
    values enter at position cum_before, grid points at position j,
    and last_value IGNORE NULLS over (pos, ord) resolves each grid
    point to the covering value — no theta/range join anywhere;
  * calibrated = grid[permille], an equi-join against 1001 rows.

100 TB shape: two distinct-value aggregates (map-side combinable,
bounded by the score DOMAIN, not the corpus — the group_quantiles
argument), one window over pooled distinct values + 1001 grid rows
(single partition of domain-bounded size, same bound as
group_quantiles' per-source windows), and two equi-joins back to
rows: (source, score) → permille, permille → calibrated (1001-row
broadcast). No row-level sort of the corpus, no range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_table

QUANTILE_CALIBRATE_ORACLE = """
WITH d AS (
  SELECT doc_id, source, n_chars AS s FROM documents
  WHERE n_chars IS NOT NULL AND source IS NOT NULL
),
sv AS (
  SELECT source, s, count(*) AS c FROM d GROUP BY 1, 2
),
svc AS (
  SELECT source, s,
         sum(c) OVER (PARTITION BY source ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
           AS cum_before,
         sum(c) OVER (PARTITION BY source) AS n_s
  FROM sv
),
sp AS (
  SELECT source, s,
         CAST(CASE WHEN n_s <= 1 THEN 0
              ELSE (cum_before * 1000) // (n_s - 1) END AS BIGINT)
           AS permille
  FROM svc
),
pv AS (SELECT s, count(*) AS c FROM d GROUP BY 1),
pvc AS (
  SELECT s,
         sum(c) OVER (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
           AS cum_before
  FROM pv
),
n_tot AS (SELECT count(*) AS n FROM d),
gp AS (
  SELECT p, (p * (n - 1)) // 1000 AS j
  FROM (SELECT unnest(generate_series(0, 1000)) AS p) t, n_tot
),
unioned AS (
  SELECT cum_before AS pos, 0 AS ord, s AS v, NULL AS p FROM pvc
  UNION ALL
  SELECT j AS pos, 1 AS ord, NULL AS v, p FROM gp
),
filledg AS (
  SELECT ord, p,
         last_value(v IGNORE NULLS) OVER (
           ORDER BY pos, ord
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gv
  FROM unioned
),
grid AS (SELECT p AS permille, gv AS calibrated FROM filledg WHERE ord = 1)
SELECT d.doc_id, d.source, d.s AS score, sp.permille, g.calibrated
FROM d
JOIN sp ON sp.source = d.source AND sp.s = d.s
JOIN grid g ON g.permille = sp.permille
"""


def pooled_grid(d: DataFrame) -> DataFrame:
    """The 1001-point pooled-quantile grid (permille -> calibrated
    value), built with the union-fill as-of pattern — constant-size
    output regardless of corpus size."""
    pvc = (
        d.groupBy("s").agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "cum_before",
            F.sum("c").over(
                Window.orderBy("s").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ) - F.col("c"),
        )
    )
    n_tot = d.agg(F.count(F.lit(1)).alias("n"))
    gp = (
        spark_range_1001(d)
        .crossJoin(F.broadcast(n_tot))
        .select("p", F.expr("(p * (n - 1)) div 1000").alias("j"))
    )
    unioned = pvc.select(
        F.col("cum_before").alias("pos"), F.lit(0).alias("ord"),
        F.col("s").alias("v"), F.lit(None).cast("long").alias("p"),
    ).unionByName(
        gp.select(
            F.col("j").alias("pos"), F.lit(1).alias("ord"),
            F.lit(None).cast("long").alias("v"), "p",
        )
    )
    w_fill = Window.orderBy("pos", "ord").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        unioned.withColumn("gv", F.last("v", ignorenulls=True).over(w_fill))
        .where(F.col("ord") == 1)
        .select(F.col("p").alias("permille"), F.col("gv").alias("calibrated"))
    )


def spark_range_1001(d: DataFrame) -> DataFrame:
    """0..1000 as a 1001-row frame on d's session (no driver data)."""
    return d.sparkSession.range(0, 1001).select(F.col("id").alias("p"))


@query("quantile_calibrate", QUANTILE_CALIBRATE_ORACLE)
def q_quantile_calibrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map every document's within-source score rank onto the pooled
    score distribution (module docstring)."""
    d = (
        load_table(spark, "documents", sf_dir)
        .where(F.col("n_chars").isNotNull() & F.col("source").isNotNull())
        .select("doc_id", "source", F.col("n_chars").alias("s"))
    )
    w_cum = (
        Window.partitionBy("source").orderBy("s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sp = (
        d.groupBy("source", "s").agg(F.count(F.lit(1)).alias("c"))
        .withColumn("cum_before", F.sum("c").over(w_cum) - F.col("c"))
        .withColumn("n_s", F.sum("c").over(Window.partitionBy("source")))
        .select(
            "source", "s",
            F.expr(
                "CASE WHEN n_s <= 1 THEN 0 "
                "ELSE (cum_before * 1000) div (n_s - 1) END"
            ).alias("permille"),
        )
    )
    out = (
        d.join(sp, ["source", "s"])
        .join(F.broadcast(pooled_grid(d)), "permille")
    )
    return out.select(
        "doc_id", "source", F.col("s").alias("score"),
        "permille", "calibrated",
    )
