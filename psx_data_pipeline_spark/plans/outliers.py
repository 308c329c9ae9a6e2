"""Embedding outlier detection: per label, the vectors farthest from
their label's centroid — the mislabeled/garbage-vector triage every
embedding release runs before the index build (the geometric
complement of robust_outliers' scalar fences and ks_drift's
distributional test).

Exactness without n² blowup: components quantize to milli integers;
the centroid itself is FLOORED to milli units (c_i = S_i div n, the
truncating integer division both engines share), so the score
d2 = Σ (x_i − c_i)² is pure bounded integer arithmetic — the
envelope is dim · (2 · 1000 · bound)² ≈ 2.6e12 for the repo's
|x| ≤ 100 validity bound, INDEPENDENT of the corpus size (the naive
Σ (n·x_i − S_i)² form re-derives the true centroid but its n² factor
leaves int64 around n ≈ 4e5 vectors per label). The floored centroid
is within one milli of the true one per dimension, and the metric is
DEFINED as distance to that quantized centroid.

100 TB shape: one (label, dim) aggregate (map-side combinable, 64·
|labels| rows out), broadcast back onto a second exploded scan; the
top-k window ranks per-label candidate rows with a literal bound
(WindowGroupLimit). The corpus is never the build side of any join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from psx_data_pipeline_spark.operators.similarity import (
    valid_embedding,
    valid_embedding_sql,
)
from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_table

_DIM = 64
_TOP_K = 3

_VALID = valid_embedding_sql("embedding", _DIM)

EMBEDDING_OUTLIERS_ORACLE = f"""
WITH ok AS (
  SELECT vec_id, label,
         list_transform(embedding,
           x -> CAST(floor(1000 * CAST(x AS DOUBLE)) AS BIGINT)) AS xm
  FROM embeddings
  WHERE label IS NOT NULL AND vec_id IS NOT NULL AND {_VALID}
),
exploded AS (
  SELECT vec_id, label, unnest(xm) AS x,
         generate_subscripts(xm, 1) AS pos
  FROM ok
),
centroid AS (
  SELECT label, pos,
         CAST(sum(x) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
  FROM exploded GROUP BY label, pos
),
dist AS (
  SELECT e.vec_id, e.label,
         CAST(sum((e.x - c.s // c.n) * (e.x - c.s // c.n)) AS BIGINT)
           AS dist2_milli2
  FROM exploded e
  JOIN centroid c ON c.label = e.label AND c.pos = e.pos
  GROUP BY e.vec_id, e.label
)
SELECT label, vec_id, dist2_milli2, CAST(rk AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY label ORDER BY dist2_milli2 DESC, vec_id) AS rk
  FROM dist
) WHERE rk <= {_TOP_K}
"""


@query("embedding_outliers", EMBEDDING_OUTLIERS_ORACLE)
def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_TOP_K} farthest vectors per label, scored as the exact
    squared milli-distance to the label's floored-milli centroid
    (module docstring). Invalid embeddings (wrong dim / NULL / NaN /
    Inf / out-of-bound) are out of scope — embedding_stats owns
    reporting them.

    The truncating division S div n matches DuckDB's // for every
    sign (both truncate toward zero), so the quantized centroid is
    cross-engine identical."""
    emb = load_table(spark, "embeddings", sf_dir).where(
        F.col("label").isNotNull()
        & F.col("vec_id").isNotNull()
        & valid_embedding("embedding", _DIM)
    )
    ok = emb.select(
        "vec_id", "label",
        F.transform(
            "embedding",
            lambda x: F.floor(F.lit(1000.0) * x.cast("double")).cast("long"),
        ).alias("xm"),
    )
    exploded = ok.select(
        "vec_id", "label", F.posexplode("xm").alias("pos0", "x")
    ).select("vec_id", "label", (F.col("pos0") + 1).alias("pos"), "x")
    centroid = exploded.groupBy("label", "pos").agg(
        F.sum("x").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    ).withColumnsRenamed({"label": "c_label", "pos": "c_pos"})
    dist = (
        exploded.join(
            F.broadcast(centroid),
            (F.col("label") == F.col("c_label"))
            & (F.col("pos") == F.col("c_pos")),
        )
        .select(
            "vec_id", "label",
            ((F.col("x") - F.expr("s div n"))
             * (F.col("x") - F.expr("s div n"))).alias("d2"),
        )
        .groupBy("vec_id", "label")
        .agg(F.sum("d2").cast("long").alias("dist2_milli2"))
    )
    w = Window.partitionBy("label").orderBy(
        F.desc("dist2_milli2"), F.asc("vec_id")
    )
    return (
        dist.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _TOP_K)
        .select("label", "vec_id", "dist2_milli2", "rank")
    )
