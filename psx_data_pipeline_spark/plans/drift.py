"""Embedding centroid drift: per label, the cosine between the
centroids of two deterministic halves of the corpus (vec_id parity)
— the re-embedding / distribution-shift audit an embedding release
runs next to ks_drift's scalar test and embedding_outliers' per-
vector triage. If the two halves of the same label no longer point
the same way, the label's geometry moved (or the label is noise).

Exactness: components quantize to milli ints, each half-centroid is
the FLOORED integer mean (S div n — truncation toward zero in both
engines, the embedding_outliers precedent), and the threshold test
is semdedup's integer-cosine form: cos ≥ T/1000 ⟺ dot > 0 ∧
10⁶·dot² ≥ T²·n2a·n2b, evaluated in DECIMAL(38,0)/HUGEINT because
dot² ~ 4e23 passes int64. The split is ((vec_id % 2) + 2) % 2 —
written identically on both sides because the engines agree that %
keeps the dividend's sign, so the +2 normalization makes negative
replay ids land in the same half everywhere.

_DRIFT_T_MILLI = 50 (0.05) is calibrated to the fixture's measured
per-label cosine range (−0.20 … 0.31 at sf0.01) so BOTH flag
branches execute under the oracle hash — the semdedup non-vacuity
lesson; a production gate over trained embeddings would run ~0.95.

100 TB shape: one (label, split, dim) aggregate (map-side
combinable, 2·64·|labels| rows out), then a |labels|-bounded
self-join of that tiny table — the corpus is scanned once and never
joined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psx_data_pipeline_spark.operators.similarity import (
    valid_embedding,
    valid_embedding_sql,
)
from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_table

_DIM = 64
_DRIFT_T_MILLI = 50
_DRIFT_T_SQ = _DRIFT_T_MILLI * _DRIFT_T_MILLI

_VALID = valid_embedding_sql("embedding", _DIM)

CENTROID_DRIFT_ORACLE = f"""
WITH ok AS (
  SELECT vec_id, label,
         list_transform(embedding,
           x -> CAST(floor(1000 * CAST(x AS DOUBLE)) AS BIGINT)) AS xm
  FROM embeddings
  WHERE label IS NOT NULL AND vec_id IS NOT NULL AND {_VALID}
),
exploded AS (
  SELECT ((vec_id % 2) + 2) % 2 AS split, label, unnest(xm) AS x,
         generate_subscripts(xm, 1) AS pos
  FROM ok
),
cent AS (
  SELECT label, split, pos,
         CAST(sum(x) AS BIGINT) // count(*) AS c,
         CAST(count(*) AS BIGINT) AS n
  FROM exploded GROUP BY 1, 2, 3
),
pairs AS (
  SELECT a.label,
         CAST(max(a.n) AS BIGINT) AS n_a,
         CAST(max(b.n) AS BIGINT) AS n_b,
         CAST(sum(a.c * b.c) AS BIGINT) AS dot_ab,
         CAST(sum(a.c * a.c) AS BIGINT) AS norm2_a,
         CAST(sum(b.c * b.c) AS BIGINT) AS norm2_b
  FROM cent a JOIN cent b ON a.label = b.label AND a.pos = b.pos
  WHERE a.split = 0 AND b.split = 1
  GROUP BY a.label
)
SELECT label, n_a, n_b, dot_ab, norm2_a, norm2_b,
       NOT (dot_ab > 0 AND
            1000000 * (CAST(dot_ab AS HUGEINT) * dot_ab)
              >= {_DRIFT_T_SQ} *
                 (CAST(norm2_a AS HUGEINT) * norm2_b)) AS drifted
FROM pairs
"""


@query("embedding_centroid_drift", CENTROID_DRIFT_ORACLE)
def q_embedding_centroid_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-label cosine agreement between the two vec_id-parity
    half-centroids, with the drifted flag at _DRIFT_T_MILLI/1000
    (module docstring covers calibration and the integer-cosine
    form). Labels present in only one half drop from the inner
    centroid self-join — a one-sided label has no drift to measure
    (the membership census owns it)."""
    emb = load_table(spark, "embeddings", sf_dir).where(
        F.col("label").isNotNull()
        & F.col("vec_id").isNotNull()
        & valid_embedding("embedding", _DIM)
    )
    ok = emb.select(
        F.expr("((vec_id % 2) + 2) % 2").alias("split"),
        "label",
        F.transform(
            "embedding",
            lambda x: F.floor(F.lit(1000.0) * x.cast("double")).cast("long"),
        ).alias("xm"),
    )
    exploded = ok.select(
        "split", "label", F.posexplode("xm").alias("pos0", "x")
    ).select("split", "label", (F.col("pos0") + 1).alias("pos"), "x")
    cent = exploded.groupBy("label", "split", "pos").agg(
        F.expr("CAST(sum(x) AS BIGINT) div count(*)").alias("c"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    a = cent.where(F.col("split") == 0).select(
        F.col("label").alias("a_label"), F.col("pos").alias("a_pos"),
        F.col("c").alias("ca"), F.col("n").alias("na"),
    )
    b = cent.where(F.col("split") == 1).select(
        F.col("label").alias("b_label"), F.col("pos").alias("b_pos"),
        F.col("c").alias("cb"), F.col("n").alias("nb"),
    )
    pairs = (
        a.join(
            b,
            (F.col("a_label") == F.col("b_label"))
            & (F.col("a_pos") == F.col("b_pos")),
        )
        .groupBy(F.col("a_label").alias("label"))
        .agg(
            F.max("na").cast("long").alias("n_a"),
            F.max("nb").cast("long").alias("n_b"),
            F.sum(F.col("ca") * F.col("cb")).cast("long").alias("dot_ab"),
            F.sum(F.col("ca") * F.col("ca")).cast("long").alias("norm2_a"),
            F.sum(F.col("cb") * F.col("cb")).cast("long").alias("norm2_b"),
        )
    )
    not_drifted = F.expr(
        "dot_ab > 0 AND 1000000 * (CAST(dot_ab AS DECIMAL(38,0))"
        " * CAST(dot_ab AS DECIMAL(38,0)))"
        f" >= {_DRIFT_T_SQ} *"
        " (CAST(norm2_a AS DECIMAL(38,0)) * CAST(norm2_b AS DECIMAL(38,0)))"
    )
    return pairs.select(
        "label", "n_a", "n_b", "dot_ab", "norm2_a", "norm2_b",
        (~not_drifted).alias("drifted"),
    )
