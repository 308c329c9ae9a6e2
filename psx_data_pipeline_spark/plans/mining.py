"""Hard-negative mining for contrastive / metric training: for each
query vector, the most-similar corpus vectors of a DIFFERENT class.
High-cosine different-label neighbors are exactly the "hard
negatives" a triplet/InfoNCE data pipeline mines per anchor (the
easy negatives are random; the hard ones are near the decision
boundary and carry the gradient signal).

Same execution shape as the brute-force ANN baseline
(plans/similarity.py:q_cosine_topk): the bounded query set is
broadcast against the corpus, the cosine is the established
quantized-integer dot (bit-identical across engines and partition
orders), and per-query top-k goes through a rank window with an id
tie-break. The only addition is the label-inequality predicate on
the broadcast join — it prunes same-class pairs before scoring, so
the comparison volume is |queries| x |corpus| at worst and the
per-query state is k rows. Rows with a NULL label cannot be scored
as negative (unknown class) and are gated out on both sides.

100 TB: |queries| stays fixed by the scaled-mod subset (same
argument as cosine_topk); the scale path would swap the brute-force
scorer for the IVF/LSH candidate join, with this label predicate
applied at the candidate stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from psx_data_pipeline_spark.operators.similarity import (
    _dot,
    dot_sql,
    with_unit_geometry,
)
from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.plans.similarity import (
    _DIM,
    _K,
    _QUERY_MOD,
    _QUERY_MOD_SQL,
    _QUERY_TARGET,
    _VEMB_CTE,
    _indexable,
    _scaled_mod_subset,
)
from psx_data_pipeline_spark.sources.fixtures import load_table

_COS = (
    f"{dot_sql('q.qe', 'c.ce')}"
    f" / (sqrt({dot_sql('q.qe', 'q.qe')}) * sqrt({dot_sql('c.ce', 'c.ce')}))"
)

HARD_NEGATIVES_ORACLE = f"""
WITH {_VEMB_CTE},
q AS (
  SELECT vec_id AS query_id, label AS query_label, embedding AS qe
  FROM vembeddings
  WHERE vec_id % {_QUERY_MOD_SQL} = 0 AND label IS NOT NULL
),
c AS (
  SELECT vec_id AS neighbor_id, label AS neighbor_label, embedding AS ce
  FROM vembeddings WHERE label IS NOT NULL
),
scored AS (
  SELECT q.query_id, q.query_label, c.neighbor_id, c.neighbor_label,
         {_COS} AS cosine
  FROM q CROSS JOIN c
  WHERE q.query_id <> c.neighbor_id AND q.query_label <> c.neighbor_label
)
SELECT query_id, query_label, neighbor_id, neighbor_label, cosine,
       CAST(rank AS INT) AS rank
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {_K}
"""


@query("hard_negatives", HARD_NEGATIVES_ORACLE)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query top-k highest-cosine DIFFERENT-label neighbors
    (module docstring)."""
    emb = _indexable(load_table(spark, "embeddings", sf_dir)).where(
        F.col("label").isNotNull()
    )
    queries = _scaled_mod_subset(emb, _QUERY_MOD, _QUERY_TARGET, 0)
    c = with_unit_geometry(emb, "embedding").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("vecd").alias("cvec"),
        F.col("norm2").alias("cn2"),
    )
    q = with_unit_geometry(queries, "embedding").select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("vecd").alias("qvec"),
        F.col("norm2").alias("qn2"),
    )
    scored = c.join(
        F.broadcast(q),
        (F.col("query_id") != F.col("neighbor_id"))
        & (F.col("query_label") != F.col("neighbor_label")),
    ).withColumn(
        "cosine",
        _dot(F.col("qvec"), F.col("cvec")) / (F.sqrt("qn2") * F.sqrt("cn2")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _K)
        .select(
            "query_id", "query_label", "neighbor_id", "neighbor_label",
            "cosine", "rank",
        )
    )
