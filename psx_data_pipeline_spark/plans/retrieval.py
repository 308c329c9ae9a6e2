"""Keyword retrieval over ``documents`` — BM25 scoring, the ranked
complement of tfidf_top_terms (plans/text.py): tf-idf scores terms
within a document; BM25 ranks documents for a query term with
saturated term frequency and document-length normalization, the
scoring a training-data search/decontamination index actually runs.

Determinism across engines: idf goes through the floor(1000·ln(·))
milli-integer trick (same convention as tfidf/unigram_logprob), and
the BM25 tf-saturation factor — tf / (tf + k1·(1 − b + b·dl/avgdl))
with k1 = 1.2, b = 0.75 — is cleared of floats entirely by
multiplying numerator and denominator by 100·L (L = corpus token
count, avgdl = L/N): it becomes 100·tf·L / (100·tf·L + 30·L +
90·dl·N), an exact integer rational, so score_milli =
(idf_milli · 100·tf·L) div (…) is integer arithmetic both engines
floor identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from psx_data_pipeline_spark.functions.textfns import TOKENS_SQL, tokens
from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_table_parallel

_TOKS = TOKENS_SQL.format("text")

_BM25_TERMS = ("spark", "vector", "merge", "window")
_BM25_K = 20  # top documents per query term

_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)

BM25_ORACLE = f"""
WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
n AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(len(toks)) AS BIGINT) AS l
  FROM d
),
dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM d),
toks AS (
  SELECT doc_id, unnest(toks) AS term FROM d
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks WHERE term IN ({_TERMS_SQL}) GROUP BY doc_id, term
),
df AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM toks WHERE term IN ({_TERMS_SQL}) GROUP BY term
),
scored AS (
  SELECT tf.term, tf.doc_id, tf.tf,
    CAST(
      (CAST(floor(1000 * ln(
         CAST(2 * (n.n + 1) AS DOUBLE) / (2 * df.df + 1))) AS BIGINT)
       * (100 * tf.tf * n.l))
      // (100 * tf.tf * n.l + 30 * n.l + 90 * dl.dl * n.n)
    AS BIGINT) AS score_milli
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN n
)
SELECT term, doc_id, tf, score_milli, CAST(rk AS INT) AS rk FROM (
  SELECT *, row_number() OVER (
    PARTITION BY term ORDER BY score_milli DESC, doc_id) AS rk
  FROM scored
) WHERE rk <= {_BM25_K}
"""


@query("bm25_scores", BM25_ORACLE)
def q_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_BM25_K} documents per query term under BM25
    (k1 = 1.2, b = 0.75).

    Scale shape: the token array is filtered to the query terms
    INSIDE the scan projection (higher-order `filter`, JVM-side), so
    only matching occurrences ever explode — the full token stream is
    never shuffled. The doc length rides the tf groupBy as a
    functionally-dependent key, so no doc_id join back to a lengths
    table exists. df (docs containing the term) equals the tf row
    count per term, computed as a window count over the SAME term
    partitioning the top-k ranking needs — one exchange serves both.
    Whole pipeline: scalar N/L job + two shuffles (tf groupBy, term
    window); top-k per term is a window over |terms| partitions of
    candidate rows, not a global sort."""
    docs = load_table_parallel(spark, "documents", sf_dir)
    d = docs.select(
        "doc_id",
        F.size(tokens("text")).cast("long").alias("dl"),
        tokens("text").alias("toks"),
    )
    n_row = d.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("l")
    ).first()  # scalar job: two corpus constants, inlined as literals
    n_docs, total_l = int(n_row["n"]), int(n_row["l"])

    tf = (
        # explode-then-filter stays inside one whole-stage-codegen
        # span (a higher-order filter() on the array would run as an
        # interpreted lambda — measured 3× slower at 10×); the WHERE
        # still applies before the exchange, so only matching
        # occurrences are ever shuffled
        d.select("doc_id", "dl", F.explode("toks").alias("term"))
        .where(F.col("term").isin(*_BM25_TERMS))
        .groupBy("term", "doc_id", "dl")  # dl is key-determined: free
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    w_term = Window.partitionBy("term")
    w_rank = w_term.orderBy(F.desc("score_milli"), F.asc("doc_id"))
    scored = tf.withColumns({
        "df": F.count(F.lit(1)).over(w_term).cast("long"),
    }).withColumn(
        "idf_milli",
        F.floor(
            F.lit(1000.0)
            * F.log(F.lit(float(2 * (n_docs + 1))) / (2 * F.col("df") + 1))
        ).cast("long"),
    ).withColumn(
        "score_milli",
        F.expr(
            f"(idf_milli * (100 * tf * {total_l}L)) div "
            f"(100 * tf * {total_l}L + 30 * {total_l}L"
            f" + 90 * dl * {n_docs}L)"
        ).cast("long"),
    )
    return (
        scored.withColumn("rk", F.row_number().over(w_rank).cast("int"))
        .where(F.col("rk") <= _BM25_K)
        .select("term", "doc_id", "tf", "score_milli", "rk")
    )
