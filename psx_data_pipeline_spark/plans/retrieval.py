"""Keyword retrieval over ``documents`` — BM25 scoring, the ranked
complement of tfidf_top_terms (plans/text.py): tf-idf scores terms
within a document; BM25 ranks documents for a query term with
saturated term frequency and document-length normalization, the
scoring a training-data search/decontamination index actually runs.

Determinism across engines: idf goes through the floor(1000·ln(·))
milli-integer trick (same convention as tfidf/unigram_logprob), and
the BM25 tf-saturation factor — tf / (tf + k1·(1 − b + b·dl/avgdl))
with k1 = 1.2, b = 0.75 — is cleared of floats by quantizing avgdl
to exact integer milli-units A = (1000·L) div N and multiplying
numerator and denominator by 10·A: sat = 10·tf·A / (10·tf·A + 3·A +
9000·dl), an exact integer rational both engines floor identically.

Int64-overflow posture (review finding, round 5): the earlier form
multiplied through by the CORPUS token count L, so idf_milli·100·tf·L
left int64 once L approached ~1e12/tf — i.e. the plan would crash
under ANSI arithmetic at exactly the 100 TB scale it advertises. The
A-form's magnitudes are corpus-size-INDEPENDENT: with sat computed as
1000 − ceil(1000·r/den) (r = 3·A + 9000·dl, den = 10·tf·A + r, an
identity — no approximation), the largest intermediate is
10·tf·A = 1e4·tf·avgdl, inside int64 for tf·avgdl ≤ 9.2e14 (e.g.
avgdl 10⁴ tokens → tf up to ~9e10; any real document), at ANY corpus
size. score_milli = (idf_milli · sat_permille) div 1000 then caps at
idf_milli ≤ 1000·ln(2(N+1)) ≈ 3e4 even at a trillion documents.
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
WITH d AS (SELECT row_number() OVER () AS rid, doc_id,
           {_TOKS} AS toks FROM documents),
n AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(COALESCE(sum(len(toks)), 0) AS BIGINT) AS l,
         CAST(CASE WHEN count(*) = 0 THEN 0
              ELSE (1000 * COALESCE(sum(len(toks)), 0)) // count(*)
              END AS BIGINT) AS a
  FROM d
),
dl AS (SELECT rid, CAST(len(toks) AS BIGINT) AS dl FROM d),
toks AS (
  SELECT rid, doc_id, unnest(toks) AS term FROM d
),
tf AS (
  SELECT rid, doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks WHERE term IN ({_TERMS_SQL}) GROUP BY rid, doc_id, term
),
df AS (
  SELECT term, CAST(count(DISTINCT rid) AS BIGINT) AS df
  FROM toks WHERE term IN ({_TERMS_SQL}) GROUP BY term
),
scored AS (
  SELECT term, doc_id, tf,
    CAST((idf_milli * (1000 - (1000 * r + den - 1) // den)) // 1000
         AS BIGINT) AS score_milli
  FROM (
    SELECT tf.term, tf.doc_id, tf.tf,
      CAST(floor(1000 * ln(
        CAST(2 * (n.n + 1) AS DOUBLE) / (2 * df.df + 1))) AS BIGINT
      ) AS idf_milli,
      3 * n.a + 9000 * dl.dl AS r,
      10 * tf.tf * n.a + 3 * n.a + 9000 * dl.dl AS den
    FROM tf JOIN df USING (term) JOIN dl USING (rid) CROSS JOIN n
  )
)
SELECT term, doc_id, tf, score_milli, CAST(rk AS INT) AS rk FROM (
  SELECT *, row_number() OVER (
    PARTITION BY term
    ORDER BY score_milli DESC, doc_id NULLS LAST, tf) AS rk
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
    # rid = unique-per-row grouping identity (its VALUE never reaches
    # the output, so monotonically_increasing_id's partition-order
    # dependence is irrelevant): without it, a duplicate-id twin's tf
    # merged through the (doc_id, dl) key and the dl join fanned out
    # (round-11 hostile-id class)
    d = docs.select(
        F.monotonically_increasing_id().alias("rid"),
        "doc_id",
        F.size(tokens("text")).cast("long").alias("dl"),
        tokens("text").alias("toks"),
    )
    n_row = d.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("l")
    ).first()  # scalar job: two corpus constants, inlined as literals
    n_docs = int(n_row["n"])
    total_l = int(n_row["l"]) if n_row["l"] is not None else 0
    # avgdl in exact integer milli-units — the ONLY corpus-scale
    # quantity the score arithmetic sees (see module docstring for
    # the int64 bound this buys); Python // floors like DuckDB //
    avgdl_milli = (1000 * total_l) // n_docs if n_docs else 0

    tf = (
        # explode-then-filter stays inside one whole-stage-codegen
        # span (a higher-order filter() on the array would run as an
        # interpreted lambda — measured 3× slower at 10×); the WHERE
        # still applies before the exchange, so only matching
        # occurrences are ever shuffled
        d.select("rid", "doc_id", "dl", F.explode("toks").alias("term"))
        .where(F.col("term").isin(*_BM25_TERMS))
        .groupBy("term", "rid", "doc_id", "dl")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    w_term = Window.partitionBy("term")
    # asc_nulls_last + tf tiebreak: DuckDB sorts NULL ids last, and
    # twin rows can tie on (score, doc_id) with different tf
    w_rank = w_term.orderBy(
        F.desc("score_milli"), F.asc_nulls_last("doc_id"), F.asc("tf"))
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
        # sat_permille = floor(1000·10·tf·A / den) computed as
        # 1000 − ceil(1000·r/den) (exact identity, num = den − r) so
        # the largest intermediate is den = 10·tf·A + r, not 1000×it
        F.expr(
            f"(idf_milli * (1000 - "
            f"((1000 * (3 * {avgdl_milli}L + 9000 * dl)"
            f"  + (10 * tf * {avgdl_milli}L + 3 * {avgdl_milli}L"
            f"     + 9000 * dl) - 1)"
            f" div (10 * tf * {avgdl_milli}L + 3 * {avgdl_milli}L"
            f"      + 9000 * dl)))) div 1000"
        ).cast("long"),
    )
    return (
        scored.withColumn("rk", F.row_number().over(w_rank).cast("int"))
        .where(F.col("rk") <= _BM25_K)
        .select("term", "doc_id", "tf", "score_milli", "rk")
    )


# --- hybrid retrieval: reciprocal-rank fusion --------------------------------

# Retrieve-then-rerank, the production shape: BM25 retrieves a
# bounded candidate set per query term; a second signal (here a
# document-quality prior — non-alpha density, the text_quality
# feature) re-ranks the SAME candidates; reciprocal-rank fusion
# combines the two rankings. RRF works on ranks, not scores, so the
# fused value is exactly integer: floor(1e6/(60+rank)) per system,
# summed — no float score normalization to diverge across engines.

_RRF_K = 60         # the standard RRF dampening constant
_RRF_TOP = 10       # fused results kept per query term

RRF_FUSION_ORACLE = f"""
WITH bm AS ({BM25_ORACLE}),
cand AS (SELECT DISTINCT doc_id FROM bm),
prior AS (
  SELECT d.doc_id,
         CAST(1000 * length(regexp_replace(d.text, '[a-z]', '', 'g'))
              // length(d.text) AS BIGINT) AS nonalpha_milli
  FROM documents d JOIN cand USING (doc_id)
),
rr AS (
  SELECT bm.term, bm.doc_id, bm.rk AS rk_bm25,
         CAST(row_number() OVER (
           PARTITION BY bm.term
           ORDER BY p.nonalpha_milli ASC, bm.doc_id) AS INT) AS rk_prior
  FROM bm JOIN prior p USING (doc_id)
),
fused AS (
  SELECT term, doc_id, rk_bm25, rk_prior,
         CAST(1000000 // ({_RRF_K} + rk_bm25)
              + 1000000 // ({_RRF_K} + rk_prior) AS BIGINT) AS rrf_micro
  FROM rr
)
SELECT term, doc_id, rk_bm25, rk_prior, rrf_micro,
       CAST(rk AS INT) AS rk_fused
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY term ORDER BY rrf_micro DESC, doc_id) AS rk
  FROM fused
) WHERE rk <= {_RRF_TOP}
"""


@query("rrf_fusion", RRF_FUSION_ORACLE)
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_RRF_TOP} documents per query term under reciprocal-rank
    fusion of the BM25 ranking and a quality-prior ranking (non-alpha
    density ascending — cleaner documents first), fused as
    floor(1e6/({_RRF_K}+rank)) sums.

    Scale shape: the candidate set is the BM25 top-{_BM25_K} per term
    — bounded by |terms|·k at any corpus size — so everything after
    retrieval operates on a kilobyte-scale table. The quality prior
    needs document text, fetched by broadcasting the candidate ids
    against the corpus scan (broadcast hash join; the corpus is never
    shuffled), and the prior result — again candidate-bounded — is
    broadcast back onto the ranking. Both re-rank windows partition
    by term over ≤k rows; no global sort anywhere. length(text) ≥ 1
    is guaranteed for candidates (tf ≥ 1 ⇒ non-empty text), so the
    milli ratio needs no zero guard."""
    bm = q_bm25_scores(spark, sf_dir).select("term", "doc_id", "rk")
    cand = bm.select("doc_id").distinct()
    docs = load_table_parallel(spark, "documents", sf_dir)
    prior = docs.join(F.broadcast(cand), "doc_id").select(
        "doc_id",
        F.expr(
            "1000 * length(regexp_replace(text, '[a-z]', ''))"
            " div length(text)"
        ).cast("long").alias("nonalpha_milli"),
    )
    w_prior = Window.partitionBy("term").orderBy(
        F.asc("nonalpha_milli"), F.asc("doc_id")
    )
    rr = (
        bm.withColumnRenamed("rk", "rk_bm25")
        .join(F.broadcast(prior), "doc_id")
        .withColumn("rk_prior", F.row_number().over(w_prior).cast("int"))
    )
    fused = rr.withColumn(
        "rrf_micro",
        F.expr(
            f"1000000 div ({_RRF_K} + rk_bm25)"
            f" + 1000000 div ({_RRF_K} + rk_prior)"
        ).cast("long"),
    )
    w_fused = Window.partitionBy("term").orderBy(
        F.desc("rrf_micro"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rk_fused", F.row_number().over(w_fused).cast("int"))
        .where(F.col("rk_fused") <= _RRF_TOP)
        .select(
            "term", "doc_id", "rk_bm25", "rk_prior", "rrf_micro", "rk_fused"
        )
    )


# --- retrieval quality evaluation ---------------------------------------------

# Acceptance metrics for the BM25 ranking against a deterministic
# relevance oracle: a document is "relevant" to a term when the term
# occurs at least _REL_TF times (a high-tf proxy — label-free, so
# both engines derive the identical judgment set). MRR and precision
# are rank arithmetic, exact in integer micro/milli units; recall
# needs the CORPUS-WIDE relevant count — one more tf aggregate of the
# same filtered-explode shape, never a sort.
_REL_TF = 2
_PREC_AT = 5

RETRIEVAL_EVAL_ORACLE = f"""
WITH bm AS ({BM25_ORACLE}),
rel AS (
  SELECT term, doc_id
  FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
  WHERE term IN ({_TERMS_SQL})
  GROUP BY term, doc_id HAVING count(*) >= {_REL_TF}
),
rel_total AS (
  SELECT term, CAST(count(*) AS BIGINT) AS n_relevant
  FROM rel GROUP BY term
),
topk AS (
  SELECT term, rk, CASE WHEN tf >= {_REL_TF} THEN 1 ELSE 0 END AS is_rel
  FROM bm
),
metrics AS (
  SELECT term,
         CAST(count(*) AS BIGINT) AS n_topk,
         CAST(sum(is_rel) AS BIGINT) AS rel_in_topk,
         min(CASE WHEN is_rel = 1 THEN rk END) AS frr,
         CAST(sum(CASE WHEN is_rel = 1 AND rk <= {_PREC_AT}
                  THEN 1 ELSE 0 END) AS BIGINT) AS rel_at_p
  FROM topk GROUP BY term
)
SELECT m.term, m.n_topk, COALESCE(t.n_relevant, 0) AS n_relevant,
       CAST(COALESCE(m.frr, 0) AS BIGINT) AS first_rel_rank,
       CAST(CASE WHEN m.frr IS NULL THEN 0
            ELSE 1000000 // m.frr END AS BIGINT) AS mrr_micro,
       CAST(m.rel_at_p * 1000 // {_PREC_AT} AS BIGINT) AS prec{_PREC_AT}_milli,
       CAST(CASE WHEN COALESCE(t.n_relevant, 0) = 0 THEN 0
            ELSE m.rel_in_topk * 1000 // t.n_relevant END AS BIGINT)
         AS recall_milli
FROM metrics m LEFT JOIN rel_total t ON m.term = t.term
"""


@query("retrieval_eval", RETRIEVAL_EVAL_ORACLE)
def q_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per query term: MRR (reciprocal rank of the first relevant
    document, micro-units), precision@{_PREC_AT} and recall@k of the
    BM25 top-{_BM25_K} under the tf >= {_REL_TF} relevance proxy —
    the acceptance row a retrieval change must not regress (the
    ann_recall pattern applied to the lexical index).

    Shape: the ranking is the bm25 plan; the judgment set is one more
    filtered-explode tf aggregate (only query-term occurrences ever
    shuffle); metrics aggregate |terms| * k rows. first_rel_rank is 0
    when no relevant document made top-k (and MRR/recall score 0)."""
    bm = q_bm25_scores(spark, sf_dir)
    docs = load_table_parallel(spark, "documents", sf_dir)
    rel = (
        docs.select("doc_id", F.explode(tokens("text")).alias("term"))
        .where(F.col("term").isin(*_BM25_TERMS))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf_all"))
        .where(F.col("tf_all") >= _REL_TF)
    )
    rel_total = rel.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("n_relevant")
    )
    metrics = bm.select(
        "term", "rk",
        F.when(F.col("tf") >= _REL_TF, 1).otherwise(0).alias("is_rel"),
    ).groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("n_topk"),
        F.sum("is_rel").cast("long").alias("rel_in_topk"),
        F.min(F.when(F.col("is_rel") == 1, F.col("rk"))).alias("frr"),
        F.sum(
            F.when((F.col("is_rel") == 1) & (F.col("rk") <= _PREC_AT), 1)
            .otherwise(0)
        ).cast("long").alias("rel_at_p"),
    )
    return metrics.join(F.broadcast(rel_total), "term", "left").select(
        "term", "n_topk",
        F.coalesce("n_relevant", F.lit(0)).cast("long").alias("n_relevant"),
        F.coalesce("frr", F.lit(0)).cast("long").alias("first_rel_rank"),
        F.when(F.col("frr").isNull(), 0)
        .otherwise(F.expr("1000000 div frr"))
        .cast("long").alias("mrr_micro"),
        F.expr(f"rel_at_p * 1000 div {_PREC_AT}")
        .cast("long").alias(f"prec{_PREC_AT}_milli"),
        F.when(F.coalesce("n_relevant", F.lit(0)) == 0, 0)
        .otherwise(F.expr("rel_in_topk * 1000 div n_relevant"))
        .cast("long").alias("recall_milli"),
    )
