"""Bigram language-model scoring: the KenLM-style perplexity filter
(CCNet / RefinedWeb / Gopher all gate pretraining text on an n-gram
LM score; the unigram form is plans/text.py:q_unigram_logprob).

Model: add-one-smoothed bigram probabilities estimated from the
corpus itself — P(w_i | w_{i-1}) = (c(w_{i-1} w_i) + 1) /
(h(w_{i-1}) + V), with h the HISTORY count (number of bigrams whose
left word is w_{i-1}, so the conditional normalizes exactly) and V
the corpus vocabulary size. Per-doc score = Σ over the doc's bigram
occurrences of floor(1000·ln P) — the established milli-integer log
convention, so the per-doc sum is exact BIGINT arithmetic and
order-independent across partitionings/engines. Docs with fewer than
two tokens have no bigrams and are excluded (the length-guard rules
own them).

100 TB shape: bigram extraction is a per-row array expression (one
zip against the 1-shifted token array — no Python, no shuffle);
model estimation is two map-side-combinable counts (bigram table,
history table); scoring is two equi-joins back onto the bigram
stream — the model tables are corpus-derived and stay DISTRIBUTED
(never broadcast; the bigram vocabulary grows with the data), while
V rides as one broadcast scalar row. AQE absorbs the stopword-pair
skew on the join keys. Five shuffles total, all hash-partitioned on
bounded-width keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from psx_data_pipeline_spark.functions.textfns import TOKENS_SQL, tokens
from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_table_parallel

_TOKS = TOKENS_SQL.format("text")

# DuckDB scalar generate_series(1, n) yields [1..n] ([] for n < 1),
# so the bigram list is a pure list expression there too.
BIGRAM_PERPLEXITY_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS ts FROM documents),
big AS (
  SELECT doc_id, unnest(list_transform(
           generate_series(1, len(ts) - 1),
           i -> struct_pack(p := ts[i], c := ts[i + 1]))) AS bg
  FROM toks WHERE len(ts) >= 2
),
pairs AS (SELECT doc_id, bg.p AS p, bg.c AS c FROM big),
cb AS (SELECT p, c, CAST(count(*) AS BIGINT) AS nb FROM pairs GROUP BY p, c),
ch AS (SELECT p, CAST(count(*) AS BIGINT) AS nh FROM pairs GROUP BY p),
v AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
      FROM (SELECT unnest(ts) AS tok FROM toks)),
scored AS (
  SELECT pairs.doc_id,
         CAST(floor(1000 * ln(CAST(cb.nb + 1 AS DOUBLE)
                              / CAST(ch.nh + v.v AS DOUBLE))) AS BIGINT)
           AS lp_milli
  FROM pairs JOIN cb USING (p, c) JOIN ch USING (p) CROSS JOIN v
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(lp_milli) AS BIGINT) AS logprob_milli,
       CAST(sum(lp_milli) // count(*) AS BIGINT) AS avg_lp_milli
FROM scored GROUP BY doc_id
"""


def _bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, p, c) — one row per bigram occurrence, from a pure
    array expression: zip the token array against its 1-shift."""
    ts = tokens("text")
    pairs = F.zip_with(
        F.slice(ts, 1, F.greatest(F.size(ts) - 1, F.lit(0))),
        F.slice(ts, 2, F.greatest(F.size(ts) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("p"), b.alias("c")),
    )
    return (
        docs.where(F.size(ts) >= 2)
        .select("doc_id", F.explode(pairs).alias("bg"))
        .select("doc_id", F.col("bg.p").alias("p"), F.col("bg.c").alias("c"))
    )


@query("bigram_perplexity", BIGRAM_PERPLEXITY_ORACLE)
def q_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document add-one bigram LM log-probability in exact
    milli-integers, plus its per-bigram average (module docstring)."""
    docs = load_table_parallel(spark, "documents", sf_dir)
    pairs = _bigrams(docs)
    cb = pairs.groupBy("p", "c").agg(F.count(F.lit(1)).alias("nb"))
    ch = pairs.groupBy("p").agg(F.count(F.lit(1)).alias("nh"))
    vocab = docs.select(F.explode(tokens("text")).alias("tok")).agg(
        F.countDistinct("tok").alias("v")
    )
    scored = (
        pairs.join(cb, ["p", "c"])
        .join(ch, ["p"])
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.floor(
                F.lit(1000.0)
                * F.log(
                    (F.col("nb") + 1).cast("double")
                    / (F.col("nh") + F.col("v")).cast("double")
                )
            ).cast("long").alias("lp_milli"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("lp_milli").cast("long").alias("logprob_milli"),
        F.expr("sum(lp_milli) div count(1)").cast("long").alias("avg_lp_milli"),
    )


# --- CCNet-style perplexity bucketing ---------------------------------------

# Value-group tertile rule, stated on the DISTINCT-score table so no
# engine ever sorts raw rows: order a source's distinct avg_lp_milli
# DESC (most-probable first), cume = running row count; the whole
# value group lands in the bucket where its cume END sits — head if
# 3·cume <= n, middle if 3·cume <= 2n, else tail. Deterministic under
# ties by construction (a tied score is ONE group).
_BUCKET_CASE = (
    "CASE WHEN 3 * cume <= n THEN 'head' "
    "WHEN 3 * cume <= 2 * n THEN 'middle' ELSE 'tail' END"
)

PERPLEXITY_BUCKETS_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS ts FROM documents),
big AS (
  SELECT doc_id, unnest(list_transform(
           generate_series(1, len(ts) - 1),
           i -> struct_pack(p := ts[i], c := ts[i + 1]))) AS bg
  FROM toks WHERE len(ts) >= 2
),
pairs AS (SELECT doc_id, bg.p AS p, bg.c AS c FROM big),
cb AS (SELECT p, c, CAST(count(*) AS BIGINT) AS nb FROM pairs GROUP BY p, c),
ch AS (SELECT p, CAST(count(*) AS BIGINT) AS nh FROM pairs GROUP BY p),
v AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
      FROM (SELECT unnest(ts) AS tok FROM toks)),
lp AS (
  SELECT pairs.doc_id,
         CAST(floor(1000 * ln(CAST(cb.nb + 1 AS DOUBLE)
                              / CAST(ch.nh + v.v AS DOUBLE))) AS BIGINT)
           AS lp_milli
  FROM pairs JOIN cb USING (p, c) JOIN ch USING (p) CROSS JOIN v
),
doc_scores AS (
  SELECT doc_id, CAST(sum(lp_milli) // count(*) AS BIGINT) AS avg_lp_milli
  FROM lp GROUP BY doc_id
),
sourced AS (
  SELECT d.source, s.avg_lp_milli
  FROM doc_scores s JOIN documents d USING (doc_id)
),
vals AS (
  SELECT source, avg_lp_milli, CAST(count(*) AS BIGINT) AS n_rows
  FROM sourced GROUP BY source, avg_lp_milli
),
cumed AS (
  SELECT source, avg_lp_milli, n_rows,
         CAST(sum(n_rows) OVER (
           PARTITION BY source ORDER BY avg_lp_milli DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cume,
         CAST(sum(n_rows) OVER (PARTITION BY source) AS BIGINT) AS n
  FROM vals
)
SELECT source, {_BUCKET_CASE} AS bucket,
       CAST(sum(n_rows) AS BIGINT) AS n_docs,
       min(avg_lp_milli) AS lo_lp_milli,
       max(avg_lp_milli) AS hi_lp_milli
FROM cumed GROUP BY source, 2
"""


@query("perplexity_buckets", PERPLEXITY_BUCKETS_ORACLE)
def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail split: per source, docs bucketed into
    perplexity tertiles of the bigram LM score (head = most probable
    third). The tertile boundary runs over the DISTINCT-score table —
    per-(source, score) counts, a cume window over distinct values,
    never a row-level sort — then the whole value group takes one
    bucket (rule above). Composes the registered bigram scorer, so
    the LM's cross-engine determinism carries over verbatim."""
    from psx_data_pipeline_spark.sources.fixtures import load_table

    scores = q_bigram_perplexity(spark, sf_dir).select(
        "doc_id", "avg_lp_milli"
    )
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "source")
    vals = (
        scores.join(docs, "doc_id")
        .groupBy("source", "avg_lp_milli")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    w_cume = (
        Window.partitionBy("source")
        .orderBy(F.desc("avg_lp_milli"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("source")
    cumed = vals.select(
        "source", "avg_lp_milli", "n_rows",
        F.sum("n_rows").over(w_cume).cast("long").alias("cume"),
        F.sum("n_rows").over(w_all).cast("long").alias("n"),
    )
    bucket = (
        F.when(3 * F.col("cume") <= F.col("n"), "head")
        .when(3 * F.col("cume") <= 2 * F.col("n"), "middle")
        .otherwise("tail")
    )
    return cumed.groupBy("source", bucket.alias("bucket")).agg(
        F.sum("n_rows").cast("long").alias("n_docs"),
        F.min("avg_lp_milli").alias("lo_lp_milli"),
        F.max("avg_lp_milli").alias("hi_lp_milli"),
    )
