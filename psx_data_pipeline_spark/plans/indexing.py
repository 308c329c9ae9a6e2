"""Inverted-index construction: block-structured, gap-encoded
posting lists — the retrieval-serving artifact a corpus pipeline
publishes next to the documents (BM25 in plans/retrieval.py SCORES
queries against terms; this materializes the index itself, in the
block-max layout Lucene/WAND-style engines consume: fixed-size
blocks per term, per-block doc-id gaps + skip metadata).

Term admission: 2 <= df <= _DF_CAP. Hapax terms cannot match more
than their own document (they live in the doc's own fingerprint);
stopword-scale terms belong to the impact-ordered BM25 path, not a
doc-at-a-time lookup index — and the cap is what BOUNDS the per-term
sort below: no posting list longer than _DF_CAP rows ever sorts in
one place, so the hottest term in a 100 TB corpus costs the same as
a medium one. (The same cap idea ships in real engines as stopword
elision / impact separation.)

100 TB shape: doc-term tf aggregation (map-side combined), df filter
on a bounded-key aggregate, per-term row_number window whose
partitions are <= _DF_CAP rows by construction, then one grouped
sort_array per (term, block) — blocks are <= _BLOCK docs, the
output unit is skip-pointer-sized, and everything shuffles on the
term key exactly once after the tf table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from psx_data_pipeline_spark.functions.textfns import TOKENS_SQL, tokens
from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_table_parallel

_TOKS = TOKENS_SQL.format("text")
_DF_CAP = 1000
_BLOCK = 128

INVERTED_INDEX_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
  WHERE doc_id IS NOT NULL
),
tf AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY term, doc_id
),
df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
),
kept AS (
  SELECT tf.term, tf.doc_id, tf.tf,
         CAST(row_number() OVER (
           PARTITION BY tf.term ORDER BY tf.doc_id) AS BIGINT) AS rn
  FROM tf JOIN df USING (term)
  WHERE df.df BETWEEN 2 AND {_DF_CAP}
),
blocks AS (
  SELECT term, (rn - 1) // {_BLOCK} AS block_idx,
         list(doc_id ORDER BY doc_id) AS docs,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(max(tf) AS BIGINT) AS max_tf
  FROM kept GROUP BY term, 2
)
SELECT term, CAST(block_idx AS BIGINT) AS block_idx, n_docs,
       docs[1] AS first_doc_id, docs[n_docs] AS last_doc_id, max_tf,
       coalesce(array_to_string(
         list_transform(generate_series(1, CAST(n_docs AS INT)),
           i -> docs[i] - coalesce(docs[i - 1], 0)), ','), '') AS gaps
FROM blocks
"""


@query("inverted_index", INVERTED_INDEX_ORACLE)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-max posting lists: per (term, 128-doc block), the sorted
    doc-id gap array plus the skip metadata (first/last doc, block
    max tf) — module docstring covers the df admission band and the
    scale argument."""
    docs = load_table_parallel(spark, "documents", sf_dir).where(
        F.col("doc_id").isNotNull()
    )
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = tok.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    kept = (
        tf.join(df.where(F.col("df").between(2, _DF_CAP)), "term")
        .withColumn(
            "rn",
            F.row_number()
            .over(Window.partitionBy("term").orderBy("doc_id"))
            .cast("long"),
        )
    )
    blocks = (
        kept.withColumn("block_idx", F.expr(f"(rn - 1) div {_BLOCK}"))
        .groupBy("term", "block_idx")
        .agg(
            F.sort_array(F.collect_list("doc_id")).alias("docs"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.max("tf").cast("long").alias("max_tf"),
        )
    )
    shifted = F.concat(
        F.array(F.lit(0).cast("long")),
        F.slice(
            F.col("docs"), 1, F.greatest(F.size("docs") - 1, F.lit(0))
        ),
    )
    return blocks.select(
        "term",
        F.col("block_idx").cast("long").alias("block_idx"),
        "n_docs",
        F.element_at("docs", 1).alias("first_doc_id"),
        F.element_at("docs", -1).alias("last_doc_id"),
        "max_tf",
        # serialized gap list, not ArrayType: the driver's pandas
        # canonicalizer cannot hash list cells, so the posting-list
        # payload ships as the comma-joined string a skip-block codec
        # would parse back (empty-array NULL-vs-'' divergence is moot
        # here — every block holds >= 1 doc — but concat_ws's '' is
        # the Spark side of the coalesced DuckDB array_to_string)
        F.concat_ws(
            ",",
            F.transform(
                F.zip_with(F.col("docs"), shifted, lambda a, b: a - b),
                lambda g: g.cast("string"),
            ),
        ).alias("gaps"),
    )
