"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
MOSS algorithm): guaranteed-coverage local fingerprinting — from
every window of w consecutive k-gram hashes, keep the minimum; any
shared substring of length >= w+k-1 tokens is then guaranteed to
share a fingerprint, with ~2/(w+1) selection density. This is the
robust complement to the repo's positional rolling-hash fingerprint
(plans/text.py doc_fingerprint): winnowed prints survive local edits
because selection is content-anchored, not position-anchored.

100 TB shape: entirely per-document array expressions — token
k-grams, md5 hashes, per-window minima — no shuffle at all until the
final projection; cost is O(tokens · w) per doc with w = 4 constant.
Array indexing (element_at / l[i]) is O(1) on both engines' array
representations (unlike UTF-8 string offsets, see the doc_chunks
O(len²) finding this deliberately avoids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psx_data_pipeline_spark.functions.hashing import HASH_P, md5_long_sql
from psx_data_pipeline_spark.functions.textfns import TOKENS_SQL, tokens
from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_table_parallel

_TOKS = TOKENS_SQL.format("text")
_K = 3   # tokens per gram
_W = 4   # grams per winnowing window

_GRAM_SQL = md5_long_sql("ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2]")

WINNOWING_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS ts FROM documents
  WHERE doc_id IS NOT NULL AND len({_TOKS}) >= {_K}
),
hashed AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(ts) - {_K - 1}),
           i -> ({_GRAM_SQL}) % {HASH_P}) AS hs
  FROM toks
),
winnowed AS (
  SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_grams,
         list_sort(list_distinct(list_transform(
           generate_series(1, greatest(len(hs) - {_W - 1}, 1)),
           j -> list_min(hs[j:j + {_W - 1}])))) AS fingerprints
  FROM hashed
)
SELECT doc_id, n_grams,
       CAST(len(fingerprints) AS BIGINT) AS n_fingerprints,
       coalesce(array_to_string(fingerprints, ','), '') AS fingerprints
FROM winnowed
"""


@query("winnowing_fingerprints", WINNOWING_ORACLE)
def q_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document winnowed fingerprint set: k=3-token gram hashes,
    min per w=4 window, sorted distinct selection (module docstring).
    Docs with fewer than k tokens have no grams and are excluded
    (the length-guard rules own them); k <= grams < w docs winnow to
    the single whole-list minimum — the standard short-doc case."""
    docs = load_table_parallel(spark, "documents", sf_dir).where(
        F.col("doc_id").isNotNull()
    )
    ts = tokens("text")
    docs = docs.where(F.size(ts) >= _K).select(
        "doc_id", ts.alias("ts")
    )
    gram = F.transform(
        F.sequence(F.lit(1), F.size("ts") - (_K - 1)),
        lambda i: (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            " ",
                            F.element_at("ts", i.cast("int")),
                            F.element_at("ts", (i + 1).cast("int")),
                            F.element_at("ts", (i + 2).cast("int")),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % HASH_P
        ),
    )
    hashed = docs.select("doc_id", gram.alias("hs"))
    mins = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.size("hs") - (_W - 1), F.lit(1))
        ),
        lambda j: F.array_min(F.slice("hs", j.cast("int"), _W)),
    )
    winnowed = hashed.select(
        "doc_id",
        F.size("hs").cast("long").alias("n_grams"),
        F.array_sort(F.array_distinct(mins)).alias("fingerprints"),
    )
    return winnowed.select(
        "doc_id", "n_grams",
        F.size("fingerprints").cast("long").alias("n_fingerprints"),
        # serialized, not ArrayType: the driver's pandas canonicalizer
        # cannot hash list cells; >= 1 fingerprint always exists (the
        # size >= k filter guarantees >= 1 gram) so the coalesced
        # DuckDB empty-array NULL never fires, but both sides agree
        F.concat_ws(
            ",",
            F.transform("fingerprints", lambda x: x.cast("string")),
        ).alias("fingerprints"),
    )
