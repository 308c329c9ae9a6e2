"""PII pattern census: the release-gate scan that counts (never
extracts) personally-identifying patterns per source before a corpus
ships — emails, phone-shaped numbers, IPv4 literals. Complements the
literal-term blocklist (plans/safety.py) with the REGEX leg of the
safety suite: patterns a literal replace cannot express.

The fixture corpus is deliberately PII-free, so the scan enriches it
deterministically from doc_id (the cdc_log-from-customer precedent in
plans/lakehouse.py): every doc_id divisible by 3 gains an email, by 5
a phone, by 7 an IPv4 — giving every pattern real, unevenly
distributed hits (including the zero-hit and the all-three paths at
the lcm residues) while staying a pure function of fixture data.

Cross-engine contract: patterns are shared literal strings using only
the regex subset Java and RE2 agree on (ASCII classes, bounded
repetition, \\b word boundaries, no backrefs/lookaround); counting is
non-overlapping left-to-right in both engines (Spark regexp_count vs
DuckDB len(regexp_extract_all)).

100 TB shape: the whole scan is scan-side whole-stage codegen (three
regexp_counts per row, zero joins, zero Python) followed by ONE
map-side-combinable per-source aggregate bounded by |sources|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_table

# shared Java/RE2-compatible literals (no quotes, no backslash-types
# beyond \b which both engines treat as ASCII word boundary)
_P_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
_P_PHONE = "555-[0-9][0-9][0-9][0-9]"
_P_IPV4 = (
    "[0-9][0-9]?[0-9]?[.][0-9][0-9]?[0-9]?[.]"
    "[0-9][0-9]?[0-9]?[.][0-9][0-9]?[0-9]?"
)

# VARCHAR(n) (not bare VARCHAR) parses in BOTH engines, and explicit
# string casts keep ANSI-mode Spark from rejecting mixed-type concat
_ENRICH_SQL = """
concat(
  COALESCE(text, ''),
  CASE WHEN doc_id % 3 = 0
       THEN concat(' contact user', CAST(doc_id AS VARCHAR(24)),
                   '@mail.example.com') ELSE '' END,
  CASE WHEN doc_id % 5 = 0
       THEN concat(' call 555-',
                   lpad(CAST(doc_id % 10000 AS VARCHAR(8)), 4, '0'))
       ELSE '' END,
  CASE WHEN doc_id % 7 = 0
       THEN concat(' host 10.', CAST(doc_id % 256 AS VARCHAR(8)),
                   '.0.', CAST(doc_id % 100 AS VARCHAR(8))) ELSE '' END
)
"""

PII_SCAN_ORACLE = f"""
WITH enriched AS (
  SELECT source, {_ENRICH_SQL} AS body FROM documents
),
counted AS (
  SELECT source,
         len(regexp_extract_all(body, '{_P_EMAIL}')) AS n_email,
         len(regexp_extract_all(body, '{_P_PHONE}')) AS n_phone,
         len(regexp_extract_all(body, '{_P_IPV4}')) AS n_ipv4
  FROM enriched
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n_email + n_phone + n_ipv4 > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS docs_with_pii,
       CAST(sum(n_email) AS BIGINT) AS emails,
       CAST(sum(n_phone) AS BIGINT) AS phones,
       CAST(sum(n_ipv4) AS BIGINT) AS ipv4s
FROM counted GROUP BY source
"""


def pii_counts(docs: DataFrame) -> DataFrame:
    """(source, n_email, n_phone, n_ipv4) per document — the shared
    scan-side projection. Batch and streaming MUST build on this one
    helper (and pii_census below): they share one oracle, so a
    drifted copy would silently break batch/stream agreement."""
    body = F.expr(_ENRICH_SQL)
    return docs.select(
        "source",
        F.regexp_count(body, F.lit(_P_EMAIL)).alias("n_email"),
        F.regexp_count(body, F.lit(_P_PHONE)).alias("n_phone"),
        F.regexp_count(body, F.lit(_P_IPV4)).alias("n_ipv4"),
    )


def pii_census(counted: DataFrame) -> DataFrame:
    """The per-source rollup over pii_counts() rows (bounded by
    |sources|; map-side combinable, batch and streaming alike)."""
    return counted.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            F.when(
                F.col("n_email") + F.col("n_phone") + F.col("n_ipv4") > 0, 1
            ).otherwise(0)
        ).cast("long").alias("docs_with_pii"),
        F.sum("n_email").cast("long").alias("emails"),
        F.sum("n_phone").cast("long").alias("phones"),
        F.sum("n_ipv4").cast("long").alias("ipv4s"),
    )


@query("pii_scan", PII_SCAN_ORACLE)
def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII census over the deterministically enriched
    corpus: document count, documents with any hit, and per-pattern
    totals (module docstring). concat() is NULL-total via the
    COALESCE, so NULL-text docs still count in n_docs with zero
    natural hits."""
    return pii_census(pii_counts(load_table(spark, "documents", sf_dir)))
