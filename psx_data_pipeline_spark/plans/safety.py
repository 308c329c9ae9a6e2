"""Safety / content filtering: multi-pattern blocklist scan.

The filter pass every training corpus goes through before anything
else: a curated list of banned phrases is matched against every
document, and the pipeline records WHICH patterns hit, HOW OFTEN,
and whether the document survives the policy — the audit trail a
data-governance review asks for, not just a boolean drop. The
reference's keyword→category classifier (SURVEY §2 F8,
`keyword_classify`) is the single-label cousin; this is the
per-pattern-count generalization used for policy filtering.

Matching is LITERAL (no regex engine in the hot path): occurrence
count = (len(text) - len(replace(text, p, ''))) / len(p) — three
string ops per (doc, pattern), identical semantics in both engines
(length() counts codepoints in both; patterns are ASCII literals by
contract — case-sensitive, the blocklist is pre-normalized). At
cluster scale the pattern list is a BROADCAST constant and the scan
stays embarrassingly parallel: no shuffle at all until the final
per-doc aggregate, which is an explode bounded by |blocklist| — a
constant — per row.

Policy: a document is dropped when any single pattern occurs more
than _MAX_OCC times or when distinct patterns hit more than
_MAX_PATTERNS — thresholded rather than zero-tolerance, the shape
real spam/safety filters use (single stray occurrences of common
phrases are noise at corpus scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_table

# ASCII, lowercase, pre-normalized — drawn from the fixture corpus
# vocabulary so the audit exercises real hits (single words AND a
# multi-word phrase; 'zzz unseen' pins the zero-hit path)
_BLOCKLIST = [
    "slow", "big table", "scan scan", "spark", "zzz unseen",
]
_MAX_OCC = 3        # any one pattern more often than this → drop
_MAX_PATTERNS = 3   # more distinct patterns than this → drop

_PATTERNS_SQL = "(VALUES " + ", ".join(
    f"('{p}')" for p in _BLOCKLIST
) + ") AS pat(p)"

# occurrences of literal p in text, codepoint arithmetic — exact in
# both engines for ASCII patterns over arbitrary text
_OCC = "(length(text) - length(replace(text, p, ''))) / length(p)"

BLOCKLIST_ORACLE = f"""
WITH d AS (
  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
),
hits AS (
  SELECT doc_id, p, CAST({_OCC} AS BIGINT) AS occ
  FROM d, {_PATTERNS_SQL}
),
agg AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN occ > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_patterns,
         CAST(sum(occ) AS BIGINT) AS n_occurrences,
         max(occ) AS max_occ
  FROM hits GROUP BY doc_id
),
worst AS (
  SELECT doc_id, min(p) AS worst_pattern
  FROM hits h
  WHERE occ > 0
    AND occ = (SELECT max(occ) FROM hits h2 WHERE h2.doc_id = h.doc_id)
  GROUP BY doc_id
)
SELECT a.doc_id, a.n_patterns, a.n_occurrences,
       w.worst_pattern,
       (a.max_occ > {_MAX_OCC} OR a.n_patterns > {_MAX_PATTERNS})
         AS dropped
FROM agg a LEFT JOIN worst w ON w.doc_id = a.doc_id
"""


def blocklist_hits(docs: DataFrame) -> DataFrame:
    """(doc_id, pattern, occurrence count) — |blocklist| rows per doc
    via a literal-array explode; no shuffle, no Python."""
    pats = F.array(*[F.lit(p) for p in _BLOCKLIST])
    return (
        docs.where(F.col("text").isNotNull())
        .select("doc_id", "text", F.explode(pats).alias("p"))
        .select(
            "doc_id", "p",
            F.expr(f"CAST({_OCC} AS BIGINT)").alias("occ"),
        )
    )


@query("blocklist_scan", BLOCKLIST_ORACLE)
def q_blocklist_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document blocklist audit: pattern hit counts, the worst
    pattern (max occurrences, ties lexicographic), and the threshold
    policy verdict (module docstring)."""
    hits = blocklist_hits(load_table(spark, "documents", sf_dir))
    agg = hits.groupBy("doc_id").agg(
        F.sum(F.when(F.col("occ") > 0, 1).otherwise(0)).cast("long")
        .alias("n_patterns"),
        F.sum("occ").cast("long").alias("n_occurrences"),
        F.max("occ").alias("max_occ"),
        # worst pattern in ONE aggregate: lexicographic min among the
        # patterns tied at the max count — encoded as min over a
        # (neg-occ, p) struct so no second pass / self-join is needed
        F.min(
            F.when(
                F.col("occ") > 0,
                F.struct((-F.col("occ")).alias("no"), F.col("p").alias("p")),
            )
        ).getField("p").alias("worst_pattern"),
    )
    return agg.select(
        "doc_id", "n_patterns", "n_occurrences", "worst_pattern",
        (
            (F.col("max_occ") > _MAX_OCC)
            | (F.col("n_patterns") > _MAX_PATTERNS)
        ).alias("dropped"),
    )
