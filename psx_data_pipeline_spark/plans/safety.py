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

# every rollup keys on a synthetic PER-ROW id: the audit is a
# per-document-ROW content check (the streaming twin proves it — a
# stateless filter-on-ingest has no way to group by doc_id), and
# doc_id-keyed grouping silently merged duplicate-id twins and
# dropped the NULL-id row at the equi-joins (round-11 hostile-id
# probe)
BLOCKLIST_ORACLE = f"""
WITH d AS (
  SELECT row_number() OVER () AS rid, doc_id, text
  FROM documents WHERE text IS NOT NULL
),
hits AS (
  SELECT rid, doc_id, p, CAST({_OCC} AS BIGINT) AS occ
  FROM d, {_PATTERNS_SQL}
),
agg AS (
  SELECT rid, doc_id,
         CAST(sum(CASE WHEN occ > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_patterns,
         CAST(sum(occ) AS BIGINT) AS n_occurrences,
         max(occ) AS max_occ
  FROM hits GROUP BY rid, doc_id
),
worst AS (
  SELECT rid, min(p) AS worst_pattern
  FROM hits h
  WHERE occ > 0
    AND occ = (SELECT max(occ) FROM hits h2 WHERE h2.rid = h.rid)
  GROUP BY rid
)
SELECT a.doc_id, a.n_patterns, a.n_occurrences,
       w.worst_pattern,
       (a.max_occ > {_MAX_OCC} OR a.n_patterns > {_MAX_PATTERNS})
         AS dropped
FROM agg a LEFT JOIN worst w ON w.rid = a.rid
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


# _OCC with the pattern inlined as a literal (same arithmetic)
_HITS_ARRAY_SQL = "array(" + ", ".join(
    f"named_struct('occ', CAST((length(text) -"
    f" length(replace(text, '{p}', ''))) / length('{p}') AS BIGINT),"
    f" 'p', '{p}')"
    for p in _BLOCKLIST
) + ")"


@query("blocklist_scan", BLOCKLIST_ORACLE)
def q_blocklist_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document blocklist audit: pattern hit counts, the worst
    pattern (max occurrences, ties lexicographic), and the threshold
    policy verdict (module docstring).

    Fully IN-ROW over the constant pattern array — no explode, no
    shuffle, the audit rides the corpus scan (the same shape the
    streaming twin runs per micro-batch). The per-row form is also
    the honest semantics under id corruption: a duplicate-id twin is
    two audited rows, and a NULL id is still a row — the earlier
    doc_id-keyed groupBy merged or dropped them (round-11 hostile-id
    probe)."""
    docs = load_table(spark, "documents", sf_dir).where(
        F.col("text").isNotNull()
    )
    return docs.select(
        "doc_id", F.expr(_HITS_ARRAY_SQL).alias("hs")
    ).select(
        "doc_id",
        F.expr(
            "CAST(size(filter(hs, s -> s.occ > 0)) AS BIGINT)"
        ).alias("n_patterns"),
        F.expr(
            "aggregate(hs, CAST(0 AS BIGINT), (a, s) -> a + s.occ)"
        ).alias("n_occurrences"),
        # worst pattern in-row: lexicographic min among the patterns
        # tied at the max count — array_min over (neg-occ, p) structs;
        # empty filter result → NULL, matching the oracle's left join
        F.expr(
            "array_min(transform(filter(hs, s -> s.occ > 0),"
            " s -> named_struct('no', -s.occ, 'p', s.p))).p"
        ).alias("worst_pattern"),
        F.expr("array_max(transform(hs, s -> s.occ))").alias("max_occ"),
    ).select(
        "doc_id", "n_patterns", "n_occurrences", "worst_pattern",
        (
            (F.col("max_occ") > _MAX_OCC)
            | (F.col("n_patterns") > _MAX_PATTERNS)
        ).alias("dropped"),
    )
