"""Data-governance operators: re-identification risk auditing and
deterministic pseudonymization — the privacy leg of a 100 TB release
gate (next to the quality suite in plans/rules.py and the blocklist
scan in plans/safety.py).

The reference handles identifiers as plain values (symbols are
scraped and republished verbatim); a dataset-release pipeline must
instead (a) measure how identifying its quasi-identifier columns are
(k-anonymity: every row should be hidden in a crowd of >= k) and
(b) replace direct identifiers with stable opaque tokens so joins
keep working while raw ids never leave the cluster.

100 TB shapes: the k-anonymity audit is two hash aggregations
(equivalence classes, then the per-type rollup — class cardinality
is bounded by the QI domain, not the row count); pseudonymization is
a pure scan-side hash projection plus one map-side-combinable
aggregate, zero joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psx_data_pipeline_spark.functions.hashing import md5_long, md5_long_sql
from psx_data_pipeline_spark.functions.numeric import MILLI_SQL, milli
from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_table, ts_us_expr

_K_ANON = 5

# Quasi-identifier: (event_type, event hour-of-day, whole-unit value
# bucket). The value bucket goes through the TOTAL milli form — NaN /
# Inf / out-of-range become the NULL bucket instead of an
# engine-dependent floor; NULL is a QI value like any other (a NULL
# hour still narrows a crowd).
K_ANONYMITY_ORACLE = f"""
WITH qi AS (
  SELECT event_type,
         (CAST(epoch_us(ts) AS BIGINT) // 3600000000) % 24 AS hour_bucket,
         ({MILLI_SQL.format('value')}) // 1000 AS value_bucket
  FROM events WHERE ts IS NOT NULL
),
classes AS (
  SELECT event_type, hour_bucket, value_bucket,
         CAST(count(*) AS BIGINT) AS sz
  FROM qi GROUP BY event_type, hour_bucket, value_bucket
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(min(sz) AS BIGINT) AS min_class_size,
       CAST(sum(CASE WHEN sz < {_K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_small_classes,
       CAST(sum(CASE WHEN sz < {_K_ANON} THEN sz ELSE 0 END) AS BIGINT)
         AS rows_at_risk
FROM classes GROUP BY event_type
"""


@query("k_anonymity_audit", K_ANONYMITY_ORACLE)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: equivalence-class census of the
    (type, hour-of-day, value-bucket) quasi-identifier and the rows
    sitting in classes smaller than k=5 — the re-identification risk
    number a privacy review reads. NULL-ts rows have no event hour
    and are out of scope (same contract as every time-keyed query).

    Hour arithmetic: (epoch_us // 3600e6) % 24 — both engines
    truncate integer division toward zero and take sign-of-dividend
    %, so the bucket is cross-engine identical even for pre-epoch
    timestamps (where "hour of day" is then a documented
    truncation-convention value, not a calendar hour — it is a
    BUCKET, and only its stability matters to the audit)."""
    ev = load_table(spark, "events", sf_dir)
    ev = ev.withColumn("ts_us", ts_us_expr(ev)).where(
        F.col("ts_us").isNotNull()
    )
    qi = ev.select(
        "event_type",
        F.expr("(ts_us div 3600000000) % 24").alias("hour_bucket"),
        F.expr(f"({MILLI_SQL.format('value')}) div 1000").alias(
            "value_bucket"
        ),
    )
    classes = qi.groupBy("event_type", "hour_bucket", "value_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    return classes.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("sz").cast("long").alias("min_class_size"),
        F.sum(F.when(F.col("sz") < _K_ANON, 1).otherwise(0))
        .cast("long").alias("n_small_classes"),
        F.sum(F.when(F.col("sz") < _K_ANON, F.col("sz")).otherwise(0))
        .cast("long").alias("rows_at_risk"),
    )


# l-diversity: k-anonymity's blind spot is a large class whose rows
# all share the SENSITIVE value — crowd size protects nothing when
# the whole crowd leaks the same fact. Here the sensitive attribute
# is the event type and the QI is the remaining (hour, value-bucket)
# pair; classes with fewer than l distinct sensitive values are the
# exposure.
_L_DIVERSE = 3

L_DIVERSITY_ORACLE = f"""
WITH qi AS (
  SELECT event_type,
         (CAST(epoch_us(ts) AS BIGINT) // 3600000000) % 24 AS hour_bucket,
         ({MILLI_SQL.format('value')}) // 1000 AS value_bucket
  FROM events WHERE ts IS NOT NULL
),
classes AS (
  SELECT hour_bucket, value_bucket,
         CAST(count(DISTINCT event_type) AS BIGINT) AS diversity,
         CAST(count(*) AS BIGINT) AS sz
  FROM qi GROUP BY hour_bucket, value_bucket
)
SELECT hour_bucket,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(min(diversity) AS BIGINT) AS min_diversity,
       CAST(sum(CASE WHEN diversity < {_L_DIVERSE} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_low_diversity,
       CAST(sum(CASE WHEN diversity < {_L_DIVERSE} THEN sz ELSE 0 END)
            AS BIGINT) AS rows_exposed
FROM classes GROUP BY hour_bucket
"""


@query("l_diversity_audit", L_DIVERSITY_ORACLE)
def q_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per QI hour bucket: equivalence classes of the (hour,
    value-bucket) quasi-identifier scored by how many DISTINCT
    sensitive values (event types) each contains, and the rows in
    classes below l=3 — the homogeneity-attack exposure k-anonymity
    cannot see. Same bucket arithmetic as the k-audit
    (q_k_anonymity_audit), so the two reports read off one QI model.

    Scale: two hash aggregations; class cardinality is QI-domain
    bounded, the distinct count is per-class over a five-value
    sensitive vocabulary."""
    ev = load_table(spark, "events", sf_dir)
    ev = ev.withColumn("ts_us", ts_us_expr(ev)).where(
        F.col("ts_us").isNotNull()
    )
    qi = ev.select(
        "event_type",
        F.expr("(ts_us div 3600000000) % 24").alias("hour_bucket"),
        F.expr(f"({MILLI_SQL.format('value')}) div 1000").alias(
            "value_bucket"
        ),
    )
    classes = qi.groupBy("hour_bucket", "value_bucket").agg(
        F.countDistinct("event_type").cast("long").alias("diversity"),
        F.count(F.lit(1)).cast("long").alias("sz"),
    )
    return classes.groupBy("hour_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("diversity").cast("long").alias("min_diversity"),
        F.sum(F.when(F.col("diversity") < _L_DIVERSE, 1).otherwise(0))
        .cast("long").alias("n_low_diversity"),
        F.sum(F.when(F.col("diversity") < _L_DIVERSE, F.col("sz"))
              .otherwise(0)).cast("long").alias("rows_exposed"),
    )


# Deterministic tokenization: token = 60-bit md5 of the id under a
# purpose-scoped salt literal. Stable across runs and engines (same
# id -> same token, so downstream joins/groupBys still co-locate),
# irreversible without the salt, and NULL ids stay NULL (a NULL
# identifier is absent, not an actor).
_PSEUDO_SALT = "psx-release-v1:"

PSEUDONYMIZE_ORACLE = f"""
WITH tok AS (
  SELECT CASE WHEN user_id IS NULL THEN NULL
         ELSE {md5_long_sql(f"'{_PSEUDO_SALT}' || CAST(user_id AS VARCHAR)")}
         END AS user_token,
         event_type, value
  FROM events
)
SELECT user_token,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
       CAST(sum({MILLI_SQL.format('value')}) AS BIGINT) AS value_k
FROM tok GROUP BY user_token
"""


@query("pseudonymize", PSEUDONYMIZE_ORACLE)
def q_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudonymized per-actor activity: raw user_ids replaced by the
    salted 60-bit hash token at scan time, then the usual keyed
    aggregate proves the token keys exactly like the raw id would
    (tests pin the mapping 1:1 on the observed ids). Scan-side
    projection + one aggregate — no joins, no Python."""
    ev = load_table(spark, "events", sf_dir)
    token = F.when(
        F.col("user_id").isNotNull(),
        md5_long(
            F.concat(F.lit(_PSEUDO_SALT), F.col("user_id").cast("string"))
        ),
    )
    return (
        ev.select(token.alias("user_token"), "event_type", "value")
        .groupBy("user_token")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("event_type").cast("long").alias("n_types"),
            F.sum(milli("value")).cast("long").alias("value_k"),
        )
    )
