"""Referential-integrity census: the FK health audit a warehouse
runs after every load — for each declared child→parent edge, how
many child rows carry a NULL reference, how many reference a parent
that does not exist (orphans), and how many parents have no children
(childless — the reverse diagnostic that catches a truncated child
load). Complements the rule suite in plans/rules.py (per-column
predicates) with the CROSS-TABLE leg it cannot express.

100 TB shape: each edge audit is two anti-joins on the key (child
left-anti parent for orphans, parent left-anti child for childless)
plus map-side-combinable counts — the anti-join shuffles on the FK
key exactly like the production join it validates, so it co-locates
under the same bucketing; the 4-row result unions bounded
single-row aggregates. NULL keys never equi-join, so the orphan
anti-join over-matches NULLs — they are counted separately and
excluded from the orphan leg explicitly on both engines.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_table

# (edge name, child table, child key, parent table, parent key)
_EDGES = [
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
]


def _edge_sql(edge: str, ct: str, ck: str, pt: str, pk: str) -> str:
    return f"""
SELECT '{edge}' AS edge,
       (SELECT CAST(count(*) AS BIGINT) FROM {ct}) AS n_rows,
       (SELECT CAST(count(*) AS BIGINT) FROM {ct} WHERE {ck} IS NULL)
         AS n_null_refs,
       (SELECT CAST(count(*) AS BIGINT) FROM {ct} c
        WHERE c.{ck} IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM {pt} p WHERE p.{pk} = c.{ck}))
         AS n_orphans,
       (SELECT CAST(count(DISTINCT c.{ck}) AS BIGINT) FROM {ct} c
        WHERE c.{ck} IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM {pt} p WHERE p.{pk} = c.{ck}))
         AS n_orphan_keys,
       (SELECT CAST(count(*) AS BIGINT) FROM {pt} p
        WHERE p.{pk} IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM {ct} c WHERE c.{ck} = p.{pk}))
         AS n_childless_parents
"""


FK_ORPHAN_ORACLE = "\nUNION ALL\n".join(
    _edge_sql(*e) for e in _EDGES
)


def _edge_audit(
    spark: SparkSession, sf_dir: str,
    edge: str, ct: str, ck: str, pt: str, pk: str,
) -> DataFrame:
    child = load_table(spark, ct, sf_dir)
    parent = load_table(spark, pt, sf_dir)
    base = child.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        # coalesce: SUM over an EMPTY child table is NULL where the
        # oracle's filtered COUNT(*) is 0 — found by the round-8
        # empty-corpus probe; an audit must report 0, never NULL
        F.coalesce(
            F.sum(F.when(F.col(ck).isNull(), 1).otherwise(0)),
            F.lit(0),
        ).cast("long").alias("n_null_refs"),
    )
    orphans = (
        child.where(F.col(ck).isNotNull())
        .join(parent, child[ck] == parent[pk], "left_anti")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orphans"),
            F.countDistinct(ck).cast("long").alias("n_orphan_keys"),
        )
    )
    childless = (
        parent.where(F.col(pk).isNotNull())
        .join(child, parent[pk] == child[ck], "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n_childless_parents"))
    )
    return (
        base.crossJoin(F.broadcast(orphans))
        .crossJoin(F.broadcast(childless))
        .select(
            F.lit(edge).alias("edge"), "n_rows", "n_null_refs",
            "n_orphans", "n_orphan_keys", "n_childless_parents",
        )
    )


@query("fk_orphan_audit", FK_ORPHAN_ORACLE)
def q_fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-FK-edge integrity census (module docstring): row/NULL-ref
    counts, orphan rows and distinct orphan keys, childless parents.
    Each edge's three aggregates collapse to single rows before the
    bounded crossJoin assembly, so the 4-edge union is 4 rows."""
    return reduce(
        DataFrame.unionByName,
        [_edge_audit(spark, sf_dir, *e) for e in _EDGES],
    )
