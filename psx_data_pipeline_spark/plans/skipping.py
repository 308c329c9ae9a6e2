"""Data-skipping audits: zone-map pruning and snapshot-retention
vacuum planning — the two questions a 100 TB lakehouse operator asks
before touching layout: "how much does a scan actually skip?" and
"how many bytes can retention reclaim?". They complete the storage
suite next to compaction/CDC (plans/lakehouse.py) and the layout
audit (zorder_layout).

Both derive a deterministic file ledger from the fixture tables (the
lakehouse.py convention) so the oracle hash-compares the full audit,
not just counts. 100 TB shape: everything is aggregation over the
FILE manifest — whose cardinality is (partition × writer)-bounded,
not row-bounded — after one corpus-wide manifest aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_table

# --- zone-map pruning audit ---------------------------------------------------

# Simulated file manifest over lineitem: one "file" per (ship month,
# writer bucket), zone map = min/max l_partkey + row count. The
# predicate catalogue is the workload being audited: three partkey
# ranges from narrow to wide (literal constants, so both engines see
# the identical workload).
_PREDS = [
    (1, 100, 180),      # narrow point-ish range
    (2, 500, 1_100),    # medium range
    (3, 1, 1_700),      # wide range (little to skip)
]

_ZONES_SQL = """
  SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS file_month,
         l_orderkey % 16 AS writer,
         CAST(min(l_partkey) AS BIGINT) AS zmin,
         CAST(max(l_partkey) AS BIGINT) AS zmax,
         CAST(count(*) AS BIGINT) AS rows_in_file
  FROM lineitem
  WHERE l_shipdate IS NOT NULL AND l_partkey IS NOT NULL
  GROUP BY 1, 2
"""

_PREDS_SQL = " UNION ALL ".join(
    f"SELECT {pid} AS pred_id, {lo} AS lo, {hi} AS hi"
    for pid, lo, hi in _PREDS
)

ZONE_MAP_PRUNE_ORACLE = f"""
WITH zones AS ({_ZONES_SQL}),
preds AS ({_PREDS_SQL}),
audit AS (
  SELECT p.pred_id,
         CASE WHEN z.zmax < p.lo OR z.zmin > p.hi THEN 0 ELSE 1 END
           AS scanned,
         z.rows_in_file
  FROM zones z CROSS JOIN preds p
)
SELECT pred_id,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(scanned) AS BIGINT) AS n_scanned,
       CAST(sum(rows_in_file) AS BIGINT) AS rows_total,
       CAST(sum(scanned * rows_in_file) AS BIGINT) AS rows_scanned,
       CAST((count(*) - sum(scanned)) * 1000 // count(*) AS BIGINT)
         AS prune_permille
FROM audit GROUP BY pred_id
"""


@query("zone_map_prune", ZONE_MAP_PRUNE_ORACLE)
def q_zone_map_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map skipping audit: per workload predicate, how many
    files (and rows) a min/max-pruned scan touches vs the manifest
    total — the number that justifies (or kills) a re-clustering job.
    A file is skipped iff its [zmin, zmax] interval misses the
    predicate range entirely.

    Scale: the predicate catalogue rides as an exploded LITERAL array
    on the manifest rows — no join of any kind; one manifest
    aggregate is the only corpus-wide shuffle, then per-predicate
    aggregation over (files × |catalogue|) rows."""
    li = load_table(spark, "lineitem", sf_dir).where(
        F.col("l_shipdate").isNotNull() & F.col("l_partkey").isNotNull()
    )
    zones = li.groupBy(
        F.date_trunc("month", "l_shipdate").cast("date").alias("file_month"),
        (F.col("l_orderkey") % 16).alias("writer"),
    ).agg(
        F.min("l_partkey").cast("long").alias("zmin"),
        F.max("l_partkey").cast("long").alias("zmax"),
        F.count(F.lit(1)).cast("long").alias("rows_in_file"),
    )
    return audit_zones(zones)


def audit_zones(zones: DataFrame) -> DataFrame:
    """The audit half over any zone-map manifest (file_month, writer,
    zmin, zmax, rows_in_file) — shared by the batch query above and
    the stream-twin probe, which feeds it the CONTINUOUSLY maintained
    manifest (stream_zone_maps) and pins that the same workload audit
    comes out identical (tools/stream_twin_probe.py)."""
    preds = F.array(*[
        F.struct(
            F.lit(pid).alias("pred_id"),
            F.lit(lo).alias("lo"),
            F.lit(hi).alias("hi"),
        )
        for pid, lo, hi in _PREDS
    ])
    audit = zones.select(
        "zmin", "zmax", "rows_in_file", F.explode(preds).alias("p")
    ).select(
        F.col("p.pred_id").alias("pred_id"),
        F.when(
            (F.col("zmax") < F.col("p.lo")) | (F.col("zmin") > F.col("p.hi")),
            F.lit(0),
        ).otherwise(F.lit(1)).alias("scanned"),
        "rows_in_file",
    )
    return audit.groupBy("pred_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("scanned").cast("long").alias("n_scanned"),
        F.sum("rows_in_file").cast("long").alias("rows_total"),
        F.sum(F.col("scanned") * F.col("rows_in_file"))
        .cast("long").alias("rows_scanned"),
        F.expr(
            "CAST((count(1) - sum(scanned)) * 1000 div count(1) AS BIGINT)"
        ).alias("prune_permille"),
    )


# --- snapshot-retention vacuum plan -------------------------------------------

# Deterministic file ledger (same manifest family as compaction_plan):
# file added at snapshot (writer % 4); files whose writer % 3 = 0 were
# rewritten two snapshots later (remove_snap = add + 2, i.e. last
# referenced by snapshot add+1); everything else is still live.
# Retention keeps snapshots >= _RETAIN_FROM; a file is deletable iff
# no retained snapshot references it.
_RETAIN_FROM = 3

_LEDGER_SQL = """
  SELECT CAST(o_orderdate AS DATE) AS part_date,
         o_orderkey % 8 AS writer,
         CAST(64 * count(*) AS BIGINT) AS bytes,
         (o_orderkey % 8) % 4 AS add_snap,
         CASE WHEN (o_orderkey % 8) % 3 = 0
              THEN (o_orderkey % 8) % 4 + 2 END AS remove_snap
  FROM orders WHERE o_orderdate IS NOT NULL
  GROUP BY 1, 2
"""

VACUUM_PLAN_ORACLE = f"""
WITH ledger AS ({_LEDGER_SQL}),
marked AS (
  SELECT part_date, bytes,
         CASE WHEN remove_snap IS NOT NULL
                   AND remove_snap <= {_RETAIN_FROM} THEN 1 ELSE 0 END
           AS deletable,
         CASE WHEN remove_snap IS NULL THEN 1 ELSE 0 END AS live
  FROM ledger
)
SELECT part_date,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(deletable) AS BIGINT) AS n_deletable,
       CAST(sum(deletable * bytes) AS BIGINT) AS bytes_reclaimed,
       CAST(sum(live * bytes) AS BIGINT) AS bytes_live
FROM marked GROUP BY part_date
"""


@query("vacuum_plan", VACUUM_PLAN_ORACLE)
def q_vacuum_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-expiry vacuum plan: per partition, the files no
    retained snapshot references (added and removed entirely before
    the retention horizon) and the bytes deleting them reclaims,
    next to the live-as-of-latest bytes the table actually needs.
    A file removed AT snapshot r was last referenced BY r-1, so
    deletable iff remove_snap <= retention start.

    Scale: one manifest aggregate, then arithmetic over the
    (partition × writer)-bounded ledger — no joins, no windows."""
    orders = load_table(spark, "orders", sf_dir)
    ledger = (
        orders.where(F.col("o_orderdate").isNotNull())
        .groupBy(
            F.col("o_orderdate").cast("date").alias("part_date"),
            (F.col("o_orderkey") % 8).alias("writer"),
        )
        .agg((64 * F.count(F.lit(1))).cast("long").alias("bytes"))
        .select(
            "part_date", "bytes",
            (F.col("writer") % 4).alias("add_snap"),
            F.when(
                F.col("writer") % 3 == 0, F.col("writer") % 4 + 2
            ).alias("remove_snap"),
        )
    )
    marked = ledger.select(
        "part_date", "bytes",
        F.when(
            F.col("remove_snap").isNotNull()
            & (F.col("remove_snap") <= _RETAIN_FROM),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("deletable"),
        F.when(F.col("remove_snap").isNull(), F.lit(1))
        .otherwise(F.lit(0)).alias("live"),
    )
    return marked.groupBy("part_date").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("deletable").cast("long").alias("n_deletable"),
        F.sum(F.col("deletable") * F.col("bytes"))
        .cast("long").alias("bytes_reclaimed"),
        F.sum(F.col("live") * F.col("bytes"))
        .cast("long").alias("bytes_live"),
    )
