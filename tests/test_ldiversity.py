"""Pin for the l-diversity audit (plans/governance.py): per-class
sensitive-value diversity matches a brute-force recompute and
low-diversity flagging respects the threshold."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans import QUERIES
from psx_data_pipeline_spark.plans.governance import _L_DIVERSE
from psx_data_pipeline_spark.functions.numeric import MILLI_SQL
from psx_data_pipeline_spark.sources.fixtures import load_table, ts_us_expr

SF = "/root/testdata/sf0.01"


def test_l_diversity_matches_bruteforce(spark):
    rows = {r.hour_bucket: r for r in
            QUERIES["l_diversity_audit"](spark, SF).collect()}
    assert rows
    ev = load_table(spark, "events", SF)
    ev = ev.withColumn("ts_us", ts_us_expr(ev)).where(
        F.col("ts_us").isNotNull()
    ).select(
        "event_type",
        F.expr("(ts_us div 3600000000) % 24").alias("hour_bucket"),
        F.expr(f"({MILLI_SQL.format('value')}) div 1000").alias(
            "value_bucket"
        ),
    ).collect()
    classes: dict[tuple, set] = defaultdict(set)
    sizes: dict[tuple, int] = defaultdict(int)
    for e in ev:
        key = (e.hour_bucket, e.value_bucket)
        classes[key].add(e.event_type)
        sizes[key] += 1
    per_hour_low = defaultdict(int)
    per_hour_rows = defaultdict(int)
    per_hour_classes = defaultdict(int)
    min_div = defaultdict(lambda: 10**9)
    for (h, v), types in classes.items():
        per_hour_classes[h] += 1
        min_div[h] = min(min_div[h], len(types))
        if len(types) < _L_DIVERSE:
            per_hour_low[h] += 1
            per_hour_rows[h] += sizes[(h, v)]
    assert set(rows) == set(per_hour_classes)
    for h, r in rows.items():
        assert r.n_classes == per_hour_classes[h]
        assert r.min_diversity == min_div[h]
        assert r.n_low_diversity == per_hour_low[h]
        assert r.rows_exposed == per_hour_rows[h]
