"""Scan-efficiency guardrails: predicate pushdown and column pruning
must reach the parquet scan. A scan that reads every column for a
narrow projection is wrong at any scale and catastrophic at 100 TB —
these tests pin the property so a refactor (e.g. an added
repartition or UDF) can't silently break it.
"""

from __future__ import annotations

import re

from psx_data_pipeline_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _scans(plan: str) -> list[str]:
    return [l for l in plan.splitlines() if "FileScan parquet" in l]


def test_q1_scan_prunes_and_pushes(spark):
    plan = (
        QUERIES["pricing_summary"](spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    (scan,) = _scans(plan)
    # the shipdate filter reaches the scan even through the
    # parallelizing repartition
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in scan
    # exactly the 7 referenced columns are read (lineitem has 16)
    m = re.search(r"ReadSchema: struct<([^>]*)", scan)
    cols = {c.split(":")[0] for c in m.group(1).split(",") if ":" in c}
    assert cols <= {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    }


def test_narrow_projection_prunes_documents(spark):
    """token_stats projects (doc_id, text)-derived columns only — the
    scan must not read lang/source/n_chars."""
    plan = (
        QUERIES["token_stats"](spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for scan in _scans(plan):
        m = re.search(r"ReadSchema: struct<([^>]*)", scan)
        cols = {c.split(":")[0] for c in m.group(1).split(",") if ":" in c}
        assert "lang" not in cols and "source" not in cols


def test_partition_filter_key_lookup(spark):
    """A key-equality filter is pushed for point lookups on orders."""
    from pyspark.sql import functions as F

    from psx_data_pipeline_spark.sources.fixtures import load_table

    df = (
        load_table(spark, "orders", SF_DIR)
        .where(F.col("o_orderkey") == 7)
        .select("o_orderkey", "o_totalprice")
    )
    (scan,) = _scans(df._jdf.queryExecution().executedPlan().toString())
    assert "EqualTo(o_orderkey,7)" in scan


def test_bloom_build_scan_pushes_and_prunes(spark):
    """bloom_semijoin's build scan must push the dim predicate and
    read only the two referenced orders columns; the probe scan only
    l_orderkey (round 6)."""
    plan = (
        QUERIES["bloom_semijoin"](spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    order_scans = [s for s in _scans(plan) if "orders.parquet" in s]
    assert order_scans
    for scan in order_scans:
        assert "EqualTo(o_orderpriority,1-URGENT)" in scan, scan
        m = re.search(r"ReadSchema: struct<([^>]*)", scan)
        cols = {c.split(":")[0] for c in m.group(1).split(",") if ":" in c}
        assert cols <= {"o_orderkey", "o_orderpriority"}, cols
    li_scans = [s for s in _scans(plan) if "lineitem.parquet" in s]
    assert li_scans
    for scan in li_scans:
        m = re.search(r"ReadSchema: struct<([^>]*)", scan)
        cols = {c.split(":")[0] for c in m.group(1).split(",") if ":" in c}
        assert cols <= {"l_orderkey"}, cols


def test_linkage_scan_reads_only_key_and_name(spark):
    plan = (
        QUERIES["fuzzy_name_linkage"](spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for scan in _scans(plan):
        m = re.search(r"ReadSchema: struct<([^>]*)", scan)
        cols = {c.split(":")[0] for c in m.group(1).split(",") if ":" in c}
        assert cols <= {"p_partkey", "p_name"}, cols
