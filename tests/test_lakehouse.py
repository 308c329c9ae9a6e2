"""Pins for lakehouse maintenance (plans/lakehouse.py): compaction
bins are target-respecting, and the CDC merge is last-writer-wins
with resurfacing deletes."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans import QUERIES
from psx_data_pipeline_spark.plans.lakehouse import _TARGET_BYTES
from psx_data_pipeline_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.01"


def test_compaction_bins_respect_target(spark):
    rows = QUERIES["compaction_plan"](spark, SF).collect()
    assert rows
    per_part = defaultdict(list)
    for r in rows:
        per_part[r.part_date].append(r)
    for part, bins in per_part.items():
        bins.sort(key=lambda r: r.bin)
        # bins are contiguous from 0
        assert [b.bin for b in bins] == list(range(len(bins)))
        # every closed bin (all but the last) crossed the target —
        # that is what makes the plan worth executing
        for b in bins[:-1]:
            assert b.total_bytes >= _TARGET_BYTES
        # conservation: total bytes across bins = manifest bytes
    orders = load_table(spark, "orders", SF).where(
        F.col("o_orderdate").isNotNull()
    )
    manifest_bytes = 64 * orders.count()
    assert sum(r.total_bytes for r in rows) == manifest_bytes


def test_cdc_last_writer_wins_and_resurfacing(spark):
    rows = {r.c_custkey: r for r in QUERIES["cdc_apply"](spark, SF).collect()}
    cust = {
        r.c_custkey: r.c_name
        for r in load_table(spark, "customer", SF).collect()
    }
    for k, name in cust.items():
        r = rows.get(k)
        if k % 15 == 0:
            # deleted at seq 2, updated at 3, updated again at 4:
            # resurfaces with the LAST payload
            assert r is not None and r.name == name + " v3"
            assert r.applied_seq == 4
        elif k % 3 == 0:
            assert r is not None and r.name == name + " v2"
        elif k % 5 == 0:
            assert r is None, "tombstone must delete"
        else:
            assert r is not None and r.name == name
            assert r.applied_seq == 0
    # seq-1 inserts all present under fresh keys
    for k in cust:
        if k % 7 == 0:
            assert rows[k + 200000].name == cust[k] + " new"
