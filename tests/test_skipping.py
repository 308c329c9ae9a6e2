"""Pins for the data-skipping audits (plans/skipping.py): zone-map
pruning is sound (never skips a file whose rows match) and the
vacuum plan conserves bytes and respects retention."""

from __future__ import annotations

from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans import QUERIES
from psx_data_pipeline_spark.plans.skipping import _PREDS, _RETAIN_FROM
from psx_data_pipeline_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.01"


def test_zone_map_prune_sound_and_complete(spark):
    rows = {r.pred_id: r for r in QUERIES["zone_map_prune"](spark, SF).collect()}
    assert set(rows) == {pid for pid, _, _ in _PREDS}
    li = load_table(spark, "lineitem", SF).where(
        F.col("l_shipdate").isNotNull() & F.col("l_partkey").isNotNull()
    )
    total = li.count()
    for pid, lo, hi in _PREDS:
        r = rows[pid]
        assert r.rows_total == total
        assert 0 <= r.n_scanned <= r.n_files
        # SOUNDNESS: every row actually matching the predicate lives
        # in a scanned file — rows_scanned must cover the true hits
        true_hits = li.where(
            (F.col("l_partkey") >= lo) & (F.col("l_partkey") <= hi)
        ).count()
        assert r.rows_scanned >= true_hits
        assert r.prune_permille == (r.n_files - r.n_scanned) * 1000 // r.n_files
    # the wide predicate prunes no more than the narrow one scans
    assert rows[3].n_scanned >= rows[1].n_scanned


def test_vacuum_plan_conserves_and_respects_retention(spark):
    rows = QUERIES["vacuum_plan"](spark, SF).collect()
    assert rows
    orders = load_table(spark, "orders", SF).where(
        F.col("o_orderdate").isNotNull()
    )
    # conservation: reclaimed + live <= total ledger bytes (files
    # removed after the horizon are neither deletable nor live)
    total_bytes = 64 * orders.count()
    assert sum(r.bytes_reclaimed + r.bytes_live for r in rows) <= total_bytes
    for r in rows:
        assert 0 <= r.n_deletable <= r.n_files
    # writer-level truth: only writer 0 (add 0, remove 2 <= horizon)
    # is deletable in this ledger
    deletable_writers = [
        w for w in range(8)
        if w % 3 == 0 and (w % 4 + 2) <= _RETAIN_FROM
    ]
    assert deletable_writers == [0]
    # one deletable file per (date, writer 0) group that exists
    n_w0 = orders.where(F.col("o_orderkey") % 8 == 0).select(
        F.col("o_orderdate").cast("date")
    ).distinct().count()
    assert sum(r.n_deletable for r in rows) == n_w0
