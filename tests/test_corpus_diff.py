"""Property pins for the corpus version diff (plans/corpus.py): the
change classes partition both versions, counts reconcile with the
derivation predicates, and fingerprint comparison is what drives
CHANGED (not text equality on the join)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans import QUERIES
from psx_data_pipeline_spark.plans.corpus import _v1, _v2
from psx_data_pipeline_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.01"


def test_counts_reconcile_with_versions(spark):
    rows = QUERIES["corpus_diff"](spark, SF).collect()
    by_type = defaultdict(int)
    for r in rows:
        by_type[r["change_type"]] += r["n"]
    n_v1 = _v1(spark, SF).count()
    n_v2 = _v2(spark, SF).count()
    # v1 = removed + changed + unchanged; v2 = added + changed + unchanged
    assert by_type["REMOVED"] + by_type["CHANGED"] + by_type["UNCHANGED"] == n_v1
    assert by_type["ADDED"] + by_type["CHANGED"] + by_type["UNCHANGED"] == n_v2
    assert set(by_type) == {"ADDED", "REMOVED", "CHANGED", "UNCHANGED"}


def test_classes_match_derivation_predicates(spark):
    rows = QUERIES["corpus_diff"](spark, SF).collect()
    by_type = defaultdict(int)
    for r in rows:
        by_type[r["change_type"]] += r["n"]
    d = load_table(spark, "documents", SF).where(F.col("doc_id").isNotNull())
    n_removed = d.where(F.col("doc_id") % 11 == 0).count()
    n_added = d.where(F.col("doc_id") % 13 == 0).count()
    # survivors revised at %7 with NON-NULL text change fingerprints;
    # a NULL text revises to a NULL fingerprint = not DISTINCT
    n_changed = d.where(
        (F.col("doc_id") % 11 != 0)
        & (F.col("doc_id") % 7 == 0)
        & F.col("text").isNotNull()
    ).count()
    assert by_type["REMOVED"] == n_removed
    assert by_type["ADDED"] == n_added
    assert by_type["CHANGED"] == n_changed
