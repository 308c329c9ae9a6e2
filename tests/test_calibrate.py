"""Property pins for quantile normalization (plans/calibrate.py):
the mapping is total over in-contract rows, monotone within source,
lands inside the pooled value set, and fixes the endpoints (a
source's minimum maps to the pooled minimum)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans import QUERIES
from psx_data_pipeline_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.01"


def test_total_and_bounded(spark):
    out = QUERIES["quantile_calibrate"](spark, SF)
    n_in = (
        load_table(spark, "documents", SF)
        .where(F.col("n_chars").isNotNull() & F.col("source").isNotNull())
        .count()
    )
    rows = out.collect()
    assert len(rows) == n_in
    pooled = {
        r["n_chars"]
        for r in load_table(spark, "documents", SF)
        .where(F.col("n_chars").isNotNull() & F.col("source").isNotNull())
        .select("n_chars").collect()
    }
    for r in rows:
        assert 0 <= r["permille"] <= 1000, r
        # calibrated is an actual pooled score, not an interpolation
        assert r["calibrated"] in pooled, r


def test_monotone_within_source_and_endpoints(spark):
    rows = QUERIES["quantile_calibrate"](spark, SF).collect()
    by_src = defaultdict(list)
    for r in rows:
        by_src[r["source"]].append(r)
    pooled_min = min(r["calibrated"] for r in rows)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: (r["score"], r["doc_id"]))
        for a, b in zip(rs, rs[1:]):
            if a["score"] < b["score"]:
                assert a["permille"] <= b["permille"], (src, a, b)
                assert a["calibrated"] <= b["calibrated"], (src, a, b)
            elif a["score"] == b["score"]:
                # ties share the permille (first-occurrence rank)
                assert a["permille"] == b["permille"], (src, a, b)
        # the source minimum maps to permille 0 = the pooled minimum
        assert rs[0]["permille"] == 0, (src, rs[0])
        assert rs[0]["calibrated"] == pooled_min, (src, rs[0])
