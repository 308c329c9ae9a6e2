"""Pins for embedding outliers (plans/outliers.py), conversion lag
(plans/behavior.py), and the streaming zone-map twin: scores match a
numpy recompute, the activation report matches a per-user replay,
and the streamed manifest equals the batch scan."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans import QUERIES
from psx_data_pipeline_spark.plans.outliers import _DIM, _TOP_K
from psx_data_pipeline_spark.sources.fixtures import load_events, load_table

SF = "/root/testdata/sf0.01"


def test_embedding_outliers_match_bruteforce(spark):
    rows = QUERIES["embedding_outliers"](spark, SF).collect()
    assert rows
    emb = load_table(spark, "embeddings", SF).where(
        F.col("label").isNotNull() & F.col("vec_id").isNotNull()
    ).collect()
    by_label = defaultdict(list)
    for r in emb:
        v = r.embedding
        if (v is None or len(v) != _DIM
                or any(x is None or math.isnan(x) or abs(x) > 100 for x in v)):
            continue
        xm = [math.floor(1000 * float(x)) for x in v]
        by_label[r.label].append((r.vec_id, xm))
    expected = {}
    for label, vecs in by_label.items():
        n = len(vecs)
        sums = [sum(x[i] for _, x in vecs) for i in range(_DIM)]
        # truncating division toward zero, matching div (Spark) and
        # // (DuckDB) — Python's // floors, so negate around it
        cent = [
            (abs(s) // n) * (1 if s >= 0 else -1) for s in sums
        ]
        scored = sorted(
            (
                (-sum((x[i] - cent[i]) ** 2 for i in range(_DIM)), vid)
                for vid, x in vecs
            )
        )
        for rank, (negd, vid) in enumerate(scored[:_TOP_K], 1):
            expected[(label, vid)] = (-negd, rank)
    got = {(r.label, r.vec_id): (r.dist2_milli2, r.rank) for r in rows}
    assert got == expected


def test_conversion_lag_matches_replay(spark):
    row = QUERIES["conversion_lag"](spark, SF).collect()[0]
    ev = load_events(spark, SF).where(
        F.col("ts_us").isNotNull() & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    ).select("user_id", "event_type", "ts_us").collect()
    signup = {}
    for e in ev:
        if e.event_type == "signup":
            signup[e.user_id] = min(
                signup.get(e.user_id, e.ts_us), e.ts_us
            )
    first_purchase = {}
    for e in ev:
        if e.event_type == "purchase" and e.user_id in signup \
                and e.ts_us >= signup[e.user_id]:
            first_purchase[e.user_id] = min(
                first_purchase.get(e.user_id, e.ts_us), e.ts_us
            )
    lags = sorted(
        (first_purchase[u] - signup[u]) // 1_000_000
        for u in first_purchase
    )
    assert row.n_signup_users == len(signup)
    assert row.n_converted == len(lags)
    assert row.conversion_permille == len(lags) * 1000 // len(signup)
    for q, got in ((50, row.p50_s), (90, row.p90_s), (99, row.p99_s)):
        rank = (q * len(lags) + 99) // 100
        assert got == lags[max(rank - 1, 0)]


def test_stream_zone_maps_equal_batch_manifest(spark):
    li = load_table(spark, "lineitem", SF).where(
        F.col("l_shipdate").isNotNull() & F.col("l_partkey").isNotNull()
    )
    batch = {
        (r.file_month, r.writer): (r.zmin, r.zmax, r.rows_in_file)
        for r in li.groupBy(
            F.date_trunc("month", "l_shipdate").cast("date")
            .alias("file_month"),
            (F.col("l_orderkey") % 16).alias("writer"),
        ).agg(
            F.min("l_partkey").cast("long").alias("zmin"),
            F.max("l_partkey").cast("long").alias("zmax"),
            F.count(F.lit(1)).cast("long").alias("rows_in_file"),
        ).collect()
    }
    streamed = {
        (r.file_month, r.writer): (r.zmin, r.zmax, r.rows_in_file)
        for r in QUERIES["stream_zone_maps"](spark, SF).collect()
    }
    assert streamed == batch
