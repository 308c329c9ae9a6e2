"""Pins for the governance operators (plans/governance.py): the
k-anonymity census reconciles with raw row counts and treats NULL QI
components as buckets; pseudonymization is 1:1 on observed ids,
NULL-safe, and join-stable."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans import QUERIES
from psx_data_pipeline_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.01"


def test_k_anonymity_counts_reconcile(spark):
    rows = QUERIES["k_anonymity_audit"](spark, SF).collect()
    total_in_classes = {r.event_type: r for r in rows}
    ev = load_table(spark, "events", SF).where(F.col("ts").isNotNull())
    raw = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(total_in_classes) == set(raw)
    for et, r in total_in_classes.items():
        assert r.rows_at_risk <= raw[et]
        assert r.n_small_classes <= r.n_classes
        assert r.min_class_size >= 1


def test_k_anonymity_null_buckets_and_risk(spark, tmp_path):
    """NaN value -> NULL bucket (total milli form); a singleton class
    is at risk; NULL-ts rows are out of scope."""
    h = dt.datetime(2024, 1, 1, 7, 0, 0)
    pq.write_table(
        pa.table({
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "ts": pa.array([h, h, h, h, h, None], pa.timestamp("us")),
            "user_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "event_type": pa.array(["click"] * 6),
            # 4 rows bucket together (1.x -> 1); NaN -> NULL bucket
            "value": pa.array([1.1, 1.2, 1.3, 1.9, float("nan"), 1.0]),
            "props": pa.array([None] * 6, pa.string()),
        }),
        f"{tmp_path}/events.parquet",
    )
    rows = QUERIES["k_anonymity_audit"](spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    # classes: bucket 1 (size 4) and NULL bucket (size 1); ts-NULL row absent
    assert r.n_classes == 2
    assert r.min_class_size == 1
    assert r.n_small_classes == 2      # both < k=5
    assert r.rows_at_risk == 5


def test_pseudonymize_bijective_and_null_safe(spark):
    out = QUERIES["pseudonymize"](spark, SF)
    ev = load_table(spark, "events", SF)
    n_users = ev.where(F.col("user_id").isNotNull()).select(
        "user_id").distinct().count()
    has_null_uid = ev.where(F.col("user_id").isNull()).count() > 0
    tokens = [r.user_token for r in out.collect()]
    non_null = [t for t in tokens if t is not None]
    # 1:1 on observed ids: as many distinct tokens as distinct ids
    assert len(set(non_null)) == len(non_null) == n_users
    assert (None in tokens) == has_null_uid
    # join stability: per-token event counts equal per-user counts
    per_user = sorted(
        r.n for r in ev.where(F.col("user_id").isNotNull())
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    per_token = sorted(
        r.n_events for r in out.where(F.col("user_token").isNotNull())
        .collect()
    )
    assert per_user == per_token
