"""Property pins for incremental view maintenance (plans/ivm.py):
the maintained view equals a recompute (the oracle already proves
values; here we pin the structural claims) — the V-side scan carries
no Exchange (bucket layout consumed), zero-count groups leave the
view, and maintenance math handles a user who exists only in the
delta."""

from __future__ import annotations

from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans import QUERIES
from psx_data_pipeline_spark.plans.ivm import (
    _BASE_PRED,
    signed_delta,
)
from psx_data_pipeline_spark.sources.fixtures import load_events

SF = "/root/testdata/sf0.01"


def test_view_scan_has_no_exchange(spark):
    """The merge must consume V's bucket layout: no Exchange may sit
    between the V table scan and the join (the delta side may
    shuffle — that's the O(|delta|) cost the design pays). Pinned on
    the REGISTERED query's plan: the null-safe-key rewrite this
    round silently disabled the bucketed read (eqNullSafe's internal
    (coalesce, isnull) keys don't match a user_id bucketing) until
    the key was encoded as explicit non-null (k, knull) columns."""
    plan = (
        QUERIES["ivm_user_totals"](spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Bucketed: true" in plan, plan
    # every Exchange must sit on the delta branch: the line feeding
    # the V table scan is its Sort, never a shuffle
    lines = plan.splitlines()
    scan_i = next(
        i for i, l in enumerate(lines) if "ivm_user_totals_v" in l
    )
    assert "Exchange" not in lines[scan_i - 1], plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_delta_only_touches_changed_users(spark):
    d = signed_delta(spark, SF)
    ev = load_events(spark, SF)
    touched = (
        ev.where(
            F.expr("event_id % 5 = 4")
            | (F.expr(_BASE_PRED) & F.expr("event_id % 17 = 0"))
        )
        .select("user_id")
        .distinct()
        .count()
    )
    assert d.count() == touched


def test_maintenance_matches_recompute_including_signs(spark):
    out = {
        r["user_id"]: (r["n_events"], r["value_k"])
        for r in QUERIES["ivm_user_totals"](spark, SF).collect()
    }
    from psx_data_pipeline_spark.functions.numeric import milli

    post = (
        load_events(spark, SF)
        .where(
            F.expr("event_id % 5 = 4")
            | (F.expr(_BASE_PRED) & F.expr("event_id % 17 <> 0"))
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(milli("value")).alias("vk"),
        )
    )
    exp = {r["user_id"]: (r["n"], r["vk"]) for r in post.collect()}
    assert out == exp


def test_null_user_group_merges_to_one_row(spark):
    """Hostile-probe pin (round 6): GROUP BY keeps a NULL-user group
    on both the view and the delta; the merge key must be NULL-SAFE
    or the maintained view carries two rows for that group where the
    recompute has one."""
    null_rows = spark.createDataFrame(
        [
            # base row (kept), base row (deleted), insert row — all
            # for the NULL user
            (1, None, "click", 2.0, None, None),
            (17 * 5, None, "click", 3.0, None, None),
            (4, None, "click", 5.0, None, None),
        ],
        "event_id long, user_id long, event_type string, value double, "
        "ts timestamp, props string",
    )
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="ivm_null_user_")
    for t in ("events",):
        null_rows.write.mode("overwrite").parquet(os.path.join(d, f"{t}.parquet"))
    out = QUERIES["ivm_user_totals"](spark, d).collect()
    assert len(out) == 1, out
    r = out[0]
    assert r["user_id"] is None
    # kept base row (event_id=1) + insert (event_id=4); 85 deleted
    assert r["n_events"] == 2
    assert r["value_k"] == 2000 + 5000
