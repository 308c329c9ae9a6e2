"""Failure-policy tests for the composed full-run job
(reference main.py:92-112 semantics: stage-1 abort, stage-2 continue)."""

from __future__ import annotations

import pytest

from psx_data_pipeline_spark.orchestrate import (
    ABORT,
    CONTINUE,
    Stage,
    full_run,
    full_run_stages,
    run_pipeline,
)

SF = "/root/testdata/sf0.001"


def _boom() -> None:
    raise RuntimeError("injected failure")


def test_abort_stage_failure_skips_rest():
    """Reference main.py:96-98: stage-1 failure aborts the pipeline."""
    ran = []
    res = run_pipeline([
        Stage("sync", _boom, ABORT),
        Stage("update", lambda: ran.append("update"), CONTINUE),
        Stage("append", lambda: ran.append("append"), CONTINUE),
    ])
    assert not res.ok
    assert res.status("sync") == "failed"
    assert res.status("update") == "skipped"
    assert res.status("append") == "skipped"
    assert ran == []


def test_continue_stage_failure_keeps_going():
    """Reference main.py:102-104: stage-2 failure logs and continues;
    the pipeline still completes (reference returns 0)."""
    ran = []
    res = run_pipeline([
        Stage("sync", lambda: ran.append("sync"), ABORT),
        Stage("update", _boom, CONTINUE),
        Stage("append", lambda: ran.append("append"), CONTINUE),
    ])
    assert res.ok
    assert res.status("sync") == "ok"
    assert res.status("update") == "failed"
    assert res.status("append") == "ok"
    assert ran == ["sync", "append"]


def test_full_run_writes_all_artifacts(spark, tmp_path):
    out = str(tmp_path / "full_run")
    res = full_run(spark, SF, out)
    assert res.ok
    assert [s.status for s in res.stages] == ["ok", "ok", "ok"]
    # each stage's artifact is readable and non-trivial
    assert spark.read.parquet(f"{out}/change_log").count() > 0
    assert spark.read.parquet(f"{out}/universe").count() > 0
    assert spark.read.parquet(f"{out}/daily_append").count() > 0


def test_full_run_stage2_failure_still_appends(spark, tmp_path, monkeypatch):
    """Inject a failure into the real stage-2 writer: stage 3 must
    still run and produce its artifact."""
    out = str(tmp_path / "full_run_fail2")
    stages = full_run_stages(spark, SF, out)
    stages[1] = Stage("update", _boom, CONTINUE)
    res = run_pipeline(stages)
    assert res.ok
    assert res.status("update") == "failed"
    assert res.status("append") == "ok"
    assert spark.read.parquet(f"{out}/daily_append").count() > 0
    with pytest.raises(Exception):
        spark.read.parquet(f"{out}/universe").collect()


def test_scheduled_run_idempotent_and_dated(spark, tmp_path):
    from psx_data_pipeline_spark.orchestrate import scheduled_run

    out = str(tmp_path / "sched")
    r1 = scheduled_run(spark, SF, out, "2026-08-12")
    n1 = spark.read.parquet(f"{out}/run_date=2026-08-12/change_log").count()
    # re-running the same tick (crashed/rescheduled cron slot) is
    # idempotent: same artifact, same contents
    r2 = scheduled_run(spark, SF, out, "2026-08-12")
    n2 = spark.read.parquet(f"{out}/run_date=2026-08-12/change_log").count()
    assert r1.ok and r2.ok and n1 == n2 > 0
    # a different date accumulates dated history alongside
    scheduled_run(spark, SF, out, "2026-08-13")
    assert spark.read.parquet(f"{out}/run_date=2026-08-13/change_log").count() == n1


# --- CLI entry point (reference main.py parity) ------------------------------


def test_cli_full_run_exit_zero(spark, tmp_path):
    from psx_data_pipeline_spark.__main__ import main

    rc = main([
        "--full-run", "--sf-dir", "/root/testdata/sf0.001",
        "--out-dir", str(tmp_path / "out"),
    ])
    assert rc == 0
    import os

    assert os.path.isdir(str(tmp_path / "out" / "change_log"))


def test_cli_single_stage_failure_exits_one(spark, tmp_path, monkeypatch):
    """A standalone stage failure exits 1 (reference main.py:62-66)."""
    import psx_data_pipeline_spark.orchestrate as orch
    from psx_data_pipeline_spark.__main__ import main
    from psx_data_pipeline_spark.orchestrate import Stage

    def broken_stages(spark_, sf_dir, out_dir):
        def boom():
            raise RuntimeError("injected")

        return [Stage("sync", boom, orch.ABORT)]

    monkeypatch.setattr(
        "psx_data_pipeline_spark.orchestrate.full_run_stages", broken_stages
    )
    rc = main([
        "--sync-tickers", "--sf-dir", "/root/testdata/sf0.001",
        "--out-dir", str(tmp_path / "out"),
    ])
    assert rc == 1


def test_cli_dated_run_is_idempotent(spark, tmp_path):
    from psx_data_pipeline_spark.__main__ import main

    out = str(tmp_path / "out")
    for _ in range(2):  # re-running a tick must be clean
        rc = main([
            "--full-run", "--sf-dir", "/root/testdata/sf0.001",
            "--out-dir", out, "--run-date", "2026-08-13",
        ])
        assert rc == 0
    import os

    assert os.path.isdir(f"{out}/run_date=2026-08-13/change_log")
