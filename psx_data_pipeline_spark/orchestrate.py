"""Composed full-run job runner with the reference's failure
semantics.

The reference's ``--full-run`` DAG (reference
psx_data_automation/main.py:92-112) runs its stages in order with
per-stage failure policy: stage 1 (ticker sync) failing ABORTS the
pipeline (main.py:96-98 ``return 1``), stage 2 (ticker-info update)
failing logs and CONTINUES (main.py:102-104), later stages likewise
continue. This module encodes that policy declaratively: each Stage
carries its ``on_failure`` mode, the runner executes in order,
records per-stage outcomes, and marks everything after an abort as
skipped.

The stages themselves are the engine's registered plans — the runner
adds ordering and failure policy, never query logic.
"""

from __future__ import annotations

import logging
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

logger = logging.getLogger(__name__)

ABORT = "abort"
CONTINUE = "continue"


@dataclass
class Stage:
    """One pipeline stage: ``run`` does the work (typically: build a
    registered query's DataFrame and write it), ``on_failure`` is the
    reference policy — ``abort`` stops the pipeline, ``continue``
    records the failure and proceeds."""

    name: str
    run: Callable[[], Any]
    on_failure: str = CONTINUE


@dataclass
class StageResult:
    name: str
    status: str  # "ok" | "failed" | "skipped"
    error: str | None = None
    value: Any = field(default=None, repr=False)


@dataclass
class PipelineResult:
    ok: bool  # False only when an abort-mode stage failed
    stages: list[StageResult]

    def status(self, name: str) -> str:
        return next(s.status for s in self.stages if s.name == name)


def run_pipeline(stages: list[Stage]) -> PipelineResult:
    """Execute stages in order under their failure policies.

    Mirrors reference main.py:92-112: the first failure of an
    ``abort`` stage stops execution (remaining stages are recorded as
    ``skipped`` and ``ok`` is False); a ``continue`` stage's failure
    is recorded and the pipeline proceeds (``ok`` stays True — the
    reference returns 0 in that case)."""
    results: list[StageResult] = []
    aborted = False
    for st in stages:
        if aborted:
            results.append(StageResult(st.name, "skipped"))
            continue
        try:
            value = st.run()
            results.append(StageResult(st.name, "ok", value=value))
        except Exception as e:  # noqa: BLE001 — policy boundary
            results.append(StageResult(st.name, "failed", error=str(e)))
            if st.on_failure == ABORT:
                logger.error("stage %s failed - aborting pipeline", st.name)
                aborted = True
            else:
                logger.error(
                    "stage %s failed - continuing with pipeline", st.name
                )
    return PipelineResult(ok=not aborted, stages=results)


def full_run_stages(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> list[Stage]:
    """The reference's full-run DAG over the engine's plans:

    1. sync    — typed change table + formatted change log (ABORT on
                 failure, reference main.py:96-98);
    2. update  — SCD-1 merged universe (CONTINUE on failure,
                 main.py:102-104);
    3. append  — incremental per-key cutoff append (CONTINUE — the
                 reference's stages 3-4 are planned/continuing).

    Each stage writes parquet under ``out_dir`` — materialization is
    the stage boundary, exactly like the reference's per-script file
    artifacts.
    """
    from psx_data_pipeline_spark.plans.registry import QUERIES

    def _write(name: str, sub: str, coalesce: int | None = None) -> int:
        df = QUERIES[name](spark, sf_dir)
        if coalesce:  # churn-bounded outputs: avoid 32 kilobyte files
            df = df.coalesce(coalesce)
        df.write.mode("overwrite").parquet(f"{out_dir}/{sub}")
        # row count from the written footers (metadata-only) — a
        # df.count() here would re-execute the whole stage DAG
        return spark.read.parquet(f"{out_dir}/{sub}").count()

    return [
        # the change log is the day's adds/deletes/renames — tiny at
        # ANY corpus scale, so one output file is the right layout
        Stage(
            "sync",
            lambda: _write("change_log_format", "change_log", coalesce=1),
            ABORT,
        ),
        Stage("update", lambda: _write("scd1_merge", "universe"), CONTINUE),
        Stage("append", lambda: _write("append_cutoff", "daily_append"), CONTINUE),
    ]


def full_run(spark: SparkSession, sf_dir: str, out_dir: str) -> PipelineResult:
    """Run the reference-shaped full pipeline; see full_run_stages."""
    return run_pipeline(full_run_stages(spark, sf_dir, out_dir))


def scheduled_run(
    spark: SparkSession, sf_dir: str, out_dir: str, run_date: str
) -> PipelineResult:
    """One scheduled tick of the reference's daily cron full-run
    (reference README.md:93-98 — ``0 18 * * * main.py --full-run``).

    The engine analogue of cron cadence: each invocation IS one
    scheduled run; artifacts land under a ``run_date=`` directory
    (the reference's dated-snapshot convention) and are overwritten
    in place, so re-running a tick — a rescheduled or crashed cron
    slot — is idempotent per date, and distinct dates accumulate the
    dated history the reference keeps as per-day snapshot files.
    ``run_date`` is caller-supplied (the scheduler's logical date),
    never wall-clock, so a backfill of missed slots is just a loop
    over dates.
    """
    return full_run(spark, sf_dir, f"{out_dir}/run_date={run_date}")
