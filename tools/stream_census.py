"""Micro-batch / state-store / job census for the streaming twins.

Round-12 verdict ask #3: before conceding that the stream_* walls are
irreducible AvailableNow machinery, count what one run actually does —
micro-batches executed, state-store commits, jobs/stages/tasks, and
where the wall goes (stream start → first progress → termination).

For each named twin this runs the registered query once warm (after a
fixture + codegen warm-up), then reads:
  * the StreamingQuery's recentProgress (batches, state rows,
    state commit counts, durationMs breakdown),
  * the job-group census from the status tracker (same method as
    tools/stage_profile.py).

Because the stream queries create + drop their own StreamingQuery
inside the plan function, progress is captured via a streams listener
registered before the run.

Usage: python tools/stream_census.py [stream_query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from psx_data_pipeline_spark.plans import QUERIES  # noqa: E402
from psx_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "stream_click_attribution", "stream_user_totals",
    "stream_sync_change_log", "stream_dedup", "stream_sessionize",
    "stream_window_counts", "stream_label_vote", "stream_heavy_hitters",
]


def main() -> int:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark("stream_census")
    sc = spark.sparkContext
    from pyspark.sql.streaming import StreamingQueryListener

    progress_log: list[dict] = []

    class L(StreamingQueryListener):
        def onQueryStarted(self, event):
            progress_log.append({"event": "started", "t": time.perf_counter()})

        def onQueryProgress(self, event):
            p = event.progress
            progress_log.append({
                "event": "progress", "t": time.perf_counter(),
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "durationMs": dict(p.durationMs),
                "stateOperators": [
                    {
                        "operatorName": so.operatorName,
                        "numRowsTotal": so.numRowsTotal,
                        "numRowsUpdated": so.numRowsUpdated,
                        "commitTimeMs": so.allUpdatesTimeMs,
                        "numShufflePartitions": so.numShufflePartitions,
                        "numStateStoreInstances": so.numStateStoreInstances,
                    }
                    for so in p.stateOperators
                ],
            })

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            progress_log.append({"event": "terminated", "t": time.perf_counter()})

    spark.streams.addListener(L())

    from psx_data_pipeline_spark.schemas import FIXTURE_TABLES

    for t in FIXTURE_TABLES:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").write.format(
            "noop"
        ).mode("overwrite").save()

    tracker = sc.statusTracker()
    for name in names:
        if name not in QUERIES:
            print(json.dumps({"query": name, "err": "unknown"}))
            continue
        # one warm run (codegen/JIT) — not censused
        QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        time.sleep(1.5)  # listener events arrive async — let them drain
        progress_log.clear()
        group = f"census-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        df = QUERIES[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        # listener events arrive async; give the bus a moment
        time.sleep(1.0)
        job_ids = sorted(tracker.getJobIdsForGroup(group))
        stage_ids: set[int] = set()
        n_tasks = 0
        for jid in job_ids:
            jinfo = tracker.getJobInfo(jid)
            if jinfo is not None:
                stage_ids.update(jinfo.stageIds)
        for sid in stage_ids:
            sinfo = tracker.getStageInfo(sid)
            if sinfo is not None:
                n_tasks += sinfo.numCompletedTasks
        events = list(progress_log)
        batches = [e for e in events if e["event"] == "progress"]
        started = [e for e in events if e["event"] == "started"]
        ended = [e for e in events if e["event"] == "terminated"]
        timeline = {}
        if started and batches:
            timeline["start_to_first_batch_s"] = round(
                batches[0]["t"] - started[0]["t"], 3)
        if started and ended:
            timeline["stream_total_s"] = round(ended[-1]["t"] - started[0]["t"], 3)
            timeline["pre_stream_s"] = round(started[0]["t"] - t0, 3)
            timeline["post_stream_s"] = round(t0 + wall - ended[-1]["t"], 3)
        print(json.dumps({
            "query": name, "wall_s": round(wall, 3),
            "jobs": len(job_ids), "stages": len(stage_ids), "tasks": n_tasks,
            "n_micro_batches": len(batches),
            "batches": [
                {k: b[k] for k in ("batchId", "numInputRows", "durationMs",
                                    "stateOperators")}
                for b in batches
            ],
            **timeline,
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
