"""Shuffle bytes read/written per query — the scale-legible evidence
for shuffle-removal wins (round-12 verdict ask #6).

sf0.1 walls cannot show what deleting full-corpus exchanges buys; the
shuffle-byte totals at a 10x corpus can. This runs each query once
warm inside a job group and sums the per-stage shuffle read/write
bytes from the Spark UI REST API (local mode exposes it on the
driver's UI port).

Usage:
    SPARK_GRAFT_SF_DIR=/tmp/rehearsal_10x python tools/shuffle_bytes.py \
        kmeans_topics semdedup dedup_clusters ngram_jaccard_pairs \
        ticker_sync_changes

Run it from BOTH checkouts (HEAD and the pre-optimization worktree)
to get the before/after table.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from psx_data_pipeline_spark.plans import (  # noqa: E402
    MEMO_OWNERS,
    QUERIES,
    clear_session_memos,
)
from psx_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "kmeans_topics", "semdedup", "dedup_clusters", "ngram_jaccard_pairs",
    "ticker_sync_changes",
]


def _rest(spark, path: str):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def main() -> int:
    names = sys.argv[1:] or DEFAULT
    # session.py disables the UI; the REST metrics need it. Pre-create
    # the session with the UI on — get_spark's getOrCreate then
    # returns this one (builder configs are no-ops on a live session).
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    master = f"local[{cpus}]" if cpus else "local[*]"
    SparkSession.builder.master(master).appName("shuffle_bytes").config(
        "spark.ui.enabled", "true"
    ).config("spark.sql.shuffle.partitions", cpus or "32").config(
        "spark.sql.adaptive.enabled", "true"
    ).config("spark.sql.session.timeZone", "UTC").config(
        "spark.sql.legacy.parquet.nanosAsLong", "true"
    ).config(
        "spark.sql.execution.arrow.pyspark.enabled", "true"
    ).config("spark.driver.memory", "8g").getOrCreate()
    spark = get_spark("shuffle_bytes")
    assert spark.sparkContext.uiWebUrl, "UI must be enabled for REST metrics"
    sc = spark.sparkContext
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
        if name in MEMO_OWNERS:
            clear_session_memos()
        QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        if name in MEMO_OWNERS:
            clear_session_memos()
        group = f"sb-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        job_ids = sorted(tracker.getJobIdsForGroup(group))
        stage_ids: set[int] = set()
        for jid in job_ids:
            jinfo = tracker.getJobInfo(jid)
            if jinfo is not None:
                stage_ids.update(jinfo.stageIds)
        sread = swrite = srows_r = srows_w = 0
        seen = set()
        for st in _rest(spark, "/stages?status=complete"):
            sid = st["stageId"]
            if sid in stage_ids and sid not in seen:
                seen.add(sid)
                sread += st.get("shuffleReadBytes", 0)
                swrite += st.get("shuffleWriteBytes", 0)
                srows_r += st.get("shuffleReadRecords", 0)
                srows_w += st.get("shuffleWriteRecords", 0)
        print(json.dumps({
            "query": name, "wall_s": round(wall, 3),
            "jobs": len(job_ids), "stages": len(stage_ids),
            "shuffle_read_bytes": sread, "shuffle_write_bytes": swrite,
            "shuffle_read_rows": srows_r, "shuffle_write_rows": srows_w,
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
