"""Per-query job/stage census: is a multi-second wall compute or latency?

Guide §1/§7: at sf0.1 the fixtures are tiny, so a 4 s query wall on
local[32] is either real task compute or serial per-stage latency
(many small jobs/stages/broadcasts). The fix differs: cheaper per-row
work vs fewer stages/jobs. This tool runs each query once (memos
cleared, warm JIT) inside a job group, then reads the status tracker
for every job in the group: job count, stage count, task count.

Usage: python tools/stage_profile.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from psx_data_pipeline_spark.plans import (  # noqa: E402
    MEMO_OWNERS,
    QUERIES,
    clear_session_memos,
)
from psx_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "ticker_sync_changes", "simhash_near_pairs", "ngram_jaccard_pairs",
    "pq_adc_topk", "minhash_calibration", "kmeans_topics",
    "embedding_dedup", "neighbor_triangles", "dedup_clusters",
    "bucketed_join", "ivf_topk", "pagerank_sim", "minhash_lsh_pairs",
    "rename_detection_parity", "dup_span_fraction", "robust_outliers",
    "perplexity_buckets", "source_overlap", "tpch_q21_waiting_supplier",
    "bigram_perplexity", "tfidf_top_terms",
]


def main() -> int:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark("stage_profile")
    sc = spark.sparkContext
    from psx_data_pipeline_spark.schemas import FIXTURE_TABLES

    for t in FIXTURE_TABLES:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").write.format(
            "noop"
        ).mode("overwrite").save()
    first = next(iter(QUERIES))
    QUERIES[first](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    tracker = sc.statusTracker()

    for name in names:
        if name not in QUERIES:
            print(json.dumps({"query": name, "err": "unknown"}))
            continue
        # warm one full run first so JIT/codegen is not in the census
        if name in MEMO_OWNERS:
            clear_session_memos()
        df = QUERIES[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        if name in MEMO_OWNERS:
            clear_session_memos()
        group = f"census-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        df2 = QUERIES[name](spark, SF_DIR)
        df2.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        job_ids = sorted(tracker.getJobIdsForGroup(group))
        stage_ids: set[int] = set()
        n_tasks = 0
        for jid in job_ids:
            jinfo = tracker.getJobInfo(jid)
            if jinfo is None:
                continue
            stage_ids.update(jinfo.stageIds)
        for sid in stage_ids:
            sinfo = tracker.getStageInfo(sid)
            if sinfo is not None:
                n_tasks += sinfo.numCompletedTasks
        print(json.dumps({
            "query": name,
            "wall_s": round(wall, 3),
            "jobs": len(job_ids),
            "stages": len(stage_ids),
            "tasks": n_tasks,
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
