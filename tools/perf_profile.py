"""Per-query wall decomposition: DSL build vs driver planning vs execution.

Guide §1 (measure first): at sf0.1 the fixtures are tiny (600 K
lineitem rows, 5 K docs, 2 K embeddings), so a multi-second query wall
is NOT necessarily data compute — it can be Catalyst analysis/
optimization of a large (possibly subtree-duplicated) plan, whole-stage
codegen compilation, AQE re-planning rounds, or plain stage-count
overhead. Optimizing the wrong one wastes a round. This tool splits the
wall into:

  build_s     Python DSL construction (QUERIES[name](spark, sf_dir))
  plan_s      analysis + optimization + physical planning
              (df._jdf.queryExecution().executedPlan() forced)
  exec_s      noop write of a FRESH DataFrame (includes AQE rounds and
              codegen; planning repeats inside — exec_s alone matches
              what bench.py measures per run)

Usage: python tools/perf_profile.py [query ...]   (default: heavy tail)
Prints one JSON line per query; memo owners get memos cleared first,
mirroring bench.py's cold-run policy.
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
    "perplexity_buckets", "minhash_incremental", "source_overlap",
    "tpch_q21_waiting_supplier", "bigram_perplexity", "tfidf_top_terms",
]


def main() -> int:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark("perf_profile")
    from psx_data_pipeline_spark.schemas import FIXTURE_TABLES

    for t in FIXTURE_TABLES:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").write.format(
            "noop"
        ).mode("overwrite").save()
    # one throwaway query to absorb first-query JIT, like bench.py
    first = next(iter(QUERIES))
    QUERIES[first](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    for name in names:
        if name not in QUERIES:
            print(json.dumps({"query": name, "err": "unknown"}))
            continue
        if name in MEMO_OWNERS:
            clear_session_memos()
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = QUERIES[name](spark, SF_DIR)
        t1 = time.perf_counter()
        _ = df._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        if name in MEMO_OWNERS:
            clear_session_memos()
        t3 = time.perf_counter()
        df2 = QUERIES[name](spark, SF_DIR)
        df2.write.format("noop").mode("overwrite").save()
        t4 = time.perf_counter()
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({
            "query": name,
            "build_s": round(t1 - t0, 3),
            "plan_s": round(t2 - t1, 3),
            "exec_s": round(t4 - t3, 3),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
