"""Dump .explain("formatted") for queries to plans/<dir>/<q>_<tag>.txt.

Usage: [PLAN_DIR=r13] python tools/dump_plan.py <tag> <query> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from psx_data_pipeline_spark.plans import (  # noqa: E402
    MEMO_OWNERS,
    QUERIES,
    clear_session_memos,
)
from psx_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", os.environ.get("PLAN_DIR", "r12"))


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("dump_plan")
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        if name in MEMO_OWNERS:
            clear_session_memos()
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
