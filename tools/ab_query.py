"""Interleaved A/B of one or more queries between two checkouts.

The round-12 verdict's standing instruction: on this box the same-code
bench total swings 210-292 s between windows, so a single wall is
meaningless — every A/B must interleave runs of both code versions
within the same time window and judge on min-of-N. This tool runs one
fresh process per (side, rep): each process starts its own Spark
session, warms the fixture files + codegen, clears session memos, and
times each query twice (min-of-two, the bench's own >1 s policy).
Sides alternate A,B,A,B,... so a box-load drift hits both equally.

Usage:
    python tools/ab_query.py --old <worktree-or-repo-dir> --reps 5 \
        ticker_sync_changes rename_detection_parity

The "new" side is this repo; the "old" side is a git worktree checked
out at the comparison ref (create it first with `git worktree add`).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
names = json.loads(sys.argv[2])
from psx_data_pipeline_spark.plans import QUERIES, MEMO_OWNERS, clear_session_memos
from psx_data_pipeline_spark.session import get_spark
spark = get_spark("ab_query")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from psx_data_pipeline_spark.schemas import FIXTURE_TABLES
for t in FIXTURE_TABLES:
    spark.read.parquet(f"{SF_DIR}/{t}.parquet").write.format("noop").mode("overwrite").save()
# codegen warm-up on the first registered query (bench.py's policy)
first = next(iter(QUERIES))
try:
    QUERIES[first](spark, SF_DIR).write.format("noop").mode("overwrite").save()
except Exception:
    pass
out = {}
for name in names:
    best = None
    for _ in range(2):
        clear_session_memos()
        t0 = time.perf_counter()
        QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    out[name] = round(best, 3)
print("ABRESULT " + json.dumps(out), flush=True)
"""


def run_side(root: str, names: list[str]) -> dict[str, float]:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    p = subprocess.run(
        [sys.executable, "-c", _CHILD, root, json.dumps(names)],
        capture_output=True, text=True, timeout=1200, env=env,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    sys.stderr.write(p.stdout[-2000:] + p.stderr[-4000:])
    raise RuntimeError(f"side {root} produced no result")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old", required=True, help="worktree dir of the old code")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    mins: dict[str, dict[str, float]] = {"new": {}, "old": {}}
    alls: dict[str, dict[str, list[float]]] = {"new": {}, "old": {}}
    for rep in range(args.reps):
        for side, root in (("new", _ROOT), ("old", args.old)):
            res = run_side(root, args.names)
            for n, t in res.items():
                alls[side].setdefault(n, []).append(t)
                cur = mins[side].get(n)
                mins[side][n] = t if cur is None else min(cur, t)
            print(f"rep {rep} {side}: {res}", flush=True)
    summary = {
        n: {
            "new_min": mins["new"][n],
            "old_min": mins["old"][n],
            "new_all": alls["new"][n],
            "old_all": alls["old"][n],
        }
        for n in args.names
    }
    print(json.dumps(summary, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
