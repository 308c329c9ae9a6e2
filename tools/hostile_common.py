"""Shared harness for the hostile-data probes.

Each probe contributes a corpus builder (salt one or more fixture
tables with adversarial rows under /tmp) and a predicate selecting
which queries' oracles read the salted tables; everything else —
untouched-table copying, the oracle-compare loop, reporting, exit
code — is identical across probes and lives here once.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
from collections.abc import Callable

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

BASE = "/root/testdata/sf0.01"

ALL_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def copy_untouched(out_dir: str, salted: tuple[str, ...]) -> None:
    """Copy every fixture table the probe does NOT salt, verbatim."""
    os.makedirs(out_dir, exist_ok=True)
    for t in ALL_TABLES:
        if t in salted:
            continue
        dst = f"{out_dir}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copy(f"{BASE}/{t}.parquet", dst)


def run_probe(
    build_corpus: Callable[[], None],
    out_dir: str,
    selects_query: Callable[[str], bool],
) -> int:
    """Build the corpus, oracle-compare every selected query, report.

    Any MISMATCH or one-sided crash is a real latent bug in either
    the Spark plan or the oracle SQL. Returns 1 if anything diverged.
    """
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="*", default=None)
    args = ap.parse_args()

    build_corpus()
    from oracle_check import compare

    from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
    from psx_data_pipeline_spark.session import get_spark

    spark = get_spark("hostile-probe")
    names = args.queries or [
        n for n, sql in ORACLE_SQL.items() if selects_query(sql)
    ]
    bad: dict[str, str] = {}
    for name in names:
        try:
            ok, msg = compare(
                QUERIES[name](spark, out_dir), ORACLE_SQL[name], out_dir
            )
        except Exception as exc:  # one-sided crash is also a finding
            ok, msg = False, f"{type(exc).__name__}: {exc}"
        print(f"{name}: {'ok' if ok else 'HOSTILE-DIVERGENCE ' + msg[:300]}")
        if not ok:
            bad[name] = msg[:300]
    print(json.dumps({"n": len(names), "divergent": bad}))
    return 1 if bad else 0
