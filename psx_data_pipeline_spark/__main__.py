"""CLI entry point — the engine twin of the reference's
``python -m psx_data_automation.main`` (reference main.py:40-115).

Same flag surface and exit-code semantics:

- ``--sync-tickers`` / ``--update-ticker-info`` run one stage;
  a standalone stage failure exits 1 (main.py:62-75);
- ``--full-run`` (or no flags, main.py:90) runs the staged DAG under
  the reference's policies: sync failure ABORTS (exit 1,
  main.py:96-98), update failure CONTINUES (exit 0, main.py:102-104);
- ``--daily-update`` runs the incremental append — implemented here
  (the reference logs "not yet implemented", main.py:83-88);
- ``--download-historical`` stays a logged no-op: network fetch is
  out of engine scope (SURVEY.md §7.1), the batch twin is the
  ingest layer.

Engine-specific inputs (fixture dir, output dir, logical run date)
come from flags with environment defaults — the run date is always
caller-supplied, never wall-clock, so backfills are reproducible.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

logger = logging.getLogger(__name__)

__version__ = "0.3.0"


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="psx_data_pipeline_spark")
    p.add_argument("--sync-tickers", action="store_true",
                   help="Sync ticker list (typed change table + change log)")
    p.add_argument("--download-historical", action="store_true",
                   help="Out of engine scope (network) - logged no-op")
    p.add_argument("--daily-update", action="store_true",
                   help="Incremental per-key OHLC append")
    p.add_argument("--update-ticker-info", action="store_true",
                   help="SCD-1 merge of ticker names/sectors")
    p.add_argument("--full-run", action="store_true",
                   help="Execute complete pipeline")
    p.add_argument("--sf-dir",
                   default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                          "/root/testdata/sf0.1"))
    p.add_argument("--out-dir", default="./pipeline_out")
    p.add_argument("--run-date", default=None,
                   help="Logical date (scheduled-run tick); dated "
                        "artifacts + per-date idempotency")
    p.add_argument("--version", action="version",
                   version=f"psx_data_pipeline_spark v{__version__}")
    return p


def main(argv: list[str] | None = None) -> int:
    args = _parser().parse_args(argv)

    from psx_data_pipeline_spark.orchestrate import (
        full_run,
        full_run_stages,
        run_pipeline,
        scheduled_run,
    )
    from psx_data_pipeline_spark.session import get_spark

    spark = get_spark("psx-pipeline")
    stages = {
        s.name: s
        for s in full_run_stages(spark, args.sf_dir, args.out_dir)
    }

    ran_any = False
    for flag, stage_name in (
        ("sync_tickers", "sync"),
        ("update_ticker_info", "update"),
        ("daily_update", "append"),
    ):
        if getattr(args, flag):
            ran_any = True
            result = run_pipeline([stages[stage_name]])
            if result.stages[0].status != "ok":
                logger.error("%s failed", stage_name)
                return 1

    if args.download_historical:
        ran_any = True
        logger.info("historical download is out of engine scope - no-op")

    if args.full_run or not ran_any:
        if args.run_date:
            result = scheduled_run(spark, args.sf_dir, args.out_dir,
                                   args.run_date)
        else:
            result = full_run(spark, args.sf_dir, args.out_dir)
        return 0 if result.ok else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
