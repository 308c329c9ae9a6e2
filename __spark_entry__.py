"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``psx_data_pipeline_spark``; this module is a
thin adapter over its query registry (psx_data_pipeline_spark/plans/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# Names already driver-verified green in a prior round's CORRECTNESS
# file (round 2 checked exactly the first 50 registered queries).
# The driver's correctness gate caps at 50 queries per round, so
# queries() lists never-yet-verified names FIRST — rotating coverage
# so every registered query gets a driver CORRECTNESS row at least
# once. Locally, tests/test_queries_oracle.py checks ALL queries
# against the same DuckDB oracle every run regardless of this order.
DRIVER_VERIFIED_PRIOR = {
    "pricing_summary", "above_segment_avg", "snapshot_diff",
    "rename_detection", "ticker_sync_changes", "change_log_format",
    "scd1_merge", "update_stats", "latest_per_key", "symbol_normalize",
    "calendar_range", "sentinel_parity", "scd1_sentinel_merge",
    "scd2_history", "ohlc_daily", "daily_returns", "moving_avg",
    "topk_by_volume", "symbol_rollup", "append_cutoff",
    "top_building_orders", "regional_revenue", "rolling_range_7d",
    "price_percentiles", "dedup_exact", "dedup_latest",
    "minhash_lsh_pairs", "simhash_near_pairs", "ngram_jaccard_pairs",
    "dedup_clusters", "keyword_classify", "lang_id", "text_quality",
    "doc_fingerprint", "word_freq", "token_stats", "tfidf_top_terms",
    "doc_chunks", "doc_mask", "corpus_sample", "corpus_curate",
    "cosine_topk", "lsh_bucketed_neighbors", "ivf_topk",
    "embedding_stats", "sessionize_events", "detect_gaps",
    "asof_join_clicks", "skew_salted_counts", "event_type_pivot",
}


# Names whose prior green rows are KNOWN stale as of the given round:
# green in an old round, then broken by a later change (round 3's
# events.ts fixture-type flip) without a failing row of their own in
# the meantime. A name stays out of the "verified" set until the
# driver re-confirms it green in a LATER round than the one recorded
# here (a green row from an earlier round is exactly the stale
# evidence being distrusted).
REVERIFY_AS_OF = {
    "dedup_latest": 3, "sessionize_events": 3, "asof_join_clicks": 3,
}


def _latest_driver_rows(here: str | None = None) -> dict[str, tuple[int, bool]]:
    """name → (round, green) for its MOST RECENT driver row.

    Regression-aware (round-3 lesson): a name's old green row must not
    count once a newer round shows it failing, or the rotation pushes
    a currently-broken query behind the driver's 50-query window and
    the fix is never re-confirmed. Rounds are ordered by the r{N}
    suffix; the latest row wins. Fail-safe: unreadable files
    contribute nothing (the static set above still applies)."""
    import glob
    import json
    import os
    import re

    here = here or os.path.dirname(os.path.abspath(__file__))
    latest: dict[str, tuple[int, bool]] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, r in rows.items():
            if not isinstance(r, dict):
                continue
            green = bool(
                r.get("rows_match")
                and r.get("schema_match")
                and r.get("hash_match") is not False  # rows-only ok
                and not r.get("err")
            )
            if name not in latest or rnd >= latest[name][0]:
                latest[name] = (rnd, green)
    return latest


def _prioritized(d: dict, here: str | None = None) -> dict:
    latest = _latest_driver_rows(here)
    prior = {
        n: rnd for n, (rnd, green) in latest.items()
        if green and rnd > REVERIFY_AS_OF.get(n, 0)
    }
    # the static r2 set vouches only for names with NO file row at all
    # (unreadable files); any recorded row defers to its latest result
    for n in DRIVER_VERIFIED_PRIOR:
        if n not in latest and n not in REVERIFY_AS_OF:
            prior.setdefault(n, 2)
    fresh = {n: v for n, v in d.items() if n not in prior}
    # Oldest-green-first within the already-verified block: the driver
    # re-checks only the first 50 names each round, so emitting `seen`
    # in registration order would let the stalest greens dodge
    # re-verification indefinitely (round 3 showed stale greens rot).
    # Ascending last-verified round (ties by name) guarantees every
    # name cycles back under the driver's oracle within a few rounds.
    seen_names = sorted(
        (n for n in d if n in prior), key=lambda n: (prior[n], n)
    )
    seen = {n: d[n] for n in seen_names}
    return {**fresh, **seen}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    never-driver-verified queries first (see DRIVER_VERIFIED_PRIOR)."""
    return _prioritized(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted ⇒ rows-only check)."""
    return _prioritized(dict(ORACLE_SQL))
