"""Streaming-twin diff probe (round-10 judge ask #6): replay every
SALTED hostile corpus through each `stream_*` query AND its batch
sibling, and require row-for-row identical output.

The per-round driver gate and the hostile probes compare each query
against its DuckDB oracle independently — which leaves one blind
spot: a stream twin and its batch sibling share operators but own
their sinks, triggers, and state machinery (`streaming/jobs.py`), so
the two can drift apart in exactly the degenerate-input corners the
oracles' shared SQL doesn't pin (the `stream_cdc_apply` vs
`cdc_apply` duplicate-seq tiebreak disagreement was precisely such a
case — caught once, by hand). This probe generalizes that catch
mechanically: for every (batch, stream) pair, and every hostile
corpus whose salted tables the pair reads, BOTH versions run on the
SAME salted input and their collected outputs are compared as
canonical multisets (the driver's own row canonicalization, from
tests/oracle_check). Any diff is a real batch-vs-stream semantic
divergence — per-engine oracle green cannot excuse it.

Usage:
    python tools/stream_twin_probe.py
    python tools/stream_twin_probe.py --pairs cdc_apply label_vote
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# batch name -> the fixture tables its plan consumes (from the
# oracle SQL; frozen here so the mapping is reviewable at a glance)
PAIR_TABLES = {
    "image_decode": {"documents"},
    "image_near_dup": {"documents"},
    "vocab_sketch": {"documents"},
    "video_decode": {"documents"},
    "pii_scan": {"documents"},
    "constraint_audit": {"customer", "orders", "lineitem", "events"},
    "pseudonymize": {"events"},
    "label_vote": {"events"},
    "cdc_apply": {"customer"},
    # round-12 (judge ask #5): the four remaining pairable twins
    "count_min_hitters": {"documents"},
    "change_log_format": {"customer"},
    "zone_map_prune": {"lineitem"},
    "dedup_latest": {"events"},
}

# stream twin name when it is not simply f"stream_{batch}"
STREAM_OF = {
    "count_min_hitters": "stream_heavy_hitters",
    "change_log_format": "stream_sync_change_log",
    "zone_map_prune": "stream_zone_maps",
    "dedup_latest": "stream_dedup",
}

# probe module -> tables it salts (the corpus builders under tools/)
CORPORA = {
    "hostile_text_probe": {"documents"},
    "hostile_events_probe": {"events", "embeddings"},
    "hostile_ticker_probe": {"customer"},
    "hostile_relational_probe": {
        "customer", "orders", "lineitem", "part", "supplier"},
    "hostile_orders_probe": {"orders"},
    # duplicate/NULL/negative primary keys (round 12 added negatives)
    "hostile_id_probe": {"documents", "embeddings", "events"},
}


# --- reconcilers ------------------------------------------------------------
# Three twins differ from their batch sibling in OUTPUT SHAPE by
# design (each carries its own driver oracle); raw equality would
# only re-diff the design. Each reconciler maps both sides onto the
# shared semantic core so the probe still pins batch==stream there.


def _rec_pseudonymize(spark, b_df, s_df, sf_dir):
    """Stream emits tokenized ROWS (raw ids never land); batch emits
    the per-token activity AGGREGATE. Rolling the stream rows up by
    token must reproduce the batch aggregate exactly."""
    from pyspark.sql import functions as F

    s_agg = s_df.groupBy("user_token").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
        F.sum("value_k").cast("long").alias("value_k"),
    )
    return b_df, s_agg


def _rec_image_near_dup(spark, b_df, s_df, sf_dir):
    """Stream probes odd-id arrivals against the even-id store; batch
    self-joins the full corpus. Restricted to cross-parity pairs and
    normalized to (lo, hi), the two must emit the SAME pair set."""
    from pyspark.sql import functions as F

    b_x = b_df.where(
        (F.col("id_a") % 2) != (F.col("id_b") % 2)
    ).select(
        F.least("id_a", "id_b").alias("lo"),
        F.greatest("id_a", "id_b").alias("hi"),
        "hamming",
    )
    s_x = s_df.select(
        F.least("store_id", "stream_id").alias("lo"),
        F.greatest("store_id", "stream_id").alias("hi"),
        "hamming",
    )
    return b_x, s_x


def _rec_constraint_audit(spark, b_df, s_df, sf_dir):
    """Stream audits hourly WINDOWS (a NULL-ts row belongs to none);
    batch audits the full table. For the two rules both sides run,
    summing the stream windows and adding back the NULL-ts rows'
    contribution (measured independently from the corpus) must
    reproduce the batch totals exactly."""
    from pyspark.sql import functions as F

    common = ("events.user_id.complete", "events.value.finite")
    b_c = b_df.where(F.col("rule_id").isin(*common)).select(
        "rule_id", "n_checked", "n_violations")
    nullts = spark.read.parquet(f"{sf_dir}/events.parquet").where(
        F.col("ts").isNull())
    nonfinite = F.col("value").isNotNull() & (
        F.isnan("value") | (F.col("value") == float("inf"))
        | (F.col("value") == float("-inf")))
    adj = {
        "events.user_id.complete": nullts.where(
            F.col("user_id").isNull()).count(),
        "events.value.finite": nullts.where(nonfinite).count(),
    }
    n_nullts = nullts.count()
    s_tot = s_df.groupBy("rule_id").agg(
        F.sum("n_checked").cast("long").alias("n_checked"),
        F.sum("n_violations").cast("long").alias("n_violations"),
    ).where(F.col("rule_id").isin(*common)).collect()
    rows = [(r.rule_id, r.n_checked + n_nullts,
             r.n_violations + adj[r.rule_id]) for r in s_tot]
    s_c = spark.createDataFrame(
        rows, "rule_id string, n_checked long, n_violations long")
    return b_c, s_c


def _rec_zone_map_prune(spark, b_df, s_df, sf_dir):
    """Stream maintains the MANIFEST continuously; batch emits the
    workload AUDIT over a scan-built manifest. Running the SAME audit
    (plans/skipping.audit_zones — shared code, zero restatement) over
    the streamed manifest must reproduce the batch audit exactly."""
    from psx_data_pipeline_spark.plans.skipping import audit_zones

    return b_df, audit_zones(s_df)


def _rec_change_log(spark, b_df, s_df, sf_dir):
    """Stream replays the sync as two scheduled runs — run 1 diffs
    prev against an EMPTY universe (every prev symbol ADDED, R11
    first-run semantics), run 2 lands the prev→cur delta with no
    rename pass (ids only land in the stream). Batch diffs prev→cur
    once WITH the rename pass. Mapped onto the shared core: stream
    minus the run-1 block, vs batch with each '* old -> new' rename
    expanded back into its '- old' + '+ new' constituents."""
    from pyspark.sql import functions as F

    prev = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .where(F.col("c_custkey") % 5 != 0)
        .select(
            F.concat(F.lit("+ "), F.col("c_custkey").cast("string"))
            .alias("line"))
        .distinct()
    )
    s_run2 = s_df.join(prev, "line", "left_anti")
    renames = b_df.where(F.col("change_type") == "RENAMED").select(
        F.split(F.regexp_replace("line", r"^\* ", ""), " -> ").alias("p")
    )
    b_flat = (
        b_df.where(F.col("change_type") != "RENAMED")
        .select("change_type", "line")
        .unionByName(renames.select(
            F.lit("DELETED").alias("change_type"),
            F.concat(F.lit("- "), F.col("p")[0]).alias("line")))
        .unionByName(renames.select(
            F.lit("ADDED").alias("change_type"),
            F.concat(F.lit("+ "), F.col("p")[1]).alias("line")))
    )
    return b_flat, s_run2


def _rec_dedup_latest(spark, b_df, s_df, sf_dir):
    """Stream ingests exactly-once (distinct projected tuples, NULL/
    pre-epoch ts excluded by the watermark contract); batch keeps the
    LAST event per user over the full table. On the shared domain —
    batch winners whose timestamp the stream contract admits,
    projected to the stream's 4 columns — applying the batch keep-
    last rule to the stream's output must elect the same winners."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    b_c = b_df.where(
        F.col("ts_us").isNotNull() & (F.col("ts_us") >= 0)
    ).select("event_id", "ts_us", "user_id", "event_type")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc_nulls_last()
    )
    s_win = (
        s_df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_id", "ts_us", "user_id", "event_type")
    )
    # a user whose rows are ALL outside the stream contract has a
    # batch winner but no stream rows — already absent here; a user
    # whose batch winner is outside it was dropped from b_c, so
    # restrict the stream side to the same user set. eqNullSafe: the
    # NULL-user group is a real group on both sides (first probe run:
    # a bare semi-join silently dropped the stream's NULL-user winner
    # while the batch side kept its own — a probe artifact, not an
    # engine divergence).
    b_users = b_c.select("user_id").distinct().withColumnRenamed(
        "user_id", "b_user_id")
    s_win = s_win.join(
        b_users, s_win["user_id"].eqNullSafe(b_users["b_user_id"]),
        "left_semi",
    )
    return b_c, s_win


RECONCILERS = {
    "pseudonymize": _rec_pseudonymize,
    "image_near_dup": _rec_image_near_dup,
    "constraint_audit": _rec_constraint_audit,
    "zone_map_prune": _rec_zone_map_prune,
    "change_log_format": _rec_change_log,
    "dedup_latest": _rec_dedup_latest,
}


def _diff(spark, batch: str, stream: str, sf_dir: str) -> str | None:
    from oracle_check import _canon_rows

    from psx_data_pipeline_spark.plans import QUERIES

    b_df = QUERIES[batch](spark, sf_dir)
    s_df = QUERIES[stream](spark, sf_dir)
    if batch in RECONCILERS:
        b_df, s_df = RECONCILERS[batch](spark, b_df, s_df, sf_dir)
    b_cols = [c.lower() for c in b_df.columns]
    s_cols = [c.lower() for c in s_df.columns]
    if sorted(b_cols) != sorted(s_cols):
        return f"schema: batch={sorted(b_cols)} stream={sorted(s_cols)}"
    b = _canon_rows(b_cols, [tuple(r) for r in b_df.collect()])
    s = _canon_rows(s_cols, [tuple(r) for r in s_df.collect()])
    if b != s:
        only_b = [r for r in b if r not in set(s)][:3]
        only_s = [r for r in s if r not in set(b)][:3]
        return (f"rows: batch={len(b)} stream={len(s)};"
                f" only_batch={only_b} only_stream={only_s}")
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", nargs="*", default=None)
    args = ap.parse_args()
    pairs = args.pairs or list(PAIR_TABLES)

    built: dict[str, str] = {}
    for mod_name in CORPORA:
        mod = importlib.import_module(mod_name)
        mod.build_corpus()
        built[mod_name] = mod.OUT

    from psx_data_pipeline_spark.session import get_spark

    spark = get_spark("stream-twin-probe")
    bad: dict[str, str] = {}
    n = 0
    for batch in pairs:
        stream = STREAM_OF.get(batch, f"stream_{batch}")
        for mod_name, salted in CORPORA.items():
            if not (PAIR_TABLES[batch] & salted):
                continue
            n += 1
            tag = f"{stream}~{batch}@{mod_name.replace('hostile_', '').replace('_probe', '')}"
            try:
                msg = _diff(spark, batch, stream, built[mod_name])
            except Exception as exc:  # one-sided crash is also a finding
                msg = f"{type(exc).__name__}: {exc}"
            print(f"{tag}: {'ok' if msg is None else 'TWIN-DIVERGENCE ' + str(msg)[:300]}")
            if msg is not None:
                bad[tag] = str(msg)[:300]
    print(json.dumps({"n": n, "divergent": bad}))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
