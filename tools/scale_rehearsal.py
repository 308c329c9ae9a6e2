"""Scale rehearsal: build N×-duplicated corpora in /tmp and time every
query family against them.

This is the tool that found round 3's four super-linear bugs (see
SCALE.md "Scale rehearsal"): sf0.1 hides anything that scales with
duplication factor or corpus-derived set sizes. Run it after touching
any dedup/ANN/text operator:

    python tools/scale_rehearsal.py --factor 10 --families dedup ann

Corpora are built to be adversarial: documents/customers duplicate
every row's CONTENT under fresh ids (worst case for similarity
blocking); events/lineitem replicate under fresh keys. Events go
through pyarrow, not DuckDB COPY, so the fixture's exact physical
timestamp type is preserved bit-for-bit (DuckDB COPY normalizes
timestamp types) — the rehearsal must exercise the same ts_us seam
branch (sources/fixtures.ts_us_expr) the driver's fixtures do.

Output: one line per query, `name: seconds` (or FAILED + error), and
a final JSON summary. Success criterion is judgement, not assertion:
a family is healthy when its times are ~factor× its sf0.1 times or
better.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"

FAMILIES = {
    "dedup": [
        "dedup_exact", "dedup_incremental", "dedup_bucket_prefilter",
        "minhash_incremental", "chunk_dedup", "doc_repetition",
        "decontaminate", "simhash_near_pairs", "minhash_lsh_pairs",
        "ngram_jaccard_pairs", "dedup_clusters",
    ],
    "text": [
        "keyword_classify", "lang_id", "text_quality", "doc_fingerprint",
        "word_freq", "token_stats", "tfidf_top_terms", "doc_chunks",
        "doc_mask", "corpus_sample", "corpus_curate", "word_pmi", "oov_rate",
        "token_budget_sample", "sequence_pack", "quality_tiles",
        "source_temperature_weights", "domain_cap", "unigram_logprob",
        "dup_span_fraction", "heavy_shingles", "token_entropy",
        "dsir_weights", "source_overlap", "bm25_scores",
        "shard_manifest", "vocab_sketch", "vocab_overlap_sketch",
        "rrf_fusion", "bpe_pair_counts", "blocklist_scan",
        "corpus_diff", "bigram_perplexity", "perplexity_buckets",
        "weighted_sample", "inverted_index", "mixing_schedule",
        "winnowing_fingerprints", "retrieval_eval", "histogram_quantiles",
        "lang_confusion", "ngram_novelty", "pii_scan", "boilerplate_prefix",
    ],
    "ann": [
        "cosine_topk", "lsh_bucketed_neighbors", "ivf_topk",
        "embedding_stats", "embedding_dedup", "embedding_quantize",
        "ann_recall", "neighbor_triangles", "pagerank_sim",
        "pq_adc_topk", "pq_recall", "minhash_calibration",
        "kmeans_topics", "hard_negatives", "embedding_outliers",
        "semdedup", "embedding_centroid_drift",
    ],
    "events": [
        "sessionize_events", "detect_gaps", "asof_join_clicks",
        "range_join_binned",
        "skew_salted_counts", "event_type_pivot", "event_funnel",
        "user_retention", "event_props_json", "event_cube",
        "resample_ffill",
        "stream_window_counts", "stream_sessionize", "stream_user_totals",
        "stream_click_attribution", "stream_dedup",
        "ivm_user_totals", "zorder_layout", "stream_constraint_audit",
        "k_anonymity_audit", "pseudonymize", "stream_pseudonymize",
        "l_diversity_audit", "label_vote", "item_cooccurrence",
        "event_transitions", "stream_label_vote", "conversion_lag",
        "seasonal_baseline", "zorder_benefit",
    ],
    "multimodal": [
        "multimodal_features", "frame_sample", "image_decode",
        "stream_image_decode", "audio_decode", "video_decode",
        "stream_video_decode", "image_near_dup", "stream_image_near_dup",
    ],
    "scrape": [
        "market_watch_parse", "company_enrich", "fallback_source",
        "url_normalize", "date_roundtrip", "first_run_bootstrap",
    ],
    "relational": [
        "constraint_audit", "compaction_plan", "cdc_apply", "zone_map_prune",
        "vacuum_plan", "min_cost_supplier", "join_skew_audit",
        "small_order_revenue", "late_order_priority", "stream_zone_maps", "run_compress", "pit_enrich",
        "pricing_summary", "above_segment_avg", "top_building_orders",
        "regional_revenue", "ohlc_daily", "daily_returns", "moving_avg",
        "rolling_range_7d", "topk_by_volume", "price_percentiles",
        "append_cutoff", "ohlc_missing_days", "brand_revenue_share",
        "symbol_rollup", "calendar_range", "bucketed_join",
        "fuzzy_name_linkage", "bloom_semijoin", "ewma_prices",
        "tpch_q5_local_supply", "tpch_q18_large_orders",
        "tpch_q7_volume_shipping", "tpch_q10_returned_items",
        "tpch_q21_waiting_supplier", "brand_supplier_diversity",
        "tpch_q8_market_share", "tpch_q13_customer_distribution",
        "tpch_q14_promo_share", "tpch_q19_discounted_revenue",
        "tpch_q22_sales_opportunity",
        "tpch_q6_forecast_revenue", "tpch_q9_product_profit",
        "tpch_q11_important_parts", "tpch_q12_lateness_priority",
        "tpch_q15_top_supplier", "tpch_q20_surplus_suppliers",
        "fk_orphan_audit",
    ],
    "ticker": [
        "stream_cdc_apply",
        "snapshot_diff", "ticker_sync_changes", "rename_detection",
        "rename_detection_parity", "change_log_format", "scd1_merge",
        "scd1_sentinel_merge", "sentinel_parity", "scd2_history",
        "latest_per_key", "dedup_latest", "update_stats",
        "symbol_normalize",
    ],
    "streamjobs": [
        "stream_incremental_ingest", "stream_sync_change_log",
        "stream_vocab_sketch", "stream_blocklist", "stream_pii_scan",
    ],
    "io": [
        "csv_sink_roundtrip", "json_snapshot_latest",
        "partitioned_overwrite_idempotent", "schema_evolution",
        "orc_sink_roundtrip",
    ],
    "distrib": [
        "count_min_hitters", "group_quantiles", "stratified_sample",
        "ks_drift", "robust_outliers", "stream_heavy_hitters",
        "split_assign", "quantile_calibrate",
    ],
}


def build_corpus(
    out_dir: str,
    factor: int,
    hot_frac: float = 0.0,
    giant_doc_tokens: int = 0,
    distinct_texts: bool = False,
) -> None:
    import duckdb

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{BASE}/documents.parquet'"
    ).fetchone()[0]
    # --distinct-texts: append one doc-unique token to every text, so
    # NO two documents are byte-identical and the vocabulary grows
    # with the corpus — disables every exact-dup-collapse fast path
    # and measures the honest per-distinct-text sketch cost
    text_expr = (
        "text || ' u' || CAST(doc_id + {0} * i AS VARCHAR)".format(n_docs)
        if distinct_texts
        else "text"
    )
    giant_sql = ""
    if giant_doc_tokens > 0:
        # ONE pathological document (default docs run ~50 tokens):
        # the adversarial shape for per-doc array work (sorts,
        # shingle explodes, chunkers). Deterministic token stream
        # cycling the base vocabulary with a quadratic stride so
        # bigrams vary (a pure phrase repeat would only stress the
        # dedup counters, not the per-doc machinery).
        vocab = [
            r[0]
            for r in duckdb.sql(
                "SELECT DISTINCT unnest(string_split(text, ' ')) AS w "
                f"FROM '{BASE}/documents.parquet' "
                "WHERE text IS NOT NULL ORDER BY w"
            ).fetchall()
            if r[0]
        ]
        v = len(vocab)
        text = " ".join(
            vocab[(i * i + i) % v] for i in range(giant_doc_tokens)
        ).replace("'", "")
        giant_sql = f"""
            UNION ALL
            SELECT {factor * n_docs + 1} AS doc_id, '{text}' AS text,
                   'en' AS lang, 'giant' AS source,
                   {len(text)} AS n_chars"""
    duckdb.sql(f"""
        COPY (SELECT doc_id + {n_docs} * i AS doc_id,
                     {text_expr} AS text, lang, source, n_chars
              FROM '{BASE}/documents.parquet',
                   UNNEST(range(0, {factor})) AS t(i)
              {giant_sql})
        TO '{out_dir}/documents.parquet' (FORMAT PARQUET)""")
    duckdb.sql(f"""
        COPY (SELECT vec_id + 2000 * i AS vec_id, embedding, label
              FROM '{BASE}/embeddings.parquet',
                   UNNEST(range(0, {factor})) AS t(i))
        TO '{out_dir}/embeddings.parquet' (FORMAT PARQUET)""")
    duckdb.sql(f"""
        COPY (SELECT c_custkey + 15000 * i AS c_custkey,
                     c_name || '-' || CAST(i AS VARCHAR) AS c_name,
                     c_acctbal, c_mktsegment, c_nationkey
              FROM '{BASE}/customer.parquet',
                   UNNEST(range(0, {factor})) AS t(i))
        TO '{out_dir}/customer.parquet' (FORMAT PARQUET)""")
    duckdb.sql(f"""
        COPY (SELECT l_orderkey + 600000 * i AS l_orderkey, l_partkey,
                     l_suppkey, l_linenumber, l_quantity, l_extendedprice,
                     l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
              FROM '{BASE}/lineitem.parquet',
                   UNNEST(range(0, {factor})) AS t(i))
        TO '{out_dir}/lineitem.parquet' (FORMAT PARQUET)""")
    duckdb.sql(f"""
        COPY (SELECT o_orderkey + 600000 * i AS o_orderkey, o_custkey,
                     o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
              FROM '{BASE}/orders.parquet',
                   UNNEST(range(0, {factor})) AS t(i))
        TO '{out_dir}/orders.parquet' (FORMAT PARQUET)""")
    # events: pyarrow to preserve the exact physical timestamp type
    t = pq.read_table(f"{BASE}/events.parquet")
    parts = []
    for i in range(factor):
        uid = pc.add(t["user_id"], 1_000 * i)
        if hot_frac > 0.0:
            # hot-key skew: route a fraction of every replica's rows
            # to user 1 — the adversarial shape for per-key windows
            # (sessionize, retention) and stateful streaming keys
            import numpy as np

            k = max(2, int(round(1.0 / hot_frac)))
            hot = pa.array(
                np.asarray(t["event_id"].combine_chunks()) % k == 0
            )
            uid = pc.if_else(hot, pa.scalar(1, pa.int64()), uid)
        parts.append(pa.table({
            "event_id": pc.add(t["event_id"], 100_000 * i),
            "ts": t["ts"],
            "user_id": uid,
            "event_type": t["event_type"],
            "value": t["value"],
            "props": t["props"],
        }))
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/events.parquet")
    # part: replicate rows under fresh keys but IDENTICAL names — the
    # linkage worst case (dirty feed grows Nx against a constant
    # master dictionary); i=0 keeps the original keys so l_partkey
    # joins stay valid
    duckdb.sql(f"""
        COPY (SELECT p_partkey + 2000 * i AS p_partkey, p_name, p_brand,
                     p_type, p_size, p_retailprice
              FROM '{BASE}/part.parquet',
                   UNNEST(range(0, {factor})) AS t(i))
        TO '{out_dir}/part.parquet' (FORMAT PARQUET)""")
    for name in ("region", "nation", "supplier"):
        dst = f"{out_dir}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{BASE}/{name}.parquet", dst)


def _ratio_sweep(factor: int, threshold: float) -> int:
    """Round-12 judge ask #4: run EVERY registered query at 1x and at
    --factor through the same harness, record wall(Nx)/wall(1x) per
    query, re-measure every ratio above --threshold warm (min-of-2 on
    both sides — the sweep charges JVM/codegen warm-up to whichever
    query it reaches cold; round-9 lesson: zorder_layout read 15.0 s
    in-sweep vs 5.6 s warm), and write REHEARSAL_RATIO.json. Anything
    still above threshold after the warm re-measure needs a pinned
    explanation or a fix (SCALE.md carries the ledger).

    Memo policy mirrors bench.py: session memos (and their Spark
    cache entries) are dropped before each memo-OWNER so its wall is
    the cold build at BOTH factors; consumers run after their owner
    in family order, so their walls are warm at both factors — the
    ratio is like-for-like either way."""
    from psx_data_pipeline_spark.plans import (
        MEMO_OWNERS,
        QUERIES,
        clear_session_memos,
    )
    from psx_data_pipeline_spark.session import get_spark

    dirs = {}
    for f in (1, factor):
        d = f"/tmp/rehearsal_{f}x"
        if not os.path.isdir(d):
            print(f"building {f}x corpus in {d} ...", flush=True)
            build_corpus(d, f)
        dirs[f] = d

    spark = get_spark("rehearsal-ratio")
    spark.sparkContext.setLogLevel("ERROR")
    names = [n for fam in sorted(FAMILIES) for n in FAMILIES[fam]]

    def run_once(name: str, sf_dir: str) -> float:
        if name in MEMO_OWNERS:
            clear_session_memos()
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 2)

    walls: dict[int, dict[str, float]] = {1: {}, factor: {}}
    failed: dict[str, str] = {}
    for f in (1, factor):
        # warm IO + one unmeasured query so JIT isn't charged to the
        # first measured name (bench.py's policy)
        for fn in os.listdir(dirs[f]):
            if fn.endswith(".parquet"):
                spark.read.parquet(f"{dirs[f]}/{fn}").write.format(
                    "noop").mode("overwrite").save()
        try:
            run_once(names[0], dirs[f])
        except Exception:
            pass
        for name in names:
            try:
                walls[f][name] = run_once(name, dirs[f])
                print(f"{f}x {name}: {walls[f][name]} s", flush=True)
            except Exception as exc:
                failed[f"{name}@{f}x"] = (
                    f"{type(exc).__name__}: {str(exc)[:200]}")
                print(f"{f}x {name}: FAILED {failed[f'{name}@{f}x']}",
                      flush=True)

    def ratios() -> dict[str, float]:
        return {
            n: round(walls[factor][n] / max(walls[1][n], 0.05), 1)
            for n in names
            if n in walls[1] and n in walls[factor]
        }

    # warm re-measure for the flagged tail, min-of-2 both sides
    for n, r in sorted(ratios().items(), key=lambda kv: -kv[1]):
        if r <= threshold:
            break
        print(f"re-measuring {n} (ratio {r}) warm ...", flush=True)
        for f in (1, factor):
            try:
                walls[f][n] = min(walls[f][n], run_once(n, dirs[f]))
            except Exception:
                pass

    out = {
        "comment": (
            "tools/scale_rehearsal.py --ratio: every registered query "
            "at 1x vs Nx on the duplicated adversarial corpus "
            "(fresh-id content duplication). ratio = wall(Nx)/wall(1x)"
            ", 1x floored at 0.05 s; ratios above the threshold were "
            "re-measured warm min-of-2 on both sides before being "
            "reported. Linear-plus-shuffle budget: anything above "
            f"{threshold} needs a pinned explanation in SCALE.md."
        ),
        "factor": factor,
        "threshold": threshold,
        "wall_1x": {n: walls[1][n] for n in sorted(walls[1])},
        f"wall_{factor}x": {
            n: walls[factor][n] for n in sorted(walls[factor])},
        "ratio": dict(sorted(ratios().items())),
        "over_threshold": {
            n: r for n, r in sorted(ratios().items()) if r > threshold},
        "failed": failed,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "REHEARSAL_RATIO.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({"over_threshold": out["over_threshold"],
                      "n": len(out["ratio"]), "failed": failed}))
    return 1 if failed else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--families", nargs="*", default=sorted(FAMILIES))
    ap.add_argument("--ratio", action="store_true",
                    help="sweep EVERY query at 1x and --factor, write "
                         "REHEARSAL_RATIO.json with per-query ratios")
    ap.add_argument("--threshold", type=float, default=15.0,
                    help="ratio above which a query is re-measured "
                         "warm and then reported as an outlier")
    ap.add_argument("--dir", default=None,
                    help="reuse an existing rehearsal corpus dir")
    ap.add_argument("--hot-frac", type=float, default=0.0,
                    help="route this fraction of events to ONE user "
                         "(hot-key skew probe for per-key windows / "
                         "stateful streaming)")
    ap.add_argument("--queries", nargs="*", default=None,
                    help="run exactly these query names (overrides "
                         "--families)")
    ap.add_argument("--giant-doc-tokens", type=int, default=0,
                    help="append ONE document with this many tokens "
                         "(pathological-document skew probe for "
                         "per-doc array operators)")
    ap.add_argument("--distinct-texts", action="store_true",
                    help="make every document byte-unique (defeats "
                         "exact-dup collapse; honest per-distinct-"
                         "text sketch cost)")
    args = ap.parse_args()

    if args.ratio:
        return _ratio_sweep(args.factor, args.threshold)

    tag = f"_hot{int(args.hot_frac * 100)}" if args.hot_frac else ""
    if args.giant_doc_tokens:
        tag += f"_giant{args.giant_doc_tokens // 1000}k"
    if args.distinct_texts:
        tag += "_distinct"
    out_dir = args.dir or f"/tmp/rehearsal_{args.factor}x{tag}"
    if not args.dir or not os.path.isdir(out_dir):
        print(f"building {args.factor}x corpus in {out_dir} ...", flush=True)
        build_corpus(out_dir, args.factor, args.hot_frac,
                     args.giant_doc_tokens, args.distinct_texts)

    from psx_data_pipeline_spark.plans import QUERIES
    from psx_data_pipeline_spark.session import get_spark

    spark = get_spark("rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the page cache so times measure compute
    for f in os.listdir(out_dir):
        if f.endswith(".parquet"):
            spark.read.parquet(f"{out_dir}/{f}").write.format("noop").mode(
                "overwrite"
            ).save()

    timings: dict[str, float] = {}
    failed: dict[str, str] = {}
    names = (
        args.queries
        if args.queries
        else [n for fam in args.families for n in FAMILIES[fam]]
    )
    for name in names:
        t0 = time.perf_counter()
        try:
            QUERIES[name](spark, out_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            timings[name] = round(time.perf_counter() - t0, 1)
            print(f"{name}: {timings[name]} s", flush=True)
        except Exception as exc:  # keep rehearsing the rest
            failed[name] = f"{type(exc).__name__}: {str(exc)[:200]}"
            print(f"{name}: FAILED {failed[name]}", flush=True)
    print(json.dumps({"factor": args.factor, "queries": timings,
                      "failed": failed}))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
