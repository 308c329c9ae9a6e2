"""One-page scale posture: per query, the mechanical facts a 100 TB
review needs — shuffle (Exchange) count and broadcast count read from
the actual physical plan, the family's state-bound argument, and the
measured 1×/10× walls — generated, not hand-maintained.

    python tools/scale_summary.py --tenx /tmp/rehearsal10_r6.json

Writes SCALE_SUMMARY.md (referenced from README). The long-form
evidence (probe findings, per-round sweeps, drift analyses) stays in
SCALE.md; this is the index a reviewer reads first.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Family-level state-bound arguments: why per-executor state and
# shuffle volume stay bounded as the corpus grows. Keyed by the
# rehearsal tool's family map so every query resolves to exactly one.
STATE_BOUNDS = {
    "dedup": "candidates ∝ near-dups via banding/blocking/collapse; never all-pairs",
    "text": "corpus scalars ride as one broadcast row; aggs map-side combinable",
    "ann": "bounded broadcasts (query set / centroids / ranges); bucket- or cell-local joins",
    "events": "per-(user, bin) keys; range join ≤2-bin explode; no global sorts",
    "multimodal": "narrow Arrow batches; payloads stay on executors; per-row error containment",
    "scrape": "universe-bounded snapshots; coalesce ladder is per-row",
    "relational": "partial aggregation + broadcast dims; windows keyed per entity",
    "ticker": "diff/rename tables churn-bounded (day's changes, not the snapshot)",
    "streamjobs": "watermark-bounded state; batch_id-idempotent sinks",
    "io": "sinks coalesced to universe-bounded files; dyn-partition overwrite",
    "distrib": "sketch grids / bin grids / quota tables constant-size; windows over distinct-value counts, never row sorts",
}

_STREAM_PREFIX = "stream_"

# Why a ≥5× growth ratio is the ANSWER or the WORKLOAD growing, not
# the plan degrading — curated from SCALE.md's rehearsal analyses.
# Each entry is (note, cap): growth past the cap trips UNEXPLAINED
# even for a curated name, so a later, larger regression can't hide
# behind an old justification. Caps: output-bound answers may grow
# with the SQUARE of the rehearsal's 10× duplication (cap 16, the
# historical 2×8 envelope); linear-scan work is capped at 10 (at or
# below linear IS the claim); micro-batch streams get 12 for their
# measured ±60-70 % batch-scheduling jitter.
GROWTH_NOTES: dict[str, tuple[str, float]] = {
    "lsh_bucketed_neighbors": ((
        "output-bound: the rehearsal corpus duplicates every vector "
        "10×, so every copy-pair is a true near-dup — answer volume "
        "grows with the SQUARE of duplication (SCALE.md)"
    ), 16.0),
    "pq_adc_topk": ((
        "output-bound: top-k pair expansion under the 10×-duplicated "
        "corpus; the ADC scan itself is linear per row (SCALE.md)"
    ), 16.0),
    "range_join_binned": ((
        "pair density per time bin grows with the duplicated corpus; "
        "the keyless bin explode parallelizes it across bins "
        "(SCALE.md)"
    ), 16.0),
    "cosine_topk": ((
        "brute-force baseline is linear in the corpus BY DEFINITION; "
        "sub-linear measured growth on a ~1.2 s 1× wall that sits in "
        "the pinned jitter class (BENCH_FLOOR re-pin, 1.18-1.77 s)"
    ), 10.0),
    "ivf_topk": ((
        "probed-cell scan grows with the corpus; cell pruning keeps "
        "it sub-linear (5.3× at 10×) — the scale path vs cosine_topk"
    ), 10.0),
    "embedding_dedup": ((
        "hash-group on the quantized vector is linear in the corpus; "
        "10× duplication inflates group sizes, not candidates — "
        "survivors stay constant"
    ), 10.0),
    "pricing_summary": ((
        "TPC-H Q1 full-scan aggregation — work is linear in lineitem "
        "by definition; 5.6× at 10× rows is sub-linear"
    ), 10.0),
    "tpch_q7_volume_shipping": ((
        "multi-dim equi-join + agg, work linear in lineitem; "
        "sub-linear measured (dims broadcast, partial aggs combine)"
    ), 10.0),
    "tpch_q8_market_share": ((
        "same shape as Q7: lineitem-linear join tree behind partial "
        "aggregation; sub-linear measured"
    ), 10.0),
    "stream_pseudonymize": ((
        "per-row micro-batch map, linear; wall dominated by batch "
        "scheduling — stream jitter class (±60-70 %, SCALE.md)"
    ), 12.0),
    "stream_pii_scan": ((
        "per-row regexp_count micro-batch scan, linear; stream "
        "jitter class (±60-70 %, SCALE.md)"
    ), 12.0),
    "zorder_layout": ((
        "two linear scans (range agg broadcast + quantize/union) "
        "into a constant-size bucket agg — work is linear in events; "
        "the ~1 s 1× wall makes the ratio warm-measure sensitive "
        "(15.0 s cold-session vs 5.6 s warm at the same 10×, SCALE.md)"
    ), 10.0),
    "stream_user_totals": ((
        "per-key running totals over watermark-bounded state, "
        "linear; stream jitter class (±60-70 %, SCALE.md — measured "
        "2.0-3.8 s at 1× on identical code)"
    ), 12.0),
    # zero-shuffle per-row text scans: work IS the row count, so 10×
    # rows at ~linear wall is the designed behavior; the sub-second
    # 1× walls make the ratio denominator jitter-sensitive (the
    # sub-second aggregate floor, BENCH_FLOOR.json, guards their
    # absolute drift)
    "lang_id": ((
        "zero-shuffle per-row n-gram scan — row-linear by "
        "definition; 1× wall is sub-second (jitter-sensitive "
        "denominator)"
    ), 10.0),
    "text_quality": ((
        "zero-shuffle per-row ratio scan — row-linear by "
        "definition; 1× wall is sub-second"
    ), 10.0),
    "doc_mask": ((
        "zero-shuffle per-row regexp mask scan — row-linear by "
        "definition; 1× wall is sub-second"
    ), 10.0),
    "token_stats": ((
        "zero-shuffle per-row token-count scan — row-linear by "
        "definition; 1× wall is sub-second"
    ), 10.0),
    "word_freq": ((
        "map-side-combinable token count — work linear in tokens; "
        "1× wall is sub-second"
    ), 10.0),
    "stream_image_near_dup": ((
        "hash-on-ingest probe of a STATIC band index — stateless, "
        "linear in arrivals (the static side is the production "
        "precompute); sub-2 s 1× wall plus stream micro-batch "
        "overhead dominates the ratio (stream jitter class, SCALE.md)"
    ), 12.0),
}
_GROWTH_NOTE_BAR = 5.0


def _plan_counts(df) -> tuple[int, int, bool]:
    """Count exchanges as UNIQUE stripped plan lines: cached subtrees
    (InMemoryRelation) re-print their whole child plan at every
    reference, so raw substring counts explode combinatorially
    (ticker_sync's printed tree is 1.7 MB with 299 nested reprints);
    expression ids keep genuinely distinct exchanges on distinct
    lines, so the unique-line count is the number of distinct
    exchange operators across the plan including one-time cached
    materializations."""
    plan = df._jdf.queryExecution().executedPlan().toString()

    def uniq(pat: str) -> int:
        return len({
            ln.lstrip(" :+-*|(") for ln in plan.splitlines() if pat in ln
        })

    n_exch = (
        uniq("Exchange hashpartitioning")
        + uniq("Exchange rangepartitioning")
        + uniq("Exchange SinglePartition")
    )
    n_bcast = uniq("BroadcastExchange")
    py = bool(re.search(
        r"ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas",
        plan,
    ))
    return n_exch, n_bcast, py


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--tenx", default=None,
                    help="JSON from a 10x scale_rehearsal run")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_SUMMARY.md"))
    args = ap.parse_args()

    from psx_data_pipeline_spark.plans import (
        MEMO_CONSUMERS,
        MEMO_OWNERS,
        QUERIES,
        clear_session_memos,
    )
    from psx_data_pipeline_spark.session import get_spark

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scale_rehearsal import FAMILIES

    family_of = {q: fam for fam, qs in FAMILIES.items() for q in qs}

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench = json.load(open(os.path.join(here, "BENCH_FULL.json")))
    onex = bench["queries"]
    tenx = {}
    if args.tenx and os.path.exists(args.tenx):
        tenx = json.load(open(args.tenx)).get("queries", {})

    spark = get_spark("scale_summary")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for name in QUERIES:
        fam = family_of.get(name, "?")
        t1 = onex.get(name)
        t10 = tenx.get(name)
        if name.startswith(_STREAM_PREFIX):
            shuffles, bcasts, py = "—", "—", "—"
            note = "streaming (micro-batch plan; watermark state)"
        else:
            try:
                clear_session_memos()  # count the true first-run plan
                df = QUERIES[name](spark, args.sf_dir)
                n_exch, n_bcast, has_py = _plan_counts(df)
                shuffles, bcasts = str(n_exch), str(n_bcast)
                py = "yes" if has_py else ""
                note = ""
            except Exception as exc:  # noqa: BLE001 — audit keeps going
                shuffles, bcasts, py = "?", "?", "?"
                note = f"plan build failed: {type(exc).__name__}"
        memo = (
            "owner" if name in MEMO_OWNERS
            else "warm" if name in MEMO_CONSUMERS
            else ""
        )
        growth = (
            f"{t10 / t1:.1f}×" if t1 and t10 else ""
        )
        if memo == "warm" and growth:
            # a warm 1× (memo-hit) against a possibly-cold 10× is not
            # a scale ratio — round 7's semdedup printed "19.2×" while
            # the like-for-like cold/cold growth (SCALE.md) was 1.4×
            growth = f"({growth})"
            note = (note + "; " if note else "") + (
                "1× is a memo-hit wall — growth not like-for-like, "
                "see SCALE.md for the cold/cold ratio"
            )
        high_growth = bool(
            t1 and t10 and t10 / t1 >= _GROWTH_NOTE_BAR and memo != "warm"
        )
        if high_growth:
            # the curated justification only covers the KNOWN ratio
            # up to its cap; a later, larger regression must still
            # trip the warning instead of hiding behind it
            curated = GROWTH_NOTES.get(name)
            if curated and t10 / t1 <= curated[1]:
                note = (note + "; " if note else "") + curated[0]
            else:
                note = (note + "; " if note else "") + (
                    f"UNEXPLAINED ≥{_GROWTH_NOTE_BAR:.0f}× growth — "
                    "investigate before shipping"
                )
                print(f"WARNING: {name} grew {t10 / t1:.1f}× with no "
                      "(current) justification covering that ratio",
                      file=sys.stderr)
        rows.append((name, fam, shuffles, bcasts, py,
                     f"{t1:.2f}" if t1 is not None else "",
                     f"{t10:.1f}" if t10 is not None else "",
                     growth, memo, note))

    lines = [
        "# SCALE_SUMMARY — the one-page 100 TB posture",
        "",
        "Generated by `python tools/scale_summary.py` (do not edit by",
        "hand). Shuffle/broadcast counts are read from each query's",
        "actual physical plan at sf0.001 (plan shape is data-size",
        "independent); 1× is the sf0.1 bench wall (BENCH_FULL.json),",
        "10× the adversarial duplicated-corpus rehearsal. `py` marks a",
        "deliberate Arrow `mapInPandas` stage (codec seam only).",
        "Shuffle counts are of the true first-run plan (session memos",
        "cleared), unique-operator deduped across cached-subtree",
        "reprints. Growth well under 10× = sub-linear. Entries at or",
        "above 5× carry a curated justification in the note column or",
        "an UNEXPLAINED flag, each with a per-name growth cap past",
        "which the flag fires anyway; they are OUTPUT-bound under the",
        "corpus's 10×",
        "content/timestamp duplication (a binned range join's pair",
        "count is quadratic in per-bin density — the output itself",
        "grows ~100×; near-dup pair expansion likewise), plain",
        "linear-scan work (at-or-below-linear is the claim, cap 10),",
        "or sub-second",
        "1× baselines where scheduling noise dominates the ratio —",
        "the per-round rehearsals in SCALE.md track these",
        "case-by-case. Per-family state-bound arguments follow the",
        "table; long-form evidence lives in SCALE.md. The `memo`",
        "column marks session-memo participants (plans.MEMO_OWNERS /",
        "MEMO_CONSUMERS): `owner` walls are measured COLD (bench",
        "clears memos before the re-run), `warm` walls are consumer",
        "views measured against the owner's memo — their growth",
        "ratio is parenthesized because the 1×/10× memo states can",
        "differ and the number is NOT a like-for-like scale ratio.",
        "",
        "| query | family | shuffles | broadcasts | py | 1× s | 10× s | growth | memo | note |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append("| " + " | ".join(str(x) for x in r) + " |")
    lines += ["", "## State bounds (per family)", ""]
    for fam in sorted(STATE_BOUNDS):
        lines.append(f"- **{fam}** — {STATE_BOUNDS[fam]}")
    lines.append("")

    with open(args.out, "w") as fh:
        fh.write("\n".join(lines))
    n_miss = sum(1 for r in rows if r[9])
    print(f"wrote {args.out}: {len(rows)} queries, {n_miss} notes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
