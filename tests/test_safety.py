"""Property pins for the blocklist scan (plans/safety.py): literal
occurrence arithmetic against Python's str.count ground truth, the
zero-hit pattern stays zero, the worst-pattern tie-break, and the
threshold policy."""

from __future__ import annotations

from psx_data_pipeline_spark.plans import QUERIES
from psx_data_pipeline_spark.plans.safety import (
    _BLOCKLIST,
    _MAX_OCC,
    _MAX_PATTERNS,
    blocklist_hits,
)
from psx_data_pipeline_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.01"


def test_occurrence_counts_match_python(spark):
    docs = load_table(spark, "documents", SF).limit(50)
    rows = blocklist_hits(docs).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert rows
    for r in rows:
        t = texts[r["doc_id"]]
        # non-overlapping literal count — replace-arithmetic equals
        # str.count for these patterns
        assert r["occ"] == t.count(r["p"]), (r, t)


def test_unseen_pattern_never_hits_and_policy_holds(spark):
    out = {r["doc_id"]: r for r in QUERIES["blocklist_scan"](spark, SF).collect()}
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, "documents", SF).collect()
        if r["text"] is not None
    }
    assert set(out) == set(docs)
    for doc_id, r in out.items():
        t = docs[doc_id]
        occs = {p: t.count(p) for p in _BLOCKLIST}
        assert occs["zzz unseen"] == 0
        hit = {p: c for p, c in occs.items() if c > 0}
        assert r["n_patterns"] == len(hit), (r, hit)
        assert r["n_occurrences"] == sum(occs.values()), (r, occs)
        if hit:
            m = max(hit.values())
            assert r["worst_pattern"] == min(
                p for p, c in hit.items() if c == m
            ), (r, hit)
        else:
            assert r["worst_pattern"] is None
        assert r["dropped"] == (
            max(occs.values()) > _MAX_OCC or len(hit) > _MAX_PATTERNS
        ), (r, occs)


def test_policy_drops_something_and_keeps_something(spark):
    rows = QUERIES["blocklist_scan"](spark, SF).collect()
    dropped = [r for r in rows if r["dropped"]]
    kept = [r for r in rows if not r["dropped"]]
    # the fixture corpus must exercise both branches of the policy
    assert dropped and kept
