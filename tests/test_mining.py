"""Pins for hard-negative mining (plans/mining.py): negatives are
strictly cross-class, ranked contiguously per query, and NULL-label
rows can neither query nor serve."""

from __future__ import annotations

from collections import defaultdict

from psx_data_pipeline_spark.plans import QUERIES

SF = "/root/testdata/sf0.01"


def test_negatives_are_cross_class_and_ranked(spark):
    rows = QUERIES["hard_negatives"](spark, SF).collect()
    assert rows, "no hard negatives at sf0.01"
    per_q = defaultdict(list)
    for r in rows:
        assert r.query_label != r.neighbor_label
        assert r.query_id != r.neighbor_id
        per_q[r.query_id].append(r)
    for rs in per_q.values():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        # ranked by cosine desc with id tie-break
        for a, b in zip(rs, rs[1:]):
            assert (a.cosine, -a.neighbor_id) >= (b.cosine, -b.neighbor_id)


def test_every_query_has_a_rank_one_negative(spark):
    """Every query that appears has a rank-1 negative and cosines
    stay in [-1, 1] (the quantized dot / norm arithmetic cannot
    overshoot)."""
    rows = QUERIES["hard_negatives"](spark, SF).collect()
    queries = {r.query_id for r in rows}
    best = {r.query_id for r in rows if r.rank == 1}
    assert best == queries
    assert all(-1.0 - 1e-9 <= r.cosine <= 1.0 + 1e-9 for r in rows)
