"""Pins for item-item co-occurrence (plans/marketbasket.py): counts
match a brute-force recompute, similarity is the exact integer
squared cosine, and the neighbor list is a true top-k."""

from __future__ import annotations

from collections import defaultdict
from itertools import combinations

from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans import QUERIES
from psx_data_pipeline_spark.plans.marketbasket import _N_CATALOG, _TOP_K
from psx_data_pipeline_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.01"


def test_item_cooccurrence_matches_bruteforce(spark):
    rows = QUERIES["item_cooccurrence"](spark, SF).collect()
    assert rows
    ev = load_table(spark, "events", SF).where(
        F.col("user_id").isNotNull() & F.col("event_id").isNotNull()
    ).collect()
    baskets: dict[int, set] = defaultdict(set)
    for e in ev:
        baskets[e.user_id].add(e.event_id % _N_CATALOG)
    co: dict[tuple, int] = defaultdict(int)
    deg: dict[int, int] = defaultdict(int)
    for items in baskets.values():
        for i in items:
            deg[i] += 1
        for i1, i2 in combinations(sorted(items), 2):
            co[(i1, i2)] += 1
    # score every directed candidate, take top-k per item
    cand: dict[int, list] = defaultdict(list)
    for (i1, i2), c in co.items():
        s = c * c * 1000000 // (deg[i1] * deg[i2])
        cand[i1].append((-s, i2, c))
        cand[i2].append((-s, i1, c))
    expected = {}
    for item, lst in cand.items():
        for rank, (negs, nb, c) in enumerate(sorted(lst)[:_TOP_K], 1):
            expected[(item, nb)] = (-negs, c, rank)
    got = {(r.item, r.neighbor): (r.cos2_micro, r.co_users, r.rank)
           for r in rows}
    assert got == expected


def test_item_cooccurrence_topk_bound(spark):
    rows = QUERIES["item_cooccurrence"](spark, SF).collect()
    per_item = defaultdict(list)
    for r in rows:
        per_item[r.item].append(r)
    for item, lst in per_item.items():
        assert len(lst) <= _TOP_K
        ranks = sorted(r.rank for r in lst)
        assert ranks == list(range(1, len(lst) + 1))
        # ranks follow (cos2 desc, neighbor asc)
        ordered = sorted(lst, key=lambda r: (-r.cos2_micro, r.neighbor))
        assert [r.rank for r in ordered] == ranks
