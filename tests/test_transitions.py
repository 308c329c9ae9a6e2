"""Pins for the event transition matrix (plans/events.py
q_event_transitions): chains match a brute-force per-user replay and
conditional probabilities are exact milli-ratios."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans import QUERIES
from psx_data_pipeline_spark.sources.fixtures import load_events

SF = "/root/testdata/sf0.01"


def test_event_transitions_match_bruteforce(spark):
    rows = {(r.from_type, r.to_type): r for r in
            QUERIES["event_transitions"](spark, SF).collect()}
    assert rows
    ev = load_events(spark, SF).where(
        F.col("ts_us").isNotNull() & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull() & F.col("event_id").isNotNull()
    ).select("user_id", "ts_us", "event_id", "event_type").collect()
    chains: dict = defaultdict(list)
    for e in ev:
        chains[e.user_id].append((e.ts_us, e.event_id, e.event_type))
    tally: dict = defaultdict(int)
    for seq in chains.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            tally[(a, b)] += 1
    assert set(rows) == set(tally)
    from_totals: dict = defaultdict(int)
    for (a, _), n in tally.items():
        from_totals[a] += n
    for (a, b), r in rows.items():
        assert r.n == tally[(a, b)]
        assert r.prob_milli == r.n * 1000 // from_totals[a]
    # probabilities per from_type sum to <= 1000 (floor rounding)
    by_from: dict = defaultdict(int)
    for r in rows.values():
        by_from[r.from_type] += r.prob_milli
    for tot in by_from.values():
        assert tot <= 1000
