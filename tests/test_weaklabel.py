"""Pins for weak-supervision label aggregation (plans/weaklabel.py):
the winner really is the weighted argmax, margins are non-negative,
and abstentions carry no weight."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans import QUERIES
from psx_data_pipeline_spark.plans.weaklabel import _N_ITEMS
from psx_data_pipeline_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.01"


def test_label_vote_is_weighted_argmax(spark):
    rows = {r.item: r for r in QUERIES["label_vote"](spark, SF).collect()}
    assert rows
    ev = load_table(spark, "events", SF).where(
        F.col("event_id").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    ).collect()
    tally: dict[tuple, int] = defaultdict(int)
    n_votes: dict[int, int] = defaultdict(int)
    for e in ev:
        item = e.event_id % _N_ITEMS
        tally[(item, e.event_type)] += 1 + e.user_id % 3
        n_votes[item] += 1
    for item, r in rows.items():
        labels = {lb: w for (it, lb), w in tally.items() if it == item}
        # winner = max weight, lexicographic tie-break
        best = min(
            labels, key=lambda lb: (-labels[lb], lb)
        )
        assert r.winner == best
        assert r.votes_w == labels[best]
        assert r.n_labels == len(labels)
        assert r.total_votes == n_votes[item]
        runner = sorted(
            (w for lb, w in labels.items() if lb != best), reverse=True
        )
        expected_margin = labels[best] - (runner[0] if runner else 0)
        # margin vs the NEXT row in (votes desc, label asc) order:
        # for a tied top-2, lead() sees the equal weight => margin 0
        assert r.margin >= 0
        if not runner or labels[best] != runner[0]:
            assert r.margin == expected_margin
        else:
            assert r.margin == 0
    # every item with at least one vote is decided
    assert set(rows) == set(n_votes)
