"""Property test for the Misra-Gries mergeable summary behind
heavy_shingles: for ANY stream, ANY batching, and ANY phi, every item
whose exact count exceeds n/phi must survive the summary (the
candidate-superset guarantee the exact recount relies on). Also pins
the bounded-memory contract: the summary never holds ≥ phi counters.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from psx_data_pipeline_spark.plans.spans import mg_summary


@st.composite
def batched_stream(draw):
    items = draw(
        st.lists(st.integers(min_value=0, max_value=9), max_size=300)
    )
    # arbitrary batch boundaries over the same stream
    if not items:
        return items, []
    n_cuts = draw(st.integers(min_value=0, max_value=5))
    cuts = sorted(
        draw(
            st.lists(
                st.integers(min_value=0, max_value=len(items)),
                min_size=n_cuts,
                max_size=n_cuts,
            )
        )
    )
    bounds = [0, *cuts, len(items)]
    batches = [
        Counter(items[a:b]) for a, b in zip(bounds, bounds[1:]) if b > a
    ]
    return items, batches


@given(batched_stream(), st.integers(min_value=2, max_value=8))
@settings(max_examples=300, deadline=None)
def test_heavy_items_always_survive(stream, phi):
    items, batches = stream
    summary = mg_summary(batches, phi)
    exact = Counter(items)
    n = len(items)
    for item, c in exact.items():
        if c * phi > n:
            assert item in summary, (
                f"heavy item {item} (count {c} > {n}/{phi}) dropped"
            )
    assert len(summary) < phi  # bounded memory: at most phi-1 counters


@given(batched_stream(), st.integers(min_value=2, max_value=8))
@settings(max_examples=100, deadline=None)
def test_summary_never_overcounts(stream, phi):
    """MG counts are lower bounds on the exact counts — required for
    the survivor set to be meaningful (undercount-only error)."""
    items, batches = stream
    summary = mg_summary(batches, phi)
    exact = Counter(items)
    for item, c in summary.items():
        assert 0 < c <= exact[item]
