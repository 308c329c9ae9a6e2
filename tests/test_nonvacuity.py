"""Flag-column non-vacuity sweep — the mechanical complement to the
shared-oracle hash compare.

Round-7 lesson (semdedup): the hash compare is STRUCTURALLY blind to
bugs written into both the Spark plan and the oracle SQL at once — a
thresholded flag that never fires on the fixture is untested no
matter how green the hash (semdedup shipped with an unsatisfiable
cosine test and ``n_dups`` identically zero; every gate stayed
green). This module systematizes the fix: every registered query's
flag/thresholded output column must demonstrably execute BOTH
branches — on the sf0.01 fixture where the data reaches both, or on
a pinned constructed input where it cannot.

Three registries, and a completeness leg that re-derives the
candidate set (BooleanType columns + flag-ish name pattern) from
every registered query's output schema and fails on any column not
accounted for — a NEW flag column cannot ship without coverage.
"""

from __future__ import annotations

import re

import pytest

from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
from tests.oracle_check import compare

SF = "/root/testdata/sf0.01"

# Columns whose both-branch coverage the sf0.01 fixture itself
# provides. kind "bool": both true and false occur; kind "posneg":
# >= 1 row with value > 0 and >= 1 row with value <= 0.
FIXTURE_BOTH: dict[str, list[tuple[str, str]]] = {
    "ann_recall": [("n_hits", "posneg")],
    "blocklist_scan": [("dropped", "bool")],
    "chunk_dedup": [("dup_block_frac", "posneg"), ("keep", "bool")],
    "company_enrich": [("fetch_error", "bool")],
    "constraint_audit": [("n_violations", "posneg")],
    "decontaminate": [("n_hits", "posneg"), ("contaminated", "bool")],
    "doc_repetition": [("dup_token_frac", "posneg"), ("keep", "bool")],
    "dup_span_fraction": [("dup_toks", "posneg"), ("dup_frac", "posneg")],
    "embedding_dedup": [("is_survivor", "bool")],
    # threshold calibrated to the fixture's measured cosine range
    # (plans/drift.py module docstring) so both branches execute
    "embedding_centroid_drift": [("drifted", "bool")],
    "event_funnel": [("clicked_after", "bool"), ("purchased_after", "bool")],
    "scd1_merge": [("name_updated", "bool"), ("sector_updated", "bool")],
    "scd1_sentinel_merge": [
        ("name_updated", "bool"), ("sector_updated", "bool")
    ],
    "scd2_history": [("is_current", "bool")],
    "schema_evolution": [("has_quality", "bool")],
    "sentinel_parity": [
        ("name_missing", "bool"),
        ("sector_missing", "bool"),
        ("url_missing", "bool"),
    ],
    "stream_blocklist": [("dropped", "bool")],
    "zone_map_prune": [("prune_permille", "posneg")],
    "zorder_benefit": [("prune_permille", "posneg")],
}

# Columns one of whose branches the fixture cannot reach; the named
# test in this repo pins the missing branch on a constructed input.
# test_registry_covers_every_flag_column asserts the referenced test
# function still exists (the pointer cannot rot).
CONSTRUCTED: dict[tuple[str, str], str] = {
    # fixture embeddings are all valid; the invalid branch needs
    # malformed vectors
    ("embedding_stats", "is_valid"):
        "tests.test_nonvacuity:test_embedding_stats_invalid_branch",
    # every fixture user has a first view; saw=false needs a
    # view-less user
    ("event_funnel", "saw"):
        "tests.test_nonvacuity:test_event_funnel_saw_false_branch",
    # the fixture is referentially intact; orphans need hostile FKs
    ("fk_orphan_audit", "n_orphans"):
        "tests.test_nonvacuity:test_fk_orphans_fire_on_hostile_fixture",
    ("fk_orphan_audit", "n_orphan_keys"):
        "tests.test_nonvacuity:test_fk_orphans_fire_on_hostile_fixture",
    # every fixture event type has >= 1 point outside the 3-MAD
    # fence; the zero branch needs a constant-value group
    ("robust_outliers", "n_outliers"):
        "tests.test_nonvacuity:test_robust_outliers_zero_branch",
    # every fixture cluster flags >= 1 dup; singleton / well-separated
    # clusters pin n_dups = 0 in the round-7 regression test
    ("semdedup", "n_dups"):
        "tests.test_clustering:test_semdedup_flags_medoid_duplicates",
    # the fixture events stream is rule-clean; the violation branch
    # fires on the hostile hourly-window fixture
    ("stream_constraint_audit", "n_violations"):
        "tests.test_streaming:test_stream_constraint_audit_hostile_window",
}

# Name-pattern matches that are NOT flag/thresholded CASE outputs —
# each with the reason it needs no branch sweep.
WHITELIST: dict[tuple[str, str], str] = {
    # TPC-H categorical return code (A/N/R), not a boolean flag; all
    # three values occur on the fixture and the hash pins them
    ("pricing_summary", "l_returnflag"): "categorical code, not a flag",
    # intersection cardinality |PQ top-k ∩ exact top-k| — a count
    # with no CASE/threshold in the plan; the zero-overlap case is
    # covered by ann_recall's n_hits (same recall-join shape, zero
    # rows on the fixture) and forcing PQ itself to zero recall
    # would need a degenerate codebook, not a data edge
    ("pq_recall", "n_hits"): "count column, zero covered by ann_recall",
}

# The candidate detector: BooleanType columns are always candidates;
# otherwise a column is a candidate iff its name matches this (the
# discovery pattern the registries were curated from).
_FLAG_NAME = re.compile(
    r"(^|_)(n|num)_(dup|orphan|viol|hit|match|flag|bad|drop|prune)"
    r"|flag|is_|has_|_hit|prune|violat|orphan|anomal|outlier"
    r"|blocked|decision|verdict|kept|dropped|dup",
    re.I,
)


def _plan_df(spark, name):
    # share the one-build-per-query cache with the plan guards
    from tests.test_plan_guards import _plan_df as cached

    return cached(spark, name)


def test_registry_covers_every_flag_column(spark):
    """Completeness: every candidate flag column of every registered
    query appears in exactly one registry; referenced constructed
    tests exist."""
    from pyspark.sql.types import BooleanType

    covered = {
        (q, c) for q, cols in FIXTURE_BOTH.items() for c, _ in cols
    } | set(CONSTRUCTED) | set(WHITELIST)
    candidates = set()
    for name in sorted(QUERIES):
        for f in _plan_df(spark, name).schema.fields:
            if isinstance(f.dataType, BooleanType) or _FLAG_NAME.search(
                f.name
            ):
                candidates.add((name, f.name))
    missing = sorted(candidates - covered)
    assert not missing, (
        f"uncovered flag column(s) {missing} — add a FIXTURE_BOTH "
        "entry (both branches fire at sf0.01), a CONSTRUCTED pointer "
        "to a pinned branch test, or a WHITELIST reason"
    )
    stale = sorted(covered - candidates)
    assert not stale, f"registry entries for vanished columns: {stale}"
    # referenced constructed tests must exist
    import importlib

    for ref in set(CONSTRUCTED.values()):
        mod_name, fn_name = ref.split(":")
        assert hasattr(importlib.import_module(mod_name), fn_name), ref


@pytest.mark.parametrize("name", sorted(FIXTURE_BOTH))
def test_both_branches_fire_on_fixture(spark, name):
    from pyspark.sql import functions as F

    aggs = []
    for col, kind in FIXTURE_BOTH[name]:
        if kind == "bool":
            aggs.append(
                F.sum(F.when(F.col(col), 1).otherwise(0)).alias(col + "_t")
            )
            aggs.append(
                F.sum(F.when(~F.col(col), 1).otherwise(0)).alias(col + "_f")
            )
        else:
            aggs.append(
                F.sum(F.when(F.col(col) > 0, 1).otherwise(0)).alias(
                    col + "_t"
                )
            )
            aggs.append(
                F.sum(F.when(F.col(col) <= 0, 1).otherwise(0)).alias(
                    col + "_f"
                )
            )
    got = QUERIES[name](spark, SF).agg(*aggs).collect()[0].asDict()
    dead = [k for k, v in got.items() if not v]
    assert not dead, (
        f"{name}: branch(es) {dead} never fire on the sf0.01 fixture "
        "— the oracle hash cannot see a both-sides bug in a branch "
        "that never executes; recalibrate the threshold or move the "
        "column to CONSTRUCTED with a pinned branch test"
    )


# --- constructed inputs for fixture-unreachable branches ----------------------


def test_embedding_stats_invalid_branch(spark, tmp_path):
    """NULL vector, wrong dimension, NaN component, out-of-bound
    component: all four invalid shapes report is_valid=false with
    NULL stats — and the hostile input still hash-matches DuckDB."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    dim = 64
    good = [0.1] * dim
    pq.write_table(
        pa.table({
            "vec_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "embedding": pa.array(
                [good, None, [0.1] * (dim - 1),
                 [float("nan")] + [0.1] * (dim - 1),
                 [200.0] + [0.1] * (dim - 1)],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0] * 5, pa.int32()),
        }),
        f"{tmp_path}/embeddings.parquet",
    )
    _link_base(str(tmp_path))
    rows = {r.vec_id: r for r in QUERIES["embedding_stats"](
        spark, str(tmp_path)).collect()}
    assert rows[1].is_valid and rows[1].l2norm is not None
    for vid in (2, 3, 4, 5):
        assert not rows[vid].is_valid, vid
        assert rows[vid].l2norm is None and rows[vid].q8_sum is None, vid
    ok, msg = compare(
        QUERIES["embedding_stats"](spark, str(tmp_path)),
        ORACLE_SQL["embedding_stats"], str(tmp_path),
    )
    assert ok, msg


def _link_base(sf: str) -> None:
    """COPY the untouched sf0.01 tables so the oracle's ten-view
    registration finds every table. Copies, never hard links: a
    test that overwrites a linked path truncates the SHARED inode —
    round 8 corrupted the read-only fixture's part.parquet exactly
    this way (restored from the hostile-probe corpus copies; the
    checksum manifest in test_fixture_contract.py now guards it)."""
    import os
    import shutil

    from tests.oracle_check import TABLES

    for t in TABLES:
        dst = f"{sf}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copy(f"{SF}/{t}.parquet", dst)


def _write_events(tmp_path, rows):
    """rows: list of (event_id, ts, user_id, event_type, value)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([None] * len(rows), pa.string()),
        }),
        f"{tmp_path}/events.parquet",
    )
    _link_base(str(tmp_path))


def test_event_funnel_saw_false_branch(spark, tmp_path):
    """A user with clicks but no view: saw=false (and downstream
    stages false too) — the branch the fixture's view-happy users
    never reach. Oracle-compared on the same constructed input."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def at(m):
        return t0 + dt.timedelta(minutes=m)

    _write_events(tmp_path, [
        (1, at(0), 1, "view", 1.0),
        (2, at(1), 1, "click", 1.0),
        (3, at(2), 1, "purchase", 1.0),
        (4, at(0), 2, "click", 1.0),       # no view: saw = false
        (5, at(1), 2, "purchase", 1.0),
    ])
    rows = {r.user_id: r for r in QUERIES["event_funnel"](
        spark, str(tmp_path)).collect()}
    assert rows[1].saw and rows[1].clicked_after and rows[1].purchased_after
    assert not rows[2].saw and not rows[2].clicked_after
    ok, msg = compare(
        QUERIES["event_funnel"](spark, str(tmp_path)),
        ORACLE_SQL["event_funnel"], str(tmp_path),
    )
    assert ok, msg


def test_fk_orphans_fire_on_hostile_fixture(spark, tmp_path):
    """The referential-integrity audit on the rules suite's hostile
    fixture: the orphaned o_custkey=99 and l_orderkey=7 rows must
    surface as n_orphans/n_orphan_keys > 0 on their edges, NULL refs
    counted separately — and the result stays oracle-green."""
    from tests.test_rules import _write_hostile

    sf = str(tmp_path)
    _write_hostile(sf)
    got = {r.edge: r for r in QUERIES["fk_orphan_audit"](spark, sf).collect()}
    lo = got["lineitem->orders"]
    assert lo.n_orphans == 1 and lo.n_orphan_keys == 1  # l_orderkey=7
    oc = got["orders->customer"]
    assert oc.n_orphans == 1 and oc.n_orphan_keys == 1  # o_custkey=99
    assert oc.n_null_refs == 1                          # the NULL custkey
    ok, msg = compare(
        QUERIES["fk_orphan_audit"](spark, sf),
        ORACLE_SQL["fk_orphan_audit"], sf,
    )
    assert ok, msg


def test_robust_outliers_zero_branch(spark, tmp_path):
    """A constant-value event type has MAD = 0 and zero deviations,
    so NOTHING clears the 3-MAD fence (n_outliers = 0); a second
    type with one wild point fires the positive branch — both
    branches in one constructed table, oracle-compared."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0, 1, "steady", 5.0) for i in range(1, 9)]
    rows += [(i, t0, 1, "spiky", 1.0) for i in range(9, 16)]
    rows.append((16, t0, 1, "spiky", 100.0))
    _write_events(tmp_path, rows)
    got = {r.event_type: r for r in QUERIES["robust_outliers"](
        spark, str(tmp_path)).collect()}
    assert got["steady"].n_outliers == 0
    assert got["steady"].mad_milli == 0
    assert got["spiky"].n_outliers == 1
    ok, msg = compare(
        QUERIES["robust_outliers"](spark, str(tmp_path)),
        ORACLE_SQL["robust_outliers"], str(tmp_path),
    )
    assert ok, msg
