"""First-run bootstrap (R11) + property-based diff invariants
(SURVEY.md §5): the reference skips the diff on first run
(scrape_tickers.py:650-654); here the same code path degrades
naturally against an empty same-schema snapshot. Hypothesis drives
randomized snapshot pairs through the full diff + rename pipeline and
checks the set-algebra invariants the reference's greedy loop only
satisfied by accident.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from psx_data_pipeline_spark.operators.diff import detect_renames, snapshot_diff

SCHEMA = "symbol STRING, name STRING"

_names = st.text(
    alphabet="abcdefgh ", min_size=0, max_size=20
)
_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=30), _names),
    min_size=0, max_size=12,
    unique_by=lambda r: r[0],
)


def _df(spark, rows):
    data = [(f"S{k}", name) for k, name in rows]
    return spark.createDataFrame(data, SCHEMA)


def test_first_run_bootstrap_all_added(spark):
    cur = _df(spark, [(1, "alpha co"), (2, "beta ltd")])
    empty = spark.createDataFrame([], SCHEMA)
    diff = snapshot_diff(cur, empty, "symbol")
    got = {(r.change_type, r.symbol) for r in diff.collect()}
    assert got == {("ADDED", "S1"), ("ADDED", "S2")}
    # and no renames can exist against an empty previous snapshot
    assert detect_renames(empty, cur, key="symbol").count() == 0


def test_diff_of_identical_snapshots_is_all_common(spark):
    a = _df(spark, [(1, "alpha co"), (2, "beta ltd"), (3, "gamma inc")])
    diff = snapshot_diff(a, a, "symbol")
    assert diff.where(F.col("change_type") != "COMMON").count() == 0
    assert diff.count() == 3


@settings(max_examples=10, deadline=None)
@given(prev_rows=_rows, cur_rows=_rows)
def test_diff_and_rename_invariants(spark, prev_rows, cur_rows):
    prev, cur = _df(spark, prev_rows), _df(spark, cur_rows)
    diff = snapshot_diff(cur, prev, "symbol").cache()
    added = {r.symbol for r in diff.where(F.col("change_type") == "ADDED").collect()}
    deleted = {
        r.symbol for r in diff.where(F.col("change_type") == "DELETED").collect()
    }
    prev_keys = {f"S{k}" for k, _ in prev_rows}
    cur_keys = {f"S{k}" for k, _ in cur_rows}
    # set-difference semantics (reference scrape_tickers.py:586-591)
    assert added == cur_keys - prev_keys
    assert deleted == prev_keys - cur_keys
    assert not (added & deleted)

    del_df = prev.join(cur, "symbol", "left_anti")
    add_df = cur.join(prev, "symbol", "left_anti")
    ren = detect_renames(del_df, add_df, key="symbol").collect()
    # 1:1 assignment: each old key and each new key used at most once,
    # drawn only from the deleted/added residuals
    old_keys = [r.old_key for r in ren]
    new_keys = [r.new_key for r in ren]
    assert len(old_keys) == len(set(old_keys))
    assert len(new_keys) == len(set(new_keys))
    assert set(old_keys) <= deleted
    assert set(new_keys) <= added
    assert len(ren) <= min(len(added), len(deleted))
    diff.unpersist()


def test_asof_join_strict_and_nonstrict(spark):
    from psx_data_pipeline_spark.operators.sessions import asof_join

    left = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 5)], "k LONG, lts LONG"
    )
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 15, "b"), (2, 9, "c")], "k LONG, rts LONG, tag STRING"
    )
    strict = {
        (r["k"], r["lts"]): r["right_tag"]
        for r in asof_join(left, right, "k", "lts", "rts", ["tag"]).collect()
    }
    # at t=10 the t=10 right row is NOT visible (strict <); no earlier row
    assert strict == {(1, 10): None, (1, 20): "b", (2, 5): None}
    loose = {
        (r["k"], r["lts"]): r["right_tag"]
        for r in asof_join(
            left, right, "k", "lts", "rts", ["tag"], strict=False
        ).collect()
    }
    assert loose == {(1, 10): "a", (1, 20): "b", (2, 5): None}


def test_short_name_containment_rename(spark):
    """Round-10 hostile-corpus find: `lambda i, n=n:` inside
    short_grams counted the defaulted param as a second lambda arg,
    silently switching F.transform to its (element, index) form — the
    substring LENGTH became the array index, so the 1..B-1 substring
    set of 'hbl ltd' came out as ['', 'b', 'l ', ...] and short-name
    containment matched NOTHING. Fixtures never have sub-4-char
    names, so every oracle stayed green around the bug. Pin both
    directions and both predicate modes."""
    from psx_data_pipeline_spark.operators.diff import detect_renames

    deleted = spark.createDataFrame([(4, "HBL")], "symbol_id long, name string")
    added = spark.createDataFrame(
        [(104, "HBL Ltd")], "symbol_id long, name string"
    )
    for parity in (False, True):
        got = detect_renames(
            deleted, added, key="symbol_id", name="name", parity=parity
        ).collect()
        assert [(r.old_key, r.new_key) for r in got] == [(4, 104)], parity
    # reverse direction: the short name is on the ADDED side
    deleted2 = spark.createDataFrame(
        [(5, "XYZ Holdings")], "symbol_id long, name string"
    )
    added2 = spark.createDataFrame([(105, "XYZ")], "symbol_id long, name string")
    got2 = detect_renames(deleted2, added2, key="symbol_id", name="name").collect()
    assert [(r.old_key, r.new_key) for r in got2] == [(5, 105)]
