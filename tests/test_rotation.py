"""The driver checks only the first 50 queries() entries per round, so
__spark_entry__ rotates never-verified names to the front. Round 3
proved the failure mode this logic must prevent: a query with an OLD
green row breaks later, sorts to the back on the strength of the stale
green, and the driver never re-confirms the fix. These tests pin the
rotation's semantics against synthetic CORRECTNESS files (no Spark)."""

from __future__ import annotations

import importlib
import json
import sys

sys.path.insert(0, "/root/repo")
entry = importlib.import_module("__spark_entry__")

GREEN = {"rows_match": True, "schema_match": True, "hash_match": True,
         "spark_rows": 1, "oracle_rows": 1, "err": None}
CRASH = {"rows_match": None, "schema_match": None, "hash_match": None,
         "spark_rows": None, "oracle_rows": None, "err": "boom"}
WRONG = {"rows_match": False, "schema_match": True, "hash_match": False,
         "spark_rows": 1, "oracle_rows": 2, "err": None}
ROWS_ONLY = {"rows_match": True, "schema_match": True, "hash_match": None,
             "spark_rows": 1, "oracle_rows": 1, "err": None}


def _write(tmp_path, rnd: int, rows: dict) -> None:
    (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(json.dumps(rows))


def _order(tmp_path, names: list[str]) -> list[str]:
    return list(entry._prioritized({n: n for n in names}, str(tmp_path)))


def test_never_verified_sorts_first(tmp_path):
    _write(tmp_path, 1, {"a": GREEN})
    assert _order(tmp_path, ["a", "b"]) == ["b", "a"]


def test_latest_row_wins_over_stale_green(tmp_path):
    # green in r1, crashed in r2 → must be treated as unverified
    _write(tmp_path, 1, {"a": GREEN, "b": GREEN})
    _write(tmp_path, 2, {"a": CRASH})
    assert _order(tmp_path, ["b", "a"]) == ["a", "b"]


def test_wrong_answer_counts_as_failed(tmp_path):
    # hash-mismatch (not just a crash) also invalidates the old green
    _write(tmp_path, 1, {"a": GREEN, "b": GREEN})
    _write(tmp_path, 2, {"a": WRONG})
    assert _order(tmp_path, ["b", "a"]) == ["a", "b"]


def test_recovery_re_verifies(tmp_path):
    # crash in r2, green again in r3 → verified again
    _write(tmp_path, 1, {"a": GREEN})
    _write(tmp_path, 2, {"a": CRASH})
    _write(tmp_path, 3, {"a": GREEN, "b": GREEN})
    assert _order(tmp_path, ["a", "b", "c"]) == ["c", "a", "b"]


def test_rows_only_checks_count_as_green(tmp_path):
    _write(tmp_path, 1, {"a": ROWS_ONLY, "b": GREEN})
    assert _order(tmp_path, ["a", "b", "c"]) == ["c", "a", "b"]


def test_reverify_distrusts_greens_up_to_the_recorded_round(tmp_path):
    # the round-3 scenario: green rows exist (r2) but the query is
    # KNOWN broken as of round 3 with no driver row showing it —
    # REVERIFY_AS_OF must front-load it...
    name = "dedup_latest"
    assert entry.REVERIFY_AS_OF.get(name) == 3
    _write(tmp_path, 2, {name: GREEN, "verified_peer": GREEN})
    order = _order(tmp_path, ["verified_peer", name])
    assert order.index(name) < order.index("verified_peer")
    # ...until a LATER round's green row exists, after which the name
    # is trusted again and rotates to the back
    _write(tmp_path, 4, {name: GREEN})
    assert _order(tmp_path, [name, "z"]) == ["z", name]


def test_seen_block_orders_oldest_green_first(tmp_path):
    # within the already-verified block, the STALEST green leads so it
    # re-enters the driver's 50-query window soonest; registration
    # order must not matter (ties break by name for determinism)
    _write(tmp_path, 2, {"old_a": GREEN, "old_b": GREEN})
    _write(tmp_path, 3, {"mid": GREEN})
    _write(tmp_path, 4, {"new": GREEN})
    assert _order(tmp_path, ["new", "mid", "old_b", "fresh", "old_a"]) == [
        "fresh", "old_a", "old_b", "mid", "new"
    ]


def test_static_set_vouches_as_round_two(tmp_path):
    # a name vouched only by the static r2 set (no file row) must sort
    # with the r2 greens, ahead of later-round greens
    _write(tmp_path, 4, {"new": GREEN})
    static_name = "pricing_summary"
    assert static_name in entry.DRIVER_VERIFIED_PRIOR
    assert _order(tmp_path, ["new", static_name, "fresh"]) == [
        "fresh", static_name, "new"
    ]


def test_unreadable_file_falls_back_to_static_set(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text("{not json")
    static_name = "pricing_summary"
    assert static_name in entry.DRIVER_VERIFIED_PRIOR
    assert _order(tmp_path, [static_name, "new_q"]) == ["new_q", static_name]


def _write_reverify(tmp_path, changed: dict) -> None:
    (tmp_path / "ROTATION_REVERIFY.json").write_text(
        json.dumps({"code_changed_round": changed})
    )


def test_code_change_after_green_row_front_loads(tmp_path):
    # round-11 verdict ask #1: a green row verifies the code that
    # existed when the driver ran — a later code change voids it, and
    # the name must re-enter the 50-name window ahead of UNCHANGED
    # (merely stale) greens
    _write(tmp_path, 9, {"a": GREEN})
    _write(tmp_path, 8, {"b": GREEN})
    _write_reverify(tmp_path, {"a": 11})
    # a: changed r11 > row r9 → fresh; b: unchanged r8 green → seen
    assert _order(tmp_path, ["b", "a"]) == ["a", "b"]


def test_row_from_change_round_counts_as_verified(tmp_path):
    # the driver runs at round CLOSE, after that round's edits, so a
    # round-11 row covers a round-11 change (>= semantics, not >)
    _write(tmp_path, 11, {"a": GREEN})
    _write(tmp_path, 8, {"b": GREEN})
    _write_reverify(tmp_path, {"a": 11})
    assert _order(tmp_path, ["a", "b"]) == ["b", "a"]


def test_code_change_voids_static_vouch(tmp_path):
    # a static-set name with no file row is vouched at round 2; a
    # code change in any later round must void that vouch too
    name = "pricing_summary"
    assert name in entry.DRIVER_VERIFIED_PRIOR
    _write(tmp_path, 4, {"new": GREEN})
    _write_reverify(tmp_path, {name: 11})
    assert _order(tmp_path, ["new", name]) == [name, "new"]


def test_fresh_block_orders_new_then_stalest_changed(tmp_path):
    # within the fresh block: never-rowed additions first (they have
    # NO evidence at all), then changed names by ascending last-row
    # round — when the backlog exceeds the 50-slot window, the
    # longest-unverified changed code wins the slots
    _write(tmp_path, 9, {"chg_old": GREEN})
    _write(tmp_path, 10, {"chg_new": GREEN, "ok": GREEN})
    _write_reverify(tmp_path, {"chg_old": 11, "chg_new": 11})
    assert _order(tmp_path, ["chg_new", "chg_old", "brand_new", "ok"]) == [
        "brand_new", "chg_old", "chg_new", "ok"
    ]


def test_rotation_reverify_artifact_is_fresh():
    """The committed ROTATION_REVERIFY.json must match what
    tools/rotation_audit.py computes from the current worktree —
    otherwise the rotation trusts rows for code that has since
    changed. Regenerate with `python tools/rotation_audit.py`."""
    import os
    import subprocess
    import sys as _sys

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [_sys.executable, os.path.join(here, "tools", "rotation_audit.py"),
         "--check"],
        cwd=here, capture_output=True, text=True, timeout=120,
    )
    assert res.returncode == 0, res.stderr[-2000:]


def test_every_code_changed_name_is_inside_the_driver_window():
    """End-to-end on the REAL repo artifacts: every query whose code
    changed after its latest driver row must sit in the first 50
    queries() entries (the driver's per-round window) — or, if the
    backlog ever exceeds 50, the window must consist entirely of
    backlog names (prioritization still correct, drain documented)."""
    changed = entry._code_changed_rounds()
    latest = entry._latest_driver_rows()
    backlog = {
        n for n, rnd in changed.items()
        if n in entry.queries.__globals__["QUERIES"]
        and rnd > latest.get(n, (0, False))[0]
    }
    window = list(entry.queries())[:50]
    if len(backlog) <= 50:
        missing = backlog - set(window)
        assert not missing, sorted(missing)
    else:
        assert all(n in backlog for n in window)


def test_rehearsal_families_cover_every_registered_query():
    """tools/scale_rehearsal.py's curated family lists must track the
    registry exactly — a query missing from every family silently
    escapes the 10x/30x sweeps the scale claims rest on."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools"),
    )
    from scale_rehearsal import FAMILIES

    from psx_data_pipeline_spark.plans import QUERIES

    in_families = {q for qs in FAMILIES.values() for q in qs}
    assert in_families == set(QUERIES), (
        sorted(set(QUERIES) - in_families),
        sorted(in_families - set(QUERIES)),
    )


def test_rehearsal_ratio_artifact_covers_registry_with_no_outliers():
    """REHEARSAL_RATIO.json (the full-registry 1×/10× sweep, round-12
    judge ask #4) must cover every registered query, with zero
    failures and zero over-threshold ratios — a registry addition
    without a re-run (python tools/scale_rehearsal.py --ratio) fails
    here, and a superlinear ratio can no longer hide in an
    uncommitted log."""
    import json
    import os

    from psx_data_pipeline_spark.plans import QUERIES

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    art = json.load(open(os.path.join(here, "REHEARSAL_RATIO.json")))
    assert set(art["ratio"]) == set(QUERIES), (
        sorted(set(QUERIES) - set(art["ratio"])),
        sorted(set(art["ratio"]) - set(QUERIES)),
    )
    assert art["failed"] == {}, art["failed"]
    assert art["over_threshold"] == {}, art["over_threshold"]


def test_explains_covers_every_registered_query():
    """EXPLAINS.md is a complete generated record: one `## name`
    section per registered batch query, streaming names in the
    exclusion list — a registry addition without a regenerated
    EXPLAINS (python tools/explain_audit.py) fails here, so the
    appendix can no longer rot silently."""
    import os
    import re
    import sys

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(here, "tools"))
    from explain_audit import STREAMING_EXCLUDED

    from psx_data_pipeline_spark.plans import QUERIES

    text = open(os.path.join(here, "EXPLAINS.md")).read()
    sections = set(re.findall(r"^## (\S+)$", text, re.M))
    sections.discard("Streaming")  # the exclusion section's heading
    expected = set(QUERIES) - set(STREAMING_EXCLUDED)
    assert sections == expected, (
        sorted(expected - sections), sorted(sections - expected),
    )
    assert set(STREAMING_EXCLUDED) <= set(QUERIES)
