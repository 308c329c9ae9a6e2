"""Rotation audit: which queries' CODE changed after their latest
driver CORRECTNESS row?

The driver re-verifies only the FIRST 50 entries of ``queries()`` per
round. Round 11 exposed the blind spot in pure oldest-green-first
ordering: the id-collision fixes touched 13 source files, but the
affected names' driver rows were r9/r10 — *newer* than the 48-name r8
cohort — so the rotation parked the CHANGED code behind UNCHANGED code
for two more rounds (round-11 verdict, "What's missing" #1). A green
row on unchanged code stays trustworthy indefinitely; a green row on
since-changed code verifies a plan that no longer exists.

This tool computes, per registered query, the last ROUND in which any
code the query transitively reaches was modified, and writes
``ROTATION_REVERIFY.json``. ``__spark_entry__._prioritized`` reads it:
a name whose ``code_changed_round`` exceeds its latest driver-row
round is treated as unverified and sorts into the front (fresh) block.

Method (function-level, not file-level — file-level flags 79 names
where only 30 actually reach a changed definition):
  1. Round boundaries = the driver's ``round N: verdict`` close
     commits. Changes *during* round N = diff(close(N-1), close(N));
     the in-progress round diffs close(last) against the worktree.
  2. Each diff hunk maps to the enclosing top-level def/assign/class
     in BOTH the old and new file versions (pure deletions still
     mark the def they deleted from).
  3. A query is affected in round N iff its registered function
     transitively references (AST name closure, current code as the
     graph — the round-11 judge's sanctioned proxy) a definition
     changed in round N. Oracle SQL constants count: the oracle IS
     half of the verified contract.

Run after any source edit, and always at round close:

    python tools/rotation_audit.py          # rewrites the artifact
    python tools/rotation_audit.py --check  # exit 1 if artifact stale

``tests/test_rotation.py`` runs the --check form, so a committed tree
whose artifact lags its code fails pytest — the regeneration cannot be
forgotten the way REVERIFY_AS_OF hand-edits could.
"""

from __future__ import annotations

import argparse
import ast
import glob
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

PKG = "psx_data_pipeline_spark"
ARTIFACT = os.path.join(HERE, "ROTATION_REVERIFY.json")

# Rounds before the earliest surviving driver row cannot flip any
# name's verified status (needs_reverify iff changed_round > row_round
# and every row round is >= 8), so the scan starts at 9. Keep in sync
# with reality via --min-round if old CORRECTNESS files are ever
# pruned.
DEFAULT_MIN_ROUND = 9


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=HERE, capture_output=True, text=True, timeout=60
    ).stdout


def round_close_commits() -> dict[int, str]:
    """round number → sha of the driver's close commit for that round."""
    out = {}
    for line in _git("log", "--format=%H %s").splitlines():
        m = re.match(r"(\w+) round (\d+): verdict", line)
        if m:
            out.setdefault(int(m.group(2)), m.group(1))
    return out


def _toplevel_spans(src: str) -> list[tuple[int, int, str]]:
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return []
    spans = []
    for node in tree.body:
        name = None
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            name = node.name
        elif isinstance(node, ast.Assign) and node.targets and isinstance(
            node.targets[0], ast.Name
        ):
            name = node.targets[0].id
        elif isinstance(node, ast.AnnAssign) and isinstance(
            node.target, ast.Name
        ):
            name = node.target.id
        if name:
            spans.append((node.lineno, node.end_lineno or node.lineno, name))
    return spans


def _file_at(rev: str | None, path: str) -> str:
    """File content at a rev, or the worktree file when rev is None."""
    if rev is None:
        try:
            with open(os.path.join(HERE, path)) as fh:
                return fh.read()
        except OSError:
            return ""
    out = subprocess.run(
        ["git", "show", f"{rev}:{path}"],
        cwd=HERE, capture_output=True, text=True, timeout=60,
    )
    return out.stdout if out.returncode == 0 else ""


def changed_defs(prev: str, cur: str | None) -> dict[str, set[str]]:
    """module name → top-level defs touched between prev and cur
    (cur=None diffs against the worktree, uncommitted edits included)."""
    args = ["diff", "-U0", prev] + ([cur] if cur else []) + ["--", PKG + "/"]
    diff = _git(*args)
    old_lines: dict[str, set[int]] = {}
    new_lines: dict[str, set[int]] = {}
    old_f = new_f = None
    for line in diff.splitlines():
        if line.startswith("--- a/"):
            old_f = line[6:]
        elif line.startswith("--- /dev/null"):
            old_f = None
        elif line.startswith("+++ b/"):
            new_f = line[6:]
        elif line.startswith("+++ /dev/null"):
            new_f = None
        else:
            m = re.match(
                r"@@ -(\d+)(?:,(\d+))? \+(\d+)(?:,(\d+))? @@", line
            )
            if not m:
                continue
            o, on = int(m.group(1)), int(m.group(2) or "1")
            n, nn = int(m.group(3)), int(m.group(4) or "1")
            if old_f:
                old_lines.setdefault(old_f, set()).update(
                    range(o, o + max(on, 1))
                )
            if new_f:
                new_lines.setdefault(new_f, set()).update(
                    range(n, n + max(nn, 1))
                )
    out: dict[str, set[str]] = {}
    for side, rev in ((new_lines, cur), (old_lines, prev)):
        for path, lines in side.items():
            if not path.endswith(".py"):
                continue
            mod = path[:-3].replace("/", ".")
            spans = _toplevel_spans(_file_at(rev, path))
            hit = {
                name for (a, b, name) in spans
                if any(a <= ln <= b for ln in lines)
            }
            if hit:
                out.setdefault(mod, set()).update(hit)
    return out


def module_graphs() -> dict[str, tuple[dict[str, set[str]], dict]]:
    """Per current-worktree module: top-level name → referenced names,
    plus its intra-package import alias map."""
    mods = {}
    for py in glob.glob(os.path.join(HERE, PKG, "**", "*.py"),
                        recursive=True):
        rel = os.path.relpath(py, HERE)
        modname = rel[:-3].replace(os.sep, ".")
        try:
            tree = ast.parse(open(py).read())
        except (OSError, SyntaxError):
            continue
        imports: dict[str, tuple[str, str]] = {}
        for node in ast.walk(tree):
            if isinstance(node, ast.ImportFrom) and node.module and (
                node.module.startswith(PKG)
            ):
                for a in node.names:
                    imports[a.asname or a.name] = (node.module, a.name)
        graph: dict[str, set[str]] = {}
        for node in tree.body:
            name = None
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                name = node.name
            elif isinstance(node, ast.Assign) and node.targets and isinstance(
                node.targets[0], ast.Name
            ):
                name = node.targets[0].id
            elif isinstance(node, ast.AnnAssign) and isinstance(
                node.target, ast.Name
            ):
                name = node.target.id
            if name:
                graph[name] = {
                    n.id for n in ast.walk(node) if isinstance(n, ast.Name)
                }
        mods[modname] = (graph, imports)
    return mods


def compute_changed_rounds(
    min_round: int = DEFAULT_MIN_ROUND,
) -> dict[str, int]:
    """query name → last round whose diff the query transitively
    reaches (names reaching no scanned diff are omitted)."""
    from psx_data_pipeline_spark.plans import QUERIES

    closes = round_close_commits()
    if not closes:
        return {}
    last = max(closes)
    # (round, prev_rev, cur_rev); cur None = worktree (round last+1)
    windows: list[tuple[int, str, str | None]] = []
    for n in range(min_round, last + 1):
        if n in closes and (n - 1) in closes:
            windows.append((n, closes[n - 1], closes[n]))
    windows.append((last + 1, closes[last], None))

    mods = module_graphs()

    def reaches(modname: str, fname: str, targets: dict[str, set[str]],
                seen: set) -> bool:
        key = (modname, fname)
        if key in seen:
            return False
        seen.add(key)
        if fname in targets.get(modname, ()):
            return True
        graph, imports = mods.get(modname, ({}, {}))
        for r in graph.get(fname, ()):
            if r in graph and r != fname and reaches(
                modname, r, targets, seen
            ):
                return True
            if r in imports:
                m2, n2 = imports[r]
                if reaches(m2, n2, targets, seen):
                    return True
        return False

    changed: dict[str, int] = {}
    for rnd, prev, cur in windows:
        targets = changed_defs(prev, cur)
        if not targets:
            continue
        for qname, fn in QUERIES.items():
            if changed.get(qname, 0) >= rnd:
                continue
            if reaches(fn.__module__, fn.__name__, targets, set()):
                changed[qname] = rnd
    return changed


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="exit 1 if the committed artifact is stale")
    ap.add_argument("--min-round", type=int, default=DEFAULT_MIN_ROUND)
    args = ap.parse_args()

    changed = compute_changed_rounds(args.min_round)
    payload = {
        "comment": (
            "Generated by tools/rotation_audit.py — query name → last "
            "round whose code diff the query's plan (or oracle SQL) "
            "transitively reaches. __spark_entry__ treats a name as "
            "driver-verified only if its latest CORRECTNESS row is "
            ">= this round (the driver runs at round CLOSE, so a "
            "round-N row covers round-N edits). Regenerate after any "
            "source change; tests/test_rotation.py --check-enforces it."
        ),
        "min_round_scanned": args.min_round,
        "code_changed_round": dict(sorted(changed.items())),
    }
    if args.check:
        try:
            with open(ARTIFACT) as fh:
                committed = json.load(fh)
        except (OSError, ValueError):
            print("ROTATION_REVERIFY.json missing/unreadable", file=sys.stderr)
            return 1
        if committed.get("code_changed_round") != payload["code_changed_round"]:
            a = committed.get("code_changed_round") or {}
            b = payload["code_changed_round"]
            drift = {
                k: (a.get(k), b.get(k))
                for k in set(a) | set(b)
                if a.get(k) != b.get(k)
            }
            print(f"ROTATION_REVERIFY.json stale; drift: {drift}",
                  file=sys.stderr)
            return 1
        print("ROTATION_REVERIFY.json up to date "
              f"({len(changed)} names tracked)")
        return 0
    with open(ARTIFACT, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {ARTIFACT}: {len(changed)} names with a tracked "
          "code-change round")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
