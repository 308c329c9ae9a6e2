"""Hostile-ticker probe: re-run the DuckDB oracle comparison for the
whole ticker/rename family on a customer table salted with
adversarial company names — short (< one 4-gram) names, 1- and
2-char names, empty and whitespace-only names, NULLs, unicode/CJK,
SQL-wildcard characters, token-embedded-in-word pairs, ambiguous 1:1
candidates, and identical names across keys.

Why this probe exists: round 10 found that short-name containment in
detect_renames had been DEAD CODE for nine rounds (`lambda i, n=n:`
silently switched F.transform to its (element, index) form) and no
oracle ever noticed — the driver fixtures derive ticker names from
TPC-H customer rows, which are never shorter than 4 chars. The
rename oracles are COMPLETE cross-joins, so salting the source table
with the name classes the fixtures lack makes lossy candidate
blocking mechanically visible: any MISMATCH or one-sided crash is a
real latent bug.

The salted keys are chosen by residue so they land where the churn
machinery looks: deleted = key % 7 == 0 and % 5 != 0 (in prev, not
cur), added = key % 5 == 0 and % 7 != 0 (in cur, not prev) — see
plans/ticker._prev/_cur.

Usage:
    python tools/hostile_ticker_probe.py
    python tools/hostile_ticker_probe.py --queries rename_detection
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hostile_common import BASE, copy_untouched, run_probe  # noqa: E402

OUT = "/tmp/hostile_ticker_corpus"

# (deleted_name, added_name) pairs; None keeps the side's name NULL.
# Each class is a known blind spot of the dense-ASCII fixtures.
HOSTILE_PAIRS = [
    ("HBL", "HBL Ltd"),                       # sub-4-char containment (the r10 bug)
    ("K2", "K2 Cement Works"),                # 2-char short name
    ("x", "xylophone works"),                 # 1-char contained anywhere
    ("", "brand new venture"),                # empty string: contains(x,'') is true both engines
    ("   ", "whitespace only"),               # whitespace-only name
    (None, "null deleted partner"),           # NULL on the deleted side
    ("null added partner", None),             # NULL on the added side
    ("Alpha Beta Industries", "Alphabeta Consolidated"),  # tokens survive only as substrings
    ("Mars Confectionery", "Marshall Industries Intl"),   # spurious token-in-word
    ("naïve café", "naïve café ltd"),         # unicode containment
    ("数据管理", "数据管理 有限公司"),          # CJK containment
    ("a%b_c", "a%b_c holdings"),              # SQL-wildcard chars stay literal
    ("  padded name  ", "padded name"),       # containment across edge whitespace
    ("Dup Co", "Dup Co"),                     # identical names, different keys
    ("Gamma Industries", "Gamma Industries Ltd"),   # ambiguous 1:1 ...
    ("Gamma Industrial", "Gamma Industries PLC"),   # ... near-tie candidates
]


def _keys(base: int, residue_ok) -> list[int]:
    ks, m = [], 1
    while len(ks) < len(HOSTILE_PAIRS):
        if residue_ok(base + m):
            ks.append(base + m)
        m += 1
    return ks


def build_corpus() -> None:
    import duckdb

    copy_untouched(OUT, salted=("customer",))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW base AS SELECT * FROM read_parquet('{BASE}/customer.parquet')"
    )
    cols = [r[0] for r in con.execute("DESCRIBE base").fetchall()]
    n, max_id = con.execute(
        "SELECT count(*), max(c_custkey) FROM base"
    ).fetchone()
    base_key = ((max_id // 35) + 1) * 35  # ≡ 0 (mod 35): residues are by m alone
    del_keys = _keys(base_key, lambda k: k % 7 == 0 and k % 5 != 0)
    add_keys = _keys(base_key, lambda k: k % 5 == 0 and k % 7 != 0)
    other = ", ".join(c for c in cols if c not in ("c_custkey", "c_name"))
    values = []
    rows = [(k, d) for k, (d, _a) in zip(del_keys, HOSTILE_PAIRS)] + [
        (k, a) for k, (_d, a) in zip(add_keys, HOSTILE_PAIRS)
    ]
    for i, (key, nm) in enumerate(rows):
        lit = "NULL" if nm is None else "'" + nm.replace("'", "''") + "'"
        # clone a real row's remaining columns by ORDINAL (text-probe
        # pattern: id-equality cloning silently drops rows on
        # non-contiguous fixtures)
        values.append(
            f"SELECT {key} AS c_custkey, {lit} AS c_name, {other} "
            f"FROM (SELECT *, row_number() OVER (ORDER BY c_custkey) AS __rn"
            f" FROM base) WHERE __rn = {i % n + 1}"
        )
    con.execute(
        f"COPY (SELECT {', '.join(cols)} FROM base "
        f"UNION ALL BY NAME {' UNION ALL BY NAME '.join(values)}) "
        f"TO '{OUT}/customer.parquet' (FORMAT PARQUET)"
    )
    con.close()


def main() -> int:
    # the ticker/rename family: every oracle built on the symbol_id
    # snapshot views (plans/ticker PREV_SQL/CUR_SQL and derivatives)
    return run_probe(build_corpus, OUT, lambda sql: "symbol_id" in sql)


if __name__ == "__main__":
    raise SystemExit(main())
