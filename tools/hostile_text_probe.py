"""Hostile-text probe: re-run the full DuckDB oracle comparison on a
corpus salted with adversarial documents — NULL text, empty text,
whitespace-only (space / tab / newline / NBSP), single-character,
one 10k-char single token, unicode (CJK, emoji, combining marks,
zero-width joiners), and leading/trailing-whitespace rows.

The driver fixtures are uniformly dense ASCII word soup, so every
query family can be oracle-green while silently diverging from
DuckDB on degenerate text (split/size/explode null semantics, `\\s`
vs unicode whitespace classes, empty-array edge cases in shingles /
chunking / packing). This probe puts the SAME query / SAME oracle
SQL pair in front of text those fixtures never exercise: any
MISMATCH or one-sided crash is a real latent bug.

Usage:
    python tools/hostile_text_probe.py             # all doc queries
    python tools/hostile_text_probe.py --queries lang_id doc_chunks

Skips queries that don't read documents.text (relational/events/
embeddings families) — membership derives from each query's oracle
SQL mentioning the documents table.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hostile_common import BASE, copy_untouched, run_probe  # noqa: E402

OUT = "/tmp/hostile_text_corpus"

HOSTILE_TEXTS = [
    None,
    "",
    " ",
    "   \t  ",
    "\n\n\n",
    "  ",            # NBSP only — NOT \s in either engine?
    "x",
    "x " * 3,
    "a" * 10_000,               # one giant token
    ("tok " * 2000).strip(),    # many tokens, byte-heavy
    "naïve café résumé",        # combining-capable accents
    "数据 管理 系统 数据",      # CJK with spaces
    "🚀 🚀 rocket 🚀",          # emoji tokens
    "zero​width join",     # ZWSP inside a "word"
    "  leading and trailing  ",
    "UPPER lower MiXeD UPPER",
    "dup dup dup dup dup",      # high self-repetition
    "tab\tsep\ttok",
    "cr\r\nlf mix",
    "ends with space ",
    "vt\x0bsep",  # vertical tab: Java \s includes it, RE2's doesn't
]


def build_corpus() -> None:
    import duckdb

    copy_untouched(OUT, salted=("documents",))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW base AS SELECT * FROM read_parquet('{BASE}/documents.parquet')"
    )
    cols = [r[0] for r in con.execute("DESCRIBE base").fetchall()]
    n, max_id = con.execute("SELECT count(*), max(doc_id) FROM base").fetchone()
    # hostile rows clone a real row's metadata (source etc.) so only
    # text and doc_id differ — the probe isolates text semantics.
    # Clone rows are picked by ORDINAL, not doc_id equality: a fixture
    # with non-contiguous ids would otherwise silently drop hostile
    # rows and the probe would false-green (review finding)
    other = ", ".join(c for c in cols if c not in ("doc_id", "text"))
    values = []
    for i, txt in enumerate(HOSTILE_TEXTS):
        lit = "NULL" if txt is None else "'" + txt.replace("'", "''") + "'"
        values.append(
            f"SELECT {max_id + 1 + i} AS doc_id, {lit} AS text, {other} "
            f"FROM (SELECT *, row_number() OVER (ORDER BY doc_id) AS __rn"
            f" FROM base) WHERE __rn = {i % n + 1}"
        )
    con.execute(
        f"COPY (SELECT {', '.join(cols)} FROM base "
        f"UNION ALL BY NAME {' UNION ALL BY NAME '.join(values)}) "
        f"TO '{OUT}/documents.parquet' (FORMAT PARQUET)"
    )
    con.close()


def main() -> int:
    return run_probe(
        build_corpus, OUT, lambda sql: "documents" in sql.lower()
    )


if __name__ == "__main__":
    raise SystemExit(main())
