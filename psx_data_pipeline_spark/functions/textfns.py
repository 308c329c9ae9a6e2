"""Text-analysis expression builders (SURVEY.md §2 F1-F10, F13 +
north-star text ops), each with a DuckDB-SQL twin for the oracle.

Everything here is a scan-side expression: whole-stage codegen'd,
no Python, no shuffle — the shape that survives a 100× scale-up.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- reference-parity scalar ops ------------------------------------------


def normalize_symbol(col: Column | str) -> Column:
    """strip → upper → drop '.suffix' (reference scripts/utils.py:168-184)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.upper(F.split(F.trim(c), r"\.").getItem(0))


NORMALIZE_SYMBOL_SQL = "upper(str_split(trim({0}), '.')[1])"


def valid_symbol(col: Column | str) -> Column:
    """Reference row filter (scrape_tickers.py:304): len>1, no 'SELECT'."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.length(c) > 1) & ~F.upper(c).contains("SELECT")


VALID_SYMBOL_SQL = "(length({0}) > 1 AND NOT contains(upper({0}), 'SELECT'))"


# --- tokenization / counting ------------------------------------------------

def tokens(col: Column | str) -> Column:
    """Whitespace tokens of a text column (empty strings dropped)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda w: w != "")


TOKENS_SQL = "list_filter(str_split_regex(trim({0}), '\\s+'), w -> w <> '')"


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


TOKEN_COUNT_SQL = "len(" + TOKENS_SQL + ")"


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """n-word shingles as strings: the MinHash/Jaccard unit.

    Built with array higher-order functions (transform over a
    0..len-n index sequence) — stays JVM-side, no explode needed
    until the caller chooses to.
    """
    t = tokens(col)
    idx = F.sequence(F.lit(0), F.size(t) - n)
    return F.when(
        F.size(t) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i + 1, n))),
    ).otherwise(F.array(F.concat_ws(" ", t)))
