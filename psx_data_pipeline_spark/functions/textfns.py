"""Text-analysis expression builders (SURVEY.md §2 F1-F10, F13 +
north-star text ops), each with a DuckDB-SQL twin for the oracle.

Everything here is a scan-side expression: whole-stage codegen'd,
no Python, no shuffle — the shape that survives a 100× scale-up.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- reference-parity scalar ops ------------------------------------------


_LOWER = "abcdefghijklmnopqrstuvwxyz"
_UPPER = _LOWER.upper()


def normalize_symbol(col: Column | str) -> Column:
    """strip → upper → drop '.suffix' (reference scripts/utils.py:168-184).

    Upcasing is ASCII-only via translate(): exchange symbols are
    ASCII by domain, and the engines' unicode upper() disagree on
    multi-char case folds (Spark 'ß'→'SS'/'ﬁ'→'FI', DuckDB
    'ß'→'ẞ'/'ﬁ' unchanged — found by the seam property test), so
    the full-unicode form cannot be oracle-exact. Non-ASCII passes
    through unchanged on both sides."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(F.split(F.trim(c), r"\.").getItem(0), _LOWER, _UPPER)


# trim({0}, ' '): DuckDB's one-arg trim strips unicode spaces (NBSP)
# where Spark's F.trim strips only ASCII space — the explicit
# character set makes the twins agree (seam property test + probe)
NORMALIZE_SYMBOL_SQL = (
    f"translate(str_split(trim({{0}}, ' '), '.')[1], '{_LOWER}', '{_UPPER}')"
)


def ascii_upper(col: Column | str) -> Column:
    """ASCII-only upcase — the oracle-exact form of upper().

    The engines' full-unicode upper() disagree on multi-char case
    folds (Spark 'ß'→'SS', DuckDB 'ß'→'ẞ' — the normalize_symbol
    seam, re-found by the generative scrape fuzz on fallback_source).
    translate() is codepoint-by-codepoint on both engines, so the
    ASCII form is exact; non-ASCII passes through unchanged on both
    sides. Fixture name columns are ASCII by construction, so on
    driver data this computes the identical result to upper()."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, _LOWER, _UPPER)


ASCII_UPPER_SQL = f"translate({{0}}, '{_LOWER}', '{_UPPER}')"


def ascii_lower(col: Column | str) -> Column:
    """ASCII-only downcase — the oracle-exact form of lower().

    Same seam class as ascii_upper: full-unicode lower() is
    context-sensitive in Java (final sigma: 'ΑΣ'→'ας') but
    unconditional in DuckDB's utf8proc ('ασ'), so the full form
    cannot be oracle-exact on arbitrary text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, _UPPER, _LOWER)


ASCII_LOWER_SQL = f"translate({{0}}, '{_UPPER}', '{_LOWER}')"


def valid_symbol(col: Column | str) -> Column:
    """Reference row filter (scrape_tickers.py:304): len>1, no 'SELECT'.

    ASCII-only upcase for the match (see normalize_symbol — the
    engines' unicode upper() disagree on multi-char folds, e.g.
    Spark upcases 'ßelect' to 'SSELECT')."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.length(c) > 1) & ~F.translate(c, _LOWER, _UPPER).contains(
        "SELECT"
    )


VALID_SYMBOL_SQL = (
    "(length({0}) > 1 AND NOT contains("
    f"translate({{0}}, '{_LOWER}', '{_UPPER}'), 'SELECT'))"
)


# --- tokenization / counting ------------------------------------------------

# The ONE whitespace class for every tokenize seam, stated explicitly
# because the engines' \s disagree: Java's includes vertical tab
# (\x0B), RE2/DuckDB's does not — found by the tokenizer-seam
# property test the moment it generated '\x0b'. The class is Java's
# \s (ASCII-only). Python str.split() — the reference's tokenizer —
# additionally splits on Unicode whitespace (\x1c-\x1f, \x85, NBSP,
# …); that Unicode tail is intentionally out of scope here: cross-
# ENGINE parity (Spark vs DuckDB) is what the oracle pins, and it is
# property-tested on arbitrary unicode in the tokenizer-seam fuzz.
WS_RE = "[ \\t\\n\\f\\r\\x0B]+"


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of a text column (empty strings dropped)."""
    c = F.col(col) if isinstance(col, str) else col
    # no trim(): the w <> '' filter already drops the empty edge
    # pieces split() produces, and trim is NOT equivalent across
    # engines — DuckDB's trim strips unicode spaces (NBSP), Spark's
    # only ASCII space, so trimming made NBSP-edged text tokenize
    # differently (found by tools/hostile_text_probe.py)
    return F.filter(F.split(c, WS_RE), lambda w: w != "")


TOKENS_SQL = (
    "list_filter(str_split_regex({0}, '" + WS_RE + "'), w -> w <> '')"
)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


TOKEN_COUNT_SQL = "len(" + TOKENS_SQL + ")"


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """n-word shingles as strings: the MinHash/Jaccard unit.

    Built with array higher-order functions — stays JVM-side, no
    explode needed until the caller chooses to. Construction is a
    chain of n-1 zip_with merges of the token array against its own
    k-shifted slices: each zip_with lambda touches only its two
    elements, so the whole array builds in O(tokens·n). The previous
    form (transform over an index sequence with slice(tokens, i, n)
    in the lambda body) re-evaluated the TOKENIZING SPLIT per
    element — higher-order-function lambdas run interpreted, with no
    common-subexpression reuse of captured expressions — making
    shingling O(tokens²) per document: invisible on 50-token fixture
    docs, a straggler task that never finishes on a 300 k-token
    document (found by the --giant-doc-tokens rehearsal probe).
    """
    t = tokens(col)
    acc = t
    for k in range(1, n):
        shifted = F.slice(
            t, k + 1, F.greatest(F.size(t) - k, F.lit(0))
        )
        acc = F.zip_with(
            acc, shifted, lambda a, b: F.concat_ws(" ", a, b)
        )
    # Zero-token (or NULL) docs get an EMPTY shingle set, not [''].
    # The '' fallback silently paired every empty/whitespace/NULL
    # document with every other as jaccard-1.0 near-dups (and the
    # engines even disagreed: DuckDB's array_to_string([]) is NULL,
    # Spark's concat_ws is '') — found by tools/hostile_text_probe.py.
    # A doc with no tokens participates in no similarity pairs; exact
    # dedup still catches byte-identical empties upstream.
    return F.when(
        F.size(t) >= n,
        F.slice(acc, 1, F.size(t) - (n - 1)),
    ).when(
        F.size(t) > 0, F.array(F.concat_ws(" ", t))
    ).otherwise(F.array().cast("array<string>"))
