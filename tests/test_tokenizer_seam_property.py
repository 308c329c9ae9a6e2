"""Property test for the tokenizer seam: Spark `tokens()` and the
DuckDB `TOKENS_SQL` twin must tokenize IDENTICALLY for arbitrary
unicode text — this is the seam whose trim() asymmetry caused ten
silent oracle divergences (SCALE.md, hostile-text probe), so it gets
a generative pin, not just the curated hostile list.

Each hypothesis example is a BATCH of strings (one Spark job per
example, not per string); surrogates are excluded (not expressible
in well-formed UTF-8 columns on either engine).
"""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from psx_data_pipeline_spark.functions.textfns import TOKENS_SQL, tokens

_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_TEXT, min_size=1, max_size=25))
def test_tokens_match_duckdb_on_arbitrary_unicode(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "i long, text string")
    got_spark = {
        r.i: r.tk
        for r in df.select("i", tokens("text").alias("tk")).collect()
    }

    import pyarrow as pa

    con = duckdb.connect()
    # Arrow registration, not SQL literals: NUL bytes and quotes in
    # the generated text must reach the engine verbatim
    con.register(
        "v",
        pa.table(
            {"i": [i for i, _ in rows], "t": [t for _, t in rows]}
        ),
    )
    got_duck = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT i, {TOKENS_SQL.format('t')} FROM v"
        ).fetchall()
    }
    con.close()
    assert got_spark == got_duck


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_TEXT, min_size=1, max_size=20))
def test_word_shingles_match_duckdb_on_arbitrary_unicode(spark, texts):
    """The shingle seam's ['']-fallback asymmetry paired every empty
    doc as a jaccard-1.0 near-dup — pin word_shingles against its
    DuckDB CASE twin generatively too."""
    import pyarrow as pa

    from psx_data_pipeline_spark.functions.textfns import word_shingles
    from psx_data_pipeline_spark.plans.dedup import _SHINGLES

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "i long, text string")
    got_spark = {
        r.i: r.sh
        for r in df.select(
            "i", word_shingles("text", 3).alias("sh")
        ).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pa.table(
            {"i": [i for i, _ in rows], "text": [t for _, t in rows]}
        ),
    )
    got_duck = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT i, {_SHINGLES} FROM documents"
        ).fetchall()
    }
    con.close()
    assert got_spark == got_duck


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_TEXT, min_size=1, max_size=20))
def test_normalize_symbol_matches_duckdb_on_arbitrary_unicode(spark, texts):
    """The F1 symbol normalizer's Spark/DuckDB twins must agree on
    arbitrary text (trim semantics are the known engine trap)."""
    import pyarrow as pa

    from psx_data_pipeline_spark.functions.textfns import (
        NORMALIZE_SYMBOL_SQL,
        normalize_symbol,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "i long, t string")
    got_spark = {
        r.i: r.s
        for r in df.select("i", normalize_symbol("t").alias("s")).collect()
    }
    con = duckdb.connect()
    con.register(
        "v",
        pa.table({"i": [i for i, _ in rows], "t": [t for _, t in rows]}),
    )
    got_duck = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT i, {NORMALIZE_SYMBOL_SQL.format('t')} FROM v"
        ).fetchall()
    }
    con.close()
    assert got_spark == got_duck
