"""Duplicate-heavy corpus regression: the shape a dedup engine
actually meets in production (every text repeated many times) is the
worst case for similarity blocking — hot buckets and candidate joins
go quadratic in the duplication factor. The 10× scale rehearsal
surfaced two real super-linear failures here (8-bit simhash blocks
OOMing; Jaccard candidates exploding 30× for 10× data). This test
pins the fixed behavior: correctness via the same DuckDB oracle on a
duplicated corpus, plus the structural expectations of the exact-dup
collapse.
"""

from __future__ import annotations

import pytest

from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES

DUP_FACTOR = 5


@pytest.fixture(scope="module")
def dup_dir(tmp_path_factory):
    """sf0.001 documents with every text duplicated DUP_FACTOR times
    under distinct doc_ids."""
    import duckdb

    base = tmp_path_factory.mktemp("dup_corpus")
    n = duckdb.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchone()[0]
    duckdb.sql(f"""
        COPY (
          SELECT doc_id + {n} * i AS doc_id, text, lang, source, n_chars
          FROM '/root/testdata/sf0.001/documents.parquet',
               UNNEST(range(0, {DUP_FACTOR})) AS t(i)
        ) TO '{base}/documents.parquet' (FORMAT PARQUET)
    """)
    # the oracle harness registers every fixture table as a view —
    # link the untouched ones from sf0.001
    import os

    from psx_data_pipeline_spark.schemas import FIXTURE_TABLES

    for t in FIXTURE_TABLES:
        if t != "documents":
            os.symlink(
                f"/root/testdata/sf0.001/{t}.parquet", f"{base}/{t}.parquet"
            )
    return str(base)


@pytest.mark.parametrize(
    "name", ["dedup_exact", "ngram_jaccard_pairs", "simhash_near_pairs"]
)
def test_oracle_match_on_duplicated_corpus(spark, dup_dir, name):
    from tests.oracle_check import compare

    ok, msg = compare(QUERIES[name](spark, dup_dir), ORACLE_SQL[name], dup_dir)
    assert ok, f"{name} on duplicated corpus: {msg}"


def test_jaccard_dup_groups_fully_paired(spark, dup_dir):
    """Every duplicate group must yield all C(k,2) pairs at exactly
    Jaccard 1.0 — the intra-group expansion is lossless."""
    rows = QUERIES["ngram_jaccard_pairs"](spark, dup_dir).collect()
    ones = [r for r in rows if r.jaccard == 1.0]
    n_docs = spark.read.parquet(f"{dup_dir}/documents.parquet").count()
    n_groups = n_docs // DUP_FACTOR
    expected_intra = n_groups * DUP_FACTOR * (DUP_FACTOR - 1) // 2
    # distinct texts in the fixture are near-dup-free at 1.0 unless
    # identical, so the 1.0 pair count is at least the intra volume
    assert len(ones) >= expected_intra
