"""Every registered query with an oracle is hash-checked against DuckDB
at sf0.01 — the same gate the driver applies (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
from tests.conftest import SF_CORRECT
from tests.oracle_check import compare


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_CORRECT)
    if name not in ORACLE_SQL:
        # rows-only check for non-SQL-expressible operators
        assert df.count() >= 0
        return
    ok, msg = compare(df, ORACLE_SQL[name], SF_CORRECT)
    assert ok, f"{name}: {msg}"
