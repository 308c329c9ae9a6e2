"""Generative fuzz of the scrape/parse family: hypothesis builds a
customer table of ARBITRARY unicode names and segments — including
'<', '>', newlines, quotes, and regex metacharacters, which the
fixture synthesis never produces — and the Spark-vs-DuckDB oracle
comparison must hold for every parse query. The point is the REGEX
seam: `regexp_extract_all` runs on Java regex in Spark and RE2 in
DuckDB, and hostile cell text is exactly where those two disagree
first (the tokenizer seam's \\x0B finding, but for the parser).

Covers S3/S4 (market-watch parse + header-driven resolution), R2
(arity filter on malformed rows), S5 (enrich coalesce ladder), S6
(prioritized fallback), R11 (first-run bootstrap).
"""

from __future__ import annotations

import os
import shutil

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

BASE = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "supplier", "part", "orders", "lineitem",
          "events", "documents", "embeddings")

QUERIES_UNDER_FUZZ = (
    "market_watch_parse", "company_enrich", "fallback_source",
    "first_run_bootstrap",
)

# full unicode except surrogates; deliberately includes <, >, &, regex
# metacharacters, newlines — the classes the HTML synthesis "avoids
# by construction" on the driver fixtures
_CELL = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
)

_counter = [0]


@pytest.fixture(scope="module")
def fuzz_root(tmp_path_factory):
    return str(tmp_path_factory.mktemp("scrape_fuzz"))


@settings(
    max_examples=int(os.environ.get("FUZZ_N", "4")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), _CELL),                       # c_name
            st.one_of(st.none(), _CELL),                       # segment
            st.one_of(st.none(), st.floats(
                min_value=-1e6, max_value=1e6, allow_nan=False)),
        ),
        min_size=1, max_size=12,
    )
)
def test_scrape_queries_match_oracle_on_arbitrary_cells(
    spark, fuzz_root, rows
):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare

    _counter[0] += 1
    sf = os.path.join(fuzz_root, f"sc{_counter[0]}")
    os.makedirs(sf, exist_ok=True)
    for t in TABLES:
        dst = f"{sf}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copy(f"{BASE}/{t}.parquet", dst)
    pq.write_table(
        pa.table({
            "c_custkey": pa.array(range(len(rows)), type=pa.int64()),
            "c_name": pa.array([r[0] for r in rows], type=pa.string()),
            "c_nationkey": pa.array([i % 5 for i in range(len(rows))],
                                    type=pa.int32()),
            "c_acctbal": pa.array([r[2] for r in rows], type=pa.float64()),
            "c_mktsegment": pa.array([r[1] for r in rows],
                                     type=pa.string()),
        }),
        f"{sf}/customer.parquet",
    )
    for name in QUERIES_UNDER_FUZZ:
        ok, msg = compare(QUERIES[name](spark, sf), ORACLE_SQL[name], sf)
        assert ok, f"{name} diverged on {rows!r}: {msg}"
