"""Pins for the heavy-bucket exact heavy-hitter strategy behind
heavy_shingles (plans/spans.py): guaranteed recall of a planted
boilerplate phrase, exactness of counts, and the all-native-plan
contract (the earlier Misra-Gries version was the one Python worker
round-trip outside the codec seam — this pins that it stays gone)."""

from __future__ import annotations


def _run(spark, docs_rows):
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from psx_data_pipeline_spark.plans import QUERIES

    d = tempfile.mkdtemp(prefix="hh_")
    pq.write_table(
        pa.table({
            "doc_id": list(range(len(docs_rows))),
            "text": docs_rows,
            "lang": ["en"] * len(docs_rows),
            "source": ["s"] * len(docs_rows),
        }),
        os.path.join(d, "documents.parquet"),
    )
    return QUERIES["heavy_shingles"](spark, d)


def test_planted_boilerplate_found_exactly(spark):
    # 60 copies of one 4-gram license header + 300 unique-noise docs:
    # total shingles n = 60 + 300 = 360; the planted phrase's count
    # 60 > n/10000 while every noise shingle (count 1) also passes
    # only if 1*10000 > 360 — it does, so EXACT semantics here means
    # every shingle appears (all counts exceed n/PHI at this tiny n).
    # Use enough noise that only the planted phrase survives:
    # n = 60 + 300000 -> noise needs 10000 > 300060 -> fails.
    noise = [f"w{i} x{i} y{i} z{i}" for i in range(300_000 // 1)]
    docs = ["license header boiler plate"] * 60 + noise
    out = {r["shingle"]: (r["cnt"], r["freq"])
           for r in _run(spark, docs).collect()}
    n = len(docs)  # one 4-token shingle per doc
    assert out == {
        "license header boiler plate": (60, 60.0 / n)
    }


def test_empty_and_short_docs_yield_empty(spark):
    out = _run(spark, ["", "one two three", None]).collect()
    assert out == []


def test_plan_has_no_python_stage(spark):
    from psx_data_pipeline_spark.plans import QUERIES

    df = QUERIES["heavy_shingles"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                   "FlatMapGroupsInPandas"):
        assert marker not in plan, f"python stage in plan: {marker}"
