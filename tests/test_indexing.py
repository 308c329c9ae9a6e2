"""Pins for the inverted index (plans/indexing.py) and the mixing
schedule (plans/corpus.py): posting blocks reconstruct exactly, the
df admission band holds, and apportionment sums to the slot count
even on degenerate corpora."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans import QUERIES
from psx_data_pipeline_spark.plans.indexing import _BLOCK, _DF_CAP
from psx_data_pipeline_spark.plans.corpus import _MIX_SLOTS
from psx_data_pipeline_spark.functions.textfns import tokens
from psx_data_pipeline_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.01"


def test_posting_blocks_reconstruct_exactly(spark):
    rows = QUERIES["inverted_index"](spark, SF).collect()
    assert rows, "no posting blocks at sf0.01"
    per_term = defaultdict(list)
    for r in rows:
        assert 1 <= r.n_docs <= _BLOCK
        # gaps ship serialized (driver-hashable string, not ArrayType)
        gaps = [int(g) for g in r.gaps.split(",")]
        assert len(gaps) == r.n_docs
        # gaps decode to a strictly increasing doc list matching the
        # skip metadata
        docs, acc = [], 0
        for g in gaps:
            assert g > 0 or (not docs and g >= 0)
            acc += g
            docs.append(acc)
        assert docs[0] == r.first_doc_id and docs[-1] == r.last_doc_id
        assert docs == sorted(set(docs))
        per_term[r.term].append(r)
    # df band: total docs per term within [2, cap]; block indexes are
    # contiguous from 0 and only the last block may be partial
    for term, blocks in per_term.items():
        blocks.sort(key=lambda r: r.block_idx)
        assert [b.block_idx for b in blocks] == list(range(len(blocks)))
        total = sum(b.n_docs for b in blocks)
        assert 2 <= total <= _DF_CAP
        assert all(b.n_docs == _BLOCK for b in blocks[:-1])


def test_index_df_matches_corpus(spark):
    """Per-term doc counts in the index equal the corpus df for every
    admitted term (nothing dropped or duplicated by the blocking)."""
    rows = QUERIES["inverted_index"](spark, SF).collect()
    got = defaultdict(int)
    for r in rows:
        got[r.term] += r.n_docs
    docs = load_table(spark, "documents", SF).where(
        F.col("doc_id").isNotNull()
    )
    df = (
        docs.select("doc_id", F.explode(tokens("text")).alias("term"))
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df").between(2, _DF_CAP))
        .collect()
    )
    assert got == {r.term: r.df for r in df}


def test_mixing_schedule_sums_to_slots(spark):
    rows = QUERIES["mixing_schedule"](spark, SF).collect()
    assert sum(r.quota for r in rows) == _MIX_SLOTS
    assert all(r.quota >= 0 for r in rows)
    # monotone: a strictly larger weight never gets a smaller quota
    # than a strictly smaller one by more than the +1 remainder bonus
    by_w = sorted(rows, key=lambda r: r.weight_milli)
    for a, b in zip(by_w, by_w[1:]):
        if b.weight_milli > a.weight_milli:
            assert b.quota >= a.quota - 1


def test_mixing_schedule_zero_corpus(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["", None]),
            "lang": pa.array(["en", "en"]),
            "source": pa.array(["a", "b"]),
        }),
        f"{tmp_path}/documents.parquet",
    )
    rows = QUERIES["mixing_schedule"](spark, str(tmp_path)).collect()
    assert {r.source for r in rows} == {"a", "b"}
    assert all(r.quota == 0 for r in rows)
