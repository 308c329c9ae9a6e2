"""Pins for retrieval acceptance metrics (plans/retrieval.py
q_retrieval_eval): MRR/precision/recall agree with the bm25 ranking
and the tf-based judgment set, and the streaming label election
equals its batch twin (plans/stream.q_stream_label_vote)."""

from __future__ import annotations

from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans import QUERIES
from psx_data_pipeline_spark.plans.retrieval import _PREC_AT, _REL_TF
from psx_data_pipeline_spark.functions.textfns import tokens
from psx_data_pipeline_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.01"


def test_retrieval_eval_consistent_with_ranking(spark):
    ev = {r.term: r for r in QUERIES["retrieval_eval"](spark, SF).collect()}
    bm = QUERIES["bm25_scores"](spark, SF).collect()
    assert ev
    per_term: dict = {}
    for r in bm:
        per_term.setdefault(r.term, []).append(r)
    assert set(ev) == set(per_term)
    for term, rows in per_term.items():
        m = ev[term]
        assert m.n_topk == len(rows)
        rel_ranks = sorted(r.rk for r in rows if r.tf >= _REL_TF)
        if rel_ranks:
            assert m.first_rel_rank == rel_ranks[0]
            assert m.mrr_micro == 1000000 // rel_ranks[0]
        else:
            assert m.first_rel_rank == 0 and m.mrr_micro == 0
        at_p = sum(1 for r in rows if r.tf >= _REL_TF and r.rk <= _PREC_AT)
        assert getattr(m, f"prec{_PREC_AT}_milli") == at_p * 1000 // _PREC_AT
        assert 0 <= m.recall_milli <= 1000
        # corpus-wide relevant count bounds the in-top-k count
        assert m.n_relevant >= len(rel_ranks)


def test_retrieval_eval_recall_denominator_is_corpuswide(spark):
    ev = {r.term: r for r in QUERIES["retrieval_eval"](spark, SF).collect()}
    docs = load_table(spark, "documents", SF)
    for term, m in ev.items():
        # recompute independently: docs whose tf for this term >= threshold
        cnt = (
            docs.select("doc_id", F.explode(tokens("text")).alias("t"))
            .where(F.col("t") == term)
            .groupBy("doc_id").count()
            .where(F.col("count") >= _REL_TF)
            .count()
        )
        assert m.n_relevant == cnt


def test_stream_label_vote_equals_batch(spark):
    batch = {r.item: r for r in QUERIES["label_vote"](spark, SF).collect()}
    stream = {r.item: r for r in
              QUERIES["stream_label_vote"](spark, SF).collect()}
    assert batch == stream
