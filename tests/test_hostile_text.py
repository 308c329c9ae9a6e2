"""Pin the degenerate-text semantics the hostile probe established
(tools/hostile_text_probe.py): NULL / empty / whitespace-only / NBSP
documents must neither crash any text operator nor invent content.

The probe itself sweeps every documents-reading query against the
DuckDB oracle on a salted corpus; these tests pin the load-bearing
invariants cheaply so a regression fails in plain pytest without
running the probe."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from psx_data_pipeline_spark.functions.textfns import tokens, word_shingles

HOSTILE = [
    (500, None),
    (501, ""),
    (502, " "),
    (503, "   \t  "),
    (504, "\n\n\n"),
    (505, "  "),          # NBSP: NOT \s in either engine
    (506, "one"),
    (507, "one two"),
    (508, "one two three four"),
]


@pytest.fixture(scope="module")
def hostile_df(spark):
    return spark.createDataFrame(HOSTILE, "doc_id long, text string")


def test_tokens_no_trim_keeps_nbsp_token(hostile_df):
    """DuckDB's trim() strips NBSP, Spark's doesn't — the tokenizer
    must not trim at all, so both engines see one NBSP token."""
    rows = {
        r.doc_id: r.tk
        for r in hostile_df.select(
            "doc_id", tokens("text").alias("tk")
        ).collect()
    }
    assert rows[500] is None
    assert rows[501] == [] and rows[502] == [] and rows[504] == []
    assert rows[505] == ["  "]
    assert rows[508] == ["one", "two", "three", "four"]


def test_word_shingles_empty_for_zero_token_docs(hostile_df):
    """Zero-token (and NULL) docs yield an EMPTY shingle set — the
    old [''] fallback made every empty/whitespace doc a jaccard-1.0
    near-dup of every other."""
    rows = {
        r.doc_id: r.sh
        for r in hostile_df.select(
            "doc_id", word_shingles("text", 3).alias("sh")
        ).collect()
    }
    for d in (500, 501, 502, 503, 504):
        assert rows[d] == [], d
    assert rows[506] == ["one"]            # <n tokens: whole-doc shingle
    assert rows[507] == ["one two"]
    assert rows[508] == ["one two three", "two three four"]


def test_similarity_pairs_exclude_empty_docs(hostile_df):
    from psx_data_pipeline_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    got = ngram_jaccard_pairs(
        hostile_df, "text", "doc_id", threshold=0.5
    ).collect()
    ids = {i for r in got for i in (r.id_a, r.id_b)}
    assert ids.isdisjoint({500, 501, 502, 503, 504}), got
    got = minhash_lsh_pairs(hostile_df, "text", "doc_id").collect()
    ids = {i for r in got for i in (r.id_a, r.id_b)}
    assert ids.isdisjoint({500, 501, 502, 503, 504}), got


def test_per_doc_metrics_total_on_hostile_rows(spark, hostile_df, tmp_path):
    """doc_repetition / dup_span_fraction / doc_fingerprint / lang_id
    must stay total (no ANSI division-by-zero, no NULL leak) on
    degenerate docs."""
    sf = str(tmp_path)
    hostile_df.withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("src0")
    ).write.parquet(f"{sf}/documents.parquet")
    from psx_data_pipeline_spark.plans import QUERIES

    rep = {
        r.doc_id: r
        for r in QUERIES["doc_repetition"](spark, sf).collect()
    }
    assert rep[500].n_tokens == 0 and rep[500].dup_token_frac == 0.0
    assert rep[501].top_bigram_frac == 0.0 and rep[501].keep

    span = {
        r.doc_id: r
        for r in QUERIES["dup_span_fraction"](spark, sf).collect()
    }
    assert span[500].n_toks == 0 and span[500].dup_frac == 0.0

    fp = {r.doc_id: r.fp for r in QUERIES["doc_fingerprint"](spark, sf).collect()}
    assert fp[500] == 0 and fp[501] == 0  # zero-token fold = seed

    lang = {
        r.doc_id: r.lang_pred for r in QUERIES["lang_id"](spark, sf).collect()
    }
    assert lang[500] == "und" and lang[501] == "und"


def test_multimodal_workers_tolerate_null_text(spark, hostile_df):
    from psx_data_pipeline_spark.operators.multimodal import (
        attach_payload,
        extract_features,
        sample_frames,
    )

    feats = {
        r.doc_id: r
        for r in extract_features(attach_payload(hostile_df)).collect()
    }
    assert feats[500].n_bytes is None and feats[500].digest is None
    assert feats[501].n_bytes == 0
    frames = sample_frames(attach_payload(hostile_df)).collect()
    assert all(r.doc_id != 500 for r in frames)


def test_mixing_weight_counts_filtered_tokens(spark):
    """Round-6 probe find: the mixing_schedule oracle counted the
    EMPTY strings str_split_regex yields for leading/trailing
    whitespace, so whitespace-padded documents inflated DuckDB's
    temperature weight vs Spark's filtered tokens() count. Pin: the
    Spark weight derives from the canonical empty-filtered tokenizer
    (' a b ' = 2 tokens, never 4)."""
    df = spark.createDataFrame(
        [(1, "  a b  ", "s"), (2, "\tc\n", "s")],
        "doc_id long, text string, source string",
    )
    w = df.groupBy("source").agg(
        F.floor(
            F.lit(1000.0)
            * F.sqrt(F.sum(F.size(tokens("text"))).cast("double"))
        ).cast("long").alias("weight_milli")
    ).collect()[0]
    # 2 + 1 = 3 tokens -> floor(1000*sqrt(3)); the unfiltered split
    # would see 4 + 3 = 7
    assert w.weight_milli == 1732
