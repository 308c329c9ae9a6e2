"""Pins for the bigram LM scorer (plans/lm.py): the model's
conditional normalizes exactly (history counts equal observed bigram
mass), short docs are excluded, and scores are reproducible integer
sums (no float-order dependence)."""

from __future__ import annotations

from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans import QUERIES
from psx_data_pipeline_spark.plans.lm import _bigrams
from psx_data_pipeline_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.01"


def test_history_counts_equal_observed_bigram_mass(spark):
    """Σ_c c(p, c) == h(p) for every history p — the add-one
    conditional P(c|p) = (c(p,c)+1)/(h(p)+V) sums to exactly 1 over
    the vocabulary iff this holds."""
    pairs = _bigrams(load_table(spark, "documents", SF))
    cb = pairs.groupBy("p", "c").agg(F.count(F.lit(1)).alias("nb"))
    ch = pairs.groupBy("p").agg(F.count(F.lit(1)).alias("nh"))
    mismatch = (
        cb.groupBy("p").agg(F.sum("nb").alias("mass"))
        .join(ch, "p", "full_outer")
        .where(~F.col("mass").eqNullSafe(F.col("nh")))
        .count()
    )
    assert mismatch == 0


def test_short_and_null_docs_are_excluded(spark, tmp_path):
    sf = str(tmp_path)
    spark.createDataFrame(
        [
            (1, "only"),            # 1 token: no bigram
            (2, None),              # NULL text
            (3, ""),                # empty
            (4, "two tokens"),      # exactly one bigram
            (5, "   "),             # whitespace only
        ],
        "doc_id long, text string",
    ).selectExpr(
        "doc_id", "text", "'en' AS lang", "'s' AS source"
    ).write.parquet(f"{sf}/documents.parquet")
    rows = {r.doc_id: r for r in QUERIES["bigram_perplexity"](spark, sf).collect()}
    assert set(rows) == {4}
    assert rows[4].n_bigrams == 1


def test_doc_score_decomposes_over_bigrams(spark):
    """logprob_milli is the exact integer sum of its bigrams'
    lp_milli: re-deriving one doc's score from the model tables
    reproduces the registered result bit-for-bit."""
    out = {
        r.doc_id: r
        for r in QUERIES["bigram_perplexity"](spark, SF).collect()
    }
    assert out, "no scored docs at sf0.01"
    probe_doc = min(out)
    from psx_data_pipeline_spark.functions.textfns import tokens

    docs = load_table(spark, "documents", SF)
    pairs = _bigrams(docs)
    cb = pairs.groupBy("p", "c").agg(F.count(F.lit(1)).alias("nb"))
    ch = pairs.groupBy("p").agg(F.count(F.lit(1)).alias("nh"))
    vocab = (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
        .collect()[0].v
    )
    scored = (
        pairs.where(F.col("doc_id") == probe_doc)
        .join(cb, ["p", "c"]).join(ch, ["p"])
        .select(
            F.floor(
                F.lit(1000.0)
                * F.log((F.col("nb") + 1).cast("double") / (F.col("nh") + F.lit(vocab)).cast("double"))
            ).cast("long").alias("lp")
        )
        .agg(F.sum("lp").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    assert scored.s == out[probe_doc].logprob_milli
    assert scored.n == out[probe_doc].n_bigrams


def test_buckets_partition_and_order(spark):
    """Per source: buckets partition the scored docs, and score
    ranges are strictly ordered head > middle > tail (value groups
    never straddle a bucket)."""
    from collections import defaultdict

    rows = QUERIES["perplexity_buckets"](spark, SF).collect()
    per_src = defaultdict(dict)
    for r in rows:
        per_src[r.source][r.bucket] = r
    docs = load_table(spark, "documents", SF).select("doc_id", "source")
    scored = QUERIES["bigram_perplexity"](spark, SF).join(docs, "doc_id")
    totals = {
        r.source: r.n
        for r in scored.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    for src, bs in per_src.items():
        assert sum(b.n_docs for b in bs.values()) == totals[src]
        if "head" in bs and "middle" in bs:
            assert bs["middle"].hi_lp_milli < bs["head"].lo_lp_milli
        if "middle" in bs and "tail" in bs:
            assert bs["tail"].hi_lp_milli < bs["middle"].lo_lp_milli
