"""Pins for the streaming CDC upsert and n-gram novelty: the
streaming live table equals the batch merge, and novelty matches a
brute-force shingle replay."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans import QUERIES
from psx_data_pipeline_spark.functions.hashing import md5_long
from psx_data_pipeline_spark.functions.textfns import word_shingles
from psx_data_pipeline_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.01"


def test_stream_cdc_apply_equals_batch_merge(spark):
    batch = {r.c_custkey: (r.name, r.segment, r.applied_seq)
             for r in QUERIES["cdc_apply"](spark, SF).collect()}
    stream = {r.c_custkey: (r.name, r.segment, r.applied_seq)
              for r in QUERIES["stream_cdc_apply"](spark, SF).collect()}
    assert stream == batch
    # the delete-then-update resurface case survives streaming too
    k15 = [k for k in batch if k % 15 == 0 and k <= 200000]
    assert k15 and all(stream[k][2] == 4 for k in k15)


def test_ngram_novelty_matches_bruteforce(spark):
    rows = {r.source: r for r in
            QUERIES["ngram_novelty"](spark, SF).collect()}
    assert rows
    docs = load_table(spark, "documents", SF).where(
        F.col("doc_id").isNotNull()
    )
    h = md5_long(
        F.concat(F.col("doc_id").cast("string"), F.lit(":split"))
    ) % 100
    split = (
        F.when(h < 80, "train").when(h < 90, "val").otherwise("test")
    )
    shingled = docs.select(
        "source", split.alias("split"),
        F.array_distinct(word_shingles("text")).alias("shs"),
    ).collect()
    train = set()
    val = defaultdict(set)
    for r in shingled:
        if r.split == "train":
            train.update(r.shs or [])
        elif r.split == "val":
            val[r.source].update(r.shs or [])
    assert set(rows) == {s for s, shs in val.items() if shs}
    for source, r in rows.items():
        shs = val[source]
        novel = {s for s in shs if s not in train}
        assert r.n_val_shingles == len(shs)
        assert r.n_novel == len(novel)
        assert r.novelty_permille == len(novel) * 1000 // len(shs)
