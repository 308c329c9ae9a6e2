"""Property pins for the distribution-analytics family
(plans/distrib.py): the Count-Min guarantee (est >= exact, bounded
overestimate), exact-quantile ordering and membership, stratified
sample allocation arithmetic, and the KS statistic's range and
self-vs-pool sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from psx_data_pipeline_spark.functions.textfns import tokens
from psx_data_pipeline_spark.plans import QUERIES
from psx_data_pipeline_spark.plans.distrib import (
    _CM_TOP,
    _CM_W,
    _STRAT_TOTAL,
)
from psx_data_pipeline_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.01"


def test_count_min_never_underestimates(spark):
    rows = QUERIES["count_min_hitters"](spark, SF).collect()
    assert len(rows) == _CM_TOP
    n_total = (
        load_table(spark, "documents", SF)
        .select(F.explode(tokens("text")).alias("tok"))
        .count()
    )
    for r in rows:
        # CM lower bound is exact (min over d counters >= true count);
        # upper bound e*N/w holds w.h.p. — assert the deterministic
        # side strictly and the probabilistic side loosely (3x slack)
        assert r["over_err"] >= 0, r
        assert r["cm_est"] >= r["exact_c"], r
        assert r["over_err"] <= 3 * (3 * n_total) // _CM_W, r


def test_group_quantiles_ordered_and_member(spark):
    qrows = QUERIES["group_quantiles"](spark, SF).collect()
    docs = load_table(spark, "documents", SF)
    vals = {
        src: sorted(
            r["n_chars"]
            for r in docs.filter(F.col("source") == src)
            .select("n_chars").collect()
            if r["n_chars"] is not None
        )
        for src in {r["source"] for r in qrows}
    }
    for r in qrows:
        vs = vals[r["source"]]
        assert r["n_docs"] == len(vs)
        assert r["p50"] <= r["p90"] <= r["p99"]
        # each percentile is an actual member at the exact ceil rank
        for q, p in ((50, r["p50"]), (90, r["p90"]), (99, r["p99"])):
            rank = -(-q * len(vs) // 100)  # ceil
            assert p == vs[rank - 1], (r["source"], q, p, vs[rank - 1])


def test_stratified_sample_allocation(spark):
    rows = QUERIES["stratified_sample"](spark, SF).collect()
    docs = load_table(spark, "documents", SF)
    n_s = {
        r["source"]: r["n"]
        for r in docs.filter(F.col("doc_id").isNotNull())
        .groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_tot = sum(n_s.values())
    by_src: dict[str, int] = {}
    for r in rows:
        by_src[r["source"]] = by_src.get(r["source"], 0) + 1
        assert r["rk"] <= r["quota"]
    # every stratum represented, at exactly its quota (each stratum
    # here has more rows than its quota, so the sample fills it)
    assert by_src.keys() == n_s.keys()
    for src, got in by_src.items():
        quota = max(1, (_STRAT_TOTAL * n_s[src]) // n_tot)
        assert got == min(quota, n_s[src]), (src, got, quota)


def test_stratified_sample_is_rerun_deterministic(spark):
    a = sorted(map(tuple, QUERIES["stratified_sample"](spark, SF).collect()))
    b = sorted(map(tuple, QUERIES["stratified_sample"](spark, SF).collect()))
    assert a == b


def test_robust_outliers_fence(spark):
    rows = QUERIES["robust_outliers"](spark, SF).collect()
    assert rows
    from psx_data_pipeline_spark.plans.distrib import _VAL_OK

    ev = (
        load_table(spark, "events", SF)
        .filter(F.expr(_VAL_OK))  # the query's own gate, not a re-guess
        .select("event_type", F.floor(F.col("value") * 1000).alias("v"))
        .collect()
    )
    by_type: dict[str, list[int]] = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(int(r["v"]))
    for r in rows:
        vs = sorted(by_type[r["event_type"]])
        assert r["n_events"] == len(vs)
        med = vs[(len(vs) + 1) // 2 - 1]  # lower median at ceil(n/2)
        assert r["med_milli"] == med
        ds = sorted(abs(v - med) for v in vs)
        mad = ds[(len(ds) + 1) // 2 - 1]
        assert r["mad_milli"] == mad
        assert r["n_outliers"] == sum(
            1 for v in vs if abs(v - med) > 3 * mad
        )
        assert r["n_outliers"] < r["n_events"]


def test_streamed_cm_grid_equals_batch_grid(spark):
    """The stream-maintained counter grid must equal the batch grid
    cell-for-cell (stronger than the shared audit oracle, which only
    sees the probed cells)."""
    from psx_data_pipeline_spark.plans.distrib import cm_cells, cm_occurrences
    from psx_data_pipeline_spark.sources.fixtures import load_table
    from psx_data_pipeline_spark.streaming.jobs import streaming_cm_cells

    batch = sorted(
        map(tuple, cm_cells(
            cm_occurrences(load_table(spark, "documents", SF))
        ).collect())
    )
    streamed = sorted(
        map(tuple, streaming_cm_cells(spark, SF)
            .select("i", "cell", "cnt").collect())
    )
    assert streamed == batch


def test_ks_drift_range_and_pool_identity(spark):
    rows = QUERIES["ks_drift"](spark, SF).collect()
    assert rows, "at least one source"
    for r in rows:
        assert 0 <= r["ks_permille"] <= 1000, r
    # a source whose length distribution IS the pooled rest would sit
    # at ~0; the synthetic sources all share one generator, so none
    # should be anywhere near the maximum
    assert max(r["ks_permille"] for r in rows) < 1000


def test_split_assign_detects_cross_split_leakage(spark, tmp_path):
    """Documents with identical text landing in different splits must
    each be counted as leaked; identical text within ONE split must
    not."""
    from psx_data_pipeline_spark.functions.hashing import md5_long

    sf = str(tmp_path)
    # find doc_ids mapping to each split under the real salted hash
    ids = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        (md5_long(F.concat(F.col("id").cast("string"), F.lit(":split")))
         % 100).alias("h"),
    ).collect()
    train = [r["doc_id"] for r in ids if r["h"] < 80]
    test_ = [r["doc_id"] for r in ids if r["h"] >= 90]
    rows = [
        # leak: same text in train and test
        (train[0], "LEAKED TEXT", "en", "a", 11),
        (test_[0], "LEAKED TEXT", "en", "a", 11),
        # benign: duplicate text both in train
        (train[1], "SAFE DUP", "en", "a", 8),
        (train[2], "SAFE DUP", "en", "a", 8),
        # unique docs
        (train[3], "unique one", "en", "b", 10),
        (test_[1], "unique two", "en", "b", 10),
        # NULL text cannot leak
        (train[4], None, "en", "b", None),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")
    got = {
        (r["split"], r["source"]): (r["n_docs"], r["n_leaked_docs"])
        for r in QUERIES["split_assign"](spark, sf).collect()
    }
    assert got[("train", "a")] == (3, 1)   # leaked carrier + 2 safe dups
    assert got[("test", "a")] == (1, 1)    # the other leaked carrier
    assert got[("train", "b")] == (2, 0)   # unique + NULL-text
    assert got[("test", "b")] == (1, 0)


def test_weighted_sample_two_phase_equals_direct(spark):
    """The salted two-phase top-M must equal the direct global top-M
    (min-K distributivity) — and ranks are the contiguous 1..M."""
    from pyspark.sql import Window

    from psx_data_pipeline_spark.plans.distrib import _WS_M

    rows = QUERIES["weighted_sample"](spark, SF).collect()
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == list(
        range(1, min(_WS_M, len(rows)) + 1)
    )
    # direct: order ALL keyed docs, take M — recompute keys from the
    # same primitives, no salting
    from psx_data_pipeline_spark.functions.hashing import HASH_P, md5_long
    from psx_data_pipeline_spark.functions.textfns import tokens
    from psx_data_pipeline_spark.sources.fixtures import load_table

    docs = load_table(spark, "documents", SF)
    w = docs.where(F.col("doc_id").isNotNull()).select(
        "doc_id",
        F.size(tokens("text")).cast("long").alias("weight"),
        (md5_long(F.concat(F.col("doc_id").cast("string"), F.lit(":ws")))
         % HASH_P).alias("hp"),
    ).where(F.col("weight") >= 1)
    e = F.floor(
        F.lit(1e9)
        * F.log(F.lit(float(HASH_P + 1)) / (F.col("hp") + 1).cast("double"))
    ).cast("long")
    keyed = w.select("doc_id", (e * 1000000).cast("long").alias("__num"),
                     "weight").withColumn("k", F.expr("__num div weight"))
    direct = (
        keyed.withColumn(
            "rank", F.row_number().over(Window.orderBy("k", "doc_id"))
        )
        .where(F.col("rank") <= _WS_M)
        .collect()
    )
    assert {(r.doc_id, r.k) for r in rows} == {(r.doc_id, r.k) for r in direct}


def test_weighted_sample_excludes_zero_weight(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({
            "doc_id": pa.array([1, 2, 3, None], pa.int64()),
            "text": pa.array(["one two", "", None, "x y"]),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s"] * 4),
        }),
        f"{tmp_path}/documents.parquet",
    )
    rows = QUERIES["weighted_sample"](spark, str(tmp_path)).collect()
    assert {r.doc_id for r in rows} == {1}
