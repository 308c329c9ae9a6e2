"""Pin the primary-key-violation semantics the hostile-id probe
established (tools/hostile_id_probe.py, round 11): duplicate and NULL
doc_id / vec_id / event_id rows must neither crash a task, collapse
engine-arbitrarily, nor diverge from the DuckDB oracle."""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.001"
OTHER = ("region", "nation", "customer", "supplier", "part",
         "orders", "lineitem")


def _corpus(sf, docs=None, embs=None, evs=None):
    """Tiny corpus: base tables hardlinked, documents/embeddings/
    events replaced when given (pyarrow single files for the oracle)."""
    for t in OTHER:
        shutil.copy(f"{BASE}/{t}.parquet", f"{sf}/{t}.parquet")
    for t, data in (("documents", docs), ("embeddings", embs),
                    ("events", evs)):
        if data is None:
            shutil.copy(f"{BASE}/{t}.parquet", f"{sf}/{t}.parquet")
        else:
            pq.write_table(data, f"{sf}/{t}.parquet")


def _docs(rows):
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
        "n_chars": pa.array(
            [len(r[1] or "") for r in rows], pa.int64()),
    })


def test_null_doc_id_degrades_to_codec_error_row(spark, tmp_path):
    """Round-11 probe find: int(doc_id) at the Arrow synth/decode
    seams killed the whole TASK on one NULL-id row (7 codec queries
    red). Pins: the row survives with a NULL id and the error column
    set — one corrupt catalog row costs one row, not the stage."""
    sf = str(tmp_path)
    _corpus(sf, docs=_docs([
        (1, "hello world", "src0"),
        (None, "null id document", "src0"),
    ]))
    from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare

    rows = {r.doc_id: r for r in
            QUERIES["image_decode"](spark, sf).collect()}
    assert rows[None].error == "ValueError: null payload"
    assert rows[None].format is None and rows[None].channels is None
    assert rows[1].error is None and rows[1].format == "ppm"
    for name in ("image_decode", "audio_decode", "video_decode",
                 "frame_sample", "multimodal_features"):
        ok, msg = compare(QUERIES[name](spark, sf), ORACLE_SQL[name], sf)
        assert ok, f"{name}: {msg}"


def test_duplicate_doc_id_twins_stay_separate_rows(spark, tmp_path):
    """A duplicate-id twin (same doc_id, different text) is two
    physical documents: per-row queries emit both, identically in
    both engines — the oracle's doc_id-keyed windows used to merge
    them into one engine-arbitrary row."""
    sf = str(tmp_path)
    _corpus(sf, docs=_docs([
        (7, "the big table scan", "src0"),
        (7, "completely different words here", "src1"),
        (8, "a plain doc", "src0"),
    ]))
    from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare

    preds = [r for r in QUERIES["lang_id"](spark, sf).collect()
             if r.doc_id == 7]
    assert len(preds) == 2  # one classification per physical row
    for name in ("lang_id", "blocklist_scan", "token_entropy",
                 "tfidf_top_terms", "sequence_pack", "domain_cap"):
        ok, msg = compare(QUERIES[name](spark, sf), ORACLE_SQL[name], sf)
        assert ok, f"{name}: {msg}"


def test_duplicate_vec_id_twin_keeps_similarity_family_total(
    spark, tmp_path
):
    """Two distinct vectors wearing one vec_id: signatures are
    per-row (never merged through the id), the dedup/cluster maps
    stay one row per distinct id, and quantization emits one row per
    stored vector."""
    sf = str(tmp_path)
    base = pq.read_table(f"{BASE}/embeddings.parquet")
    twin = pa.table({
        "vec_id": pa.array([990001, 990001, None], pa.int64()),
        "embedding": pa.array(
            [[0.25] * 64, [-0.75] * 64, [0.5] * 64],
            pa.list_(pa.float32())),
        "label": pa.array([1, 2, 3], pa.int32()),
    }, schema=base.schema)
    _corpus(str(tmp_path), embs=pa.concat_tables([base, twin]))
    from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare

    q = QUERIES["embedding_quantize"](spark, sf).where(
        "vec_id = 990001").collect()
    assert len(q) == 2  # one row per stored vector
    d = QUERIES["embedding_dedup"](spark, sf).where(
        "vec_id = 990001").collect()
    assert len(d) == 1  # one node per distinct id in the cluster map
    for name in ("embedding_quantize", "embedding_dedup",
                 "lsh_bucketed_neighbors", "pagerank_sim",
                 "kmeans_topics"):
        ok, msg = compare(QUERIES[name](spark, sf), ORACLE_SQL[name], sf)
        assert ok, f"{name}: {msg}"


def test_heavy_id_collisions_keep_retrieval_and_spans_total(
    spark, tmp_path
):
    """The heavy-collision regime (4 rows on one id, NULL-id pairs)
    caught three more: bm25's doc-length join fanned out through the
    duplicated id (and its df skipped the NULL-id doc), and
    dup_span_fraction's final rollup merged same-length twins. Both
    are per-physical-row now; the retrieval grader rides bm25."""
    sf = str(tmp_path)
    texts = ["the big table scan", "a a a a a", "spark query scan", "",
             "slow slow slow slow", "unique words everywhere",
             "the a table", "spark", "scan scan scan scan",
             "x y z w v u t s"]
    ids = [1, 1, 1, 2, 2, None, None, 3, 1, 2]
    _corpus(sf, docs=_docs([
        (i, t, s) for i, t, s in zip(ids, texts, ["a", "b"] * 5)
    ]))
    from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare

    # one bm25 candidate row per PHYSICAL doc row containing a term
    spark_rows = QUERIES["bm25_scores"](spark, sf).collect()
    got = sorted(r.doc_id for r in spark_rows if r.term == "spark")
    assert got == [1, 3]
    for name in ("bm25_scores", "dup_span_fraction", "retrieval_eval",
                 "rrf_fusion", "token_budget_sample"):
        ok, msg = compare(QUERIES[name](spark, sf), ORACLE_SQL[name], sf)
        assert ok, f"{name}: {msg}"


def test_stream_dedup_collapses_redelivery_not_id_collisions(
    spark, tmp_path
):
    """The dedup key is the full record: a redelivered (bit-identical)
    event collapses, while two DIFFERENT events wearing one colliding
    event_id both survive — keyed on the id alone, the output payload
    was arrival-order luck."""
    import datetime as dt

    sf = str(tmp_path)
    evs = pa.table({
        "event_id": pa.array([990001, 990001, None], pa.int64()),
        "ts": pa.array(
            [dt.datetime(2024, 3, 1, 10), dt.datetime(2024, 3, 2, 11),
             dt.datetime(2024, 3, 3, 12)], pa.timestamp("us")),
        "user_id": pa.array([1, 2, 1], pa.int64()),
        "event_type": pa.array(["click", "purchase", "view"],
                               pa.string()),
        "value": pa.array([5.0, 7.0, 1.0], pa.float64()),
        "props": pa.array([None, '{"k": 1}', None], pa.string()),
    })
    _corpus(sf, evs=evs)
    from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare

    rows = QUERIES["stream_dedup"](spark, sf).collect()
    # 3 distinct records in, 3 out (the stream job unions the feed
    # with itself — full-tuple dedup collapses exactly the redelivery)
    assert len(rows) == 3
    assert sorted(r.user_id for r in rows if r.event_id == 990001) == [1, 2]
    ok, msg = compare(
        QUERIES["stream_dedup"](spark, sf), ORACLE_SQL["stream_dedup"], sf)
    assert ok, msg


def test_stream_dedup_key_omits_value_and_props(spark, tmp_path):
    """Round-12 ADVICE: two source rows identical on the PROJECTED
    tuple (event_id, user_id, event_type, ts) but differing in
    value/props are ONE projected event — the engine's 4-column key
    collapses them, and the oracle's DISTINCT must state the same
    collapse (it used to keep both)."""
    import datetime as dt

    sf = str(tmp_path)
    evs = pa.table({
        "event_id": pa.array([5, 5, 6], pa.int64()),
        "ts": pa.array([dt.datetime(2024, 3, 1, 10)] * 2
                       + [dt.datetime(2024, 3, 1, 11)],
                       pa.timestamp("us")),
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "event_type": pa.array(["click", "click", "view"], pa.string()),
        "value": pa.array([5.0, 9.0, 1.0], pa.float64()),  # differs
        "props": pa.array([None, '{"k": 1}', None], pa.string()),
    })
    _corpus(sf, evs=evs)
    from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare

    rows = QUERIES["stream_dedup"](spark, sf).collect()
    assert len(rows) == 2  # the value-only twin collapsed
    ok, msg = compare(
        QUERIES["stream_dedup"](spark, sf), ORACLE_SQL["stream_dedup"], sf)
    assert ok, msg


def test_dedup_latest_pick_is_total_under_payload_twins(spark, tmp_path):
    """Round-12 audit of the round-11 arg-pick class: dedup_latest
    ordered by (ts, event_id) alone, so an exact (user, ts, id, type)
    twin differing only in value/props made the kept payload engine-
    arbitrary. The tiebreak chain now covers every emitted column —
    value DESC NULLS LAST elects the 8.0 twin deterministically on
    both engines."""
    import datetime as dt

    sf = str(tmp_path)
    evs = pa.table({
        "event_id": pa.array([5, 5, 6], pa.int64()),
        "ts": pa.array([dt.datetime(2024, 3, 6, 8)] * 2
                       + [dt.datetime(2024, 3, 6, 7)],
                       pa.timestamp("us")),
        "user_id": pa.array([3, 3, 3], pa.int64()),
        "event_type": pa.array(["click", "click", "view"], pa.string()),
        "value": pa.array([1.0, 8.0, 2.0], pa.float64()),
        "props": pa.array([None, '{"z": 9}', None], pa.string()),
    })
    _corpus(sf, evs=evs)
    from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare

    rows = QUERIES["dedup_latest"](spark, sf).collect()
    assert len(rows) == 1
    assert rows[0].value == 8.0 and rows[0].props == '{"z": 9}'
    ok, msg = compare(
        QUERIES["dedup_latest"](spark, sf), ORACLE_SQL["dedup_latest"], sf)
    assert ok, msg


def test_negative_ids_take_the_contained_synth_path(spark, tmp_path):
    """Round-12 ADVICE find, pinned as a permanent axis (the probe
    salts -7/-6/-4 doc ids, -3/-2 vec ids, -9/-17 event ids): Python
    floor-mod and SQL trunc-mod diverge below zero, so the synth
    codecs DECLINE negative ids into the NULL-payload error row on
    both sides, attach_payload's modality CASE (trunc-mod, engines
    agree) governs frame sampling, and pmod lanes are restated with
    the ((x%k)+k)%k idiom."""
    sf = str(tmp_path)
    _corpus(sf, docs=_docs([
        (1, "hello world", "src0"),
        (-7, "negative seven id doc words", "src0"),   # video arm
        (-6, "negative six id doc papers", "src1"),    # image arm
        (-4, "negative four id doc market", "src0"),   # even split
    ]))
    from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare

    dec = {r.doc_id: r for r in QUERIES["image_decode"](spark, sf).collect()}
    assert dec[-7].error == "ValueError: null payload"
    assert dec[-7].width is None and dec[-7].format is None
    assert dec[1].error is None
    # trunc-mod on both engines: -7 % 3 = -1 and -4 % 3 = -1 → the
    # guarded video arm (the frame sampler keeps them); -6 % 3 = 0 →
    # image (the sampler must drop it)
    feats = {r.doc_id: r.modality for r in
             QUERIES["multimodal_features"](spark, sf).collect()}
    assert feats[-7] == "video" and feats[-6] == "image"
    sampled = {r.doc_id for r in QUERIES["frame_sample"](spark, sf).collect()}
    assert -7 in sampled and -6 not in sampled
    for name in ("image_decode", "audio_decode", "video_decode",
                 "frame_sample", "multimodal_features", "image_near_dup",
                 "sequence_pack", "lang_id"):
        ok, msg = compare(QUERIES[name](spark, sf), ORACLE_SQL[name], sf)
        assert ok, f"{name}: {msg}"
