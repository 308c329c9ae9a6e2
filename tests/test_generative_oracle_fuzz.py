"""Generative oracle fuzz: hypothesis builds a documents table of
ARBITRARY unicode text, and the full Spark-query-vs-DuckDB-oracle
comparison must hold — the generative generalization of the curated
hostile-text probe (which only tests the adversarial cases someone
thought of). The seam property tests pin tokenize/shingle/normalize
in isolation; this pins whole query pipelines end to end.

Queries chosen to cover distinct expression machinery over raw text:
the \\G-regex chunker (substr/length semantics), the rolling-hash
fold (md5-over-utf8 + bigint arithmetic), quality ratios (regex
char classes + int/int division), and an exploded-token aggregate.
"""

from __future__ import annotations

import os
import shutil

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

BASE = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "embeddings")

QUERIES_UNDER_FUZZ = (
    "doc_chunks", "doc_fingerprint", "text_quality", "word_freq",
    # round-6 additions: the corpus-scalar seams hardened this round
    # (shard_manifest's zero-corpus guard, BM25's avgdl-milli
    # arithmetic) and the two shingle pipelines whose candidate
    # machinery changed (heavy-bucket prefilter, span coverage)
    "shard_manifest", "bm25_scores", "heavy_shingles",
    "dup_span_fraction", "vocab_sketch", "vocab_overlap_sketch",
    # fake-decode multimodal paths consume the same documents table
    "multimodal_features", "frame_sample",
    # round-6: the CM sketch (cell grid + top-k tie ordering)
    "count_min_hitters",
    # round-6: literal replace-arithmetic occurrence counts over
    # arbitrary unicode text (ASCII patterns by contract)
    "blocklist_scan",
    # round-6: bigram LM scoring (shifted-zip bigrams, history
    # normalization, add-one smoothing) over arbitrary unicode
    "bigram_perplexity",
    # round-6 session 6: per-window array winnowing (k<=grams<w short
    # docs, all-identical-gram docs), the lang-ID confusion rollup,
    # and the BM25 acceptance metrics (empty judgment sets, terms
    # absent from the corpus)
    "winnowing_fingerprints", "lang_confusion", "retrieval_eval",
)

_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
)

# default 6 examples per property keeps the pytest sweep fast;
# FUZZ_N=60 (etc.) turns the same file into a deep divergence hunt
_N_EXAMPLES = int(os.environ.get("FUZZ_N", "4"))

_counter = [0]


@pytest.fixture(scope="module")
def fuzz_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("oracle_fuzz")
    return str(root)


@settings(
    max_examples=_N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_TEXT, min_size=1, max_size=15))
def test_text_queries_match_oracle_on_arbitrary_unicode(
    spark, fuzz_root, texts
):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare

    _counter[0] += 1
    sf = os.path.join(fuzz_root, f"ex{_counter[0]}")
    os.makedirs(sf, exist_ok=True)
    for t in TABLES:  # hardlinks: per-example dir for pennies
        dst = f"{sf}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copy(f"{BASE}/{t}.parquet", dst)
    # ids COLLIDE by construction (pairs share an id) and one is NULL:
    # the round-11 hostile-id class is a permanent fuzz axis, not a
    # one-off salt. Deterministic derivation keeps shrinking sane.
    ids = [None if i == 1 else i // 2 for i in range(len(texts))]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["src0"] * len(texts),
        }),
        f"{sf}/documents.parquet",
    )
    for name in QUERIES_UNDER_FUZZ:
        ok, msg = compare(QUERIES[name](spark, sf), ORACLE_SQL[name], sf)
        assert ok, f"{name} diverged on {texts!r}: {msg}"


_F32 = st.floats(
    min_value=-100.0, max_value=100.0, allow_nan=False, width=32
)
_VEC = st.lists(_F32, min_size=64, max_size=64)


@settings(
    max_examples=_N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_VEC, min_size=2, max_size=10))
def test_embedding_queries_match_oracle_on_arbitrary_vectors(
    spark, fuzz_root, vecs
):
    """Arbitrary in-bound float32 vectors (±0.0, subnormals, exact
    boundary values) through the quantized-integer pipelines — the
    float-edge generalization of the curated NaN/Inf hostile rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare

    _counter[0] += 1
    sf = os.path.join(fuzz_root, f"ev{_counter[0]}")
    os.makedirs(sf, exist_ok=True)
    for t in TABLES + ("documents",):
        if t == "embeddings":
            continue
        dst = f"{sf}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copy(f"{BASE}/{t}.parquet", dst)
    pq.write_table(
        pa.table({
            "vec_id": list(range(len(vecs))),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
            "label": [1] * len(vecs),
        }),
        f"{sf}/embeddings.parquet",
    )
    for name in ("embedding_stats", "embedding_quantize"):
        ok, msg = compare(QUERIES[name](spark, sf), ORACLE_SQL[name], sf)
        assert ok, f"{name} diverged: {msg}"


import datetime as dt

_TS = st.one_of(
    st.none(),
    st.datetimes(
        min_value=dt.datetime(1969, 1, 1),
        max_value=dt.datetime(2100, 1, 1),
    ),
)
# props: arbitrary strings AND structured JSON objects whose 'k'
# spans the integer-extraction seam — quoted numbers, doubles,
# booleans, null, AND integers beyond ±2^63 (DuckDB tags every
# non-negative JSON integer UBIGINT, so > int64-max passes the type
# gate and only TRY_CAST keeps the oracle from crashing where
# Spark's from_json nulls out — the round-5 review finding)
_JSON_K = st.one_of(
    st.integers(min_value=-(2**70), max_value=2**70),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    st.booleans(),
    st.none(),
    st.integers(min_value=0, max_value=99).map(str),  # quoted number
)
_PROPS = st.one_of(
    st.none(),
    _TEXT,
    _JSON_K.map(lambda v: __import__("json").dumps({"k": v})),
)
_EV = st.tuples(
    _TS,
    st.one_of(st.none(), st.integers(min_value=0, max_value=3)),  # user
    st.sampled_from(["click", "view", "purchase", None]),
    # round-6: non-finite and out-of-gate values included — the
    # MILLI_SQL total form must NULL them identically in both engines
    st.one_of(
        st.none(),
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        st.sampled_from([
            float("nan"), float("inf"), float("-inf"),
            1e30, -1e30, 9e12, 9.1e12,
        ]),
    ),
    _PROPS,
)


@settings(
    max_examples=_N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_EV, min_size=1, max_size=12))
def test_event_queries_match_oracle_on_arbitrary_events(
    spark, fuzz_root, evs
):
    """Arbitrary timestamps (NULL / pre-epoch / far-future /
    microsecond ties), NULL keys, float values, and arbitrary props
    strings through the event pipelines — the generative twin of the
    hostile events probe."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare

    _counter[0] += 1
    sf = os.path.join(fuzz_root, f"en{_counter[0]}")
    os.makedirs(sf, exist_ok=True)
    for t in TABLES + ("documents",):
        if t == "events":
            continue
        dst = f"{sf}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copy(f"{BASE}/{t}.parquet", dst)
    pq.write_table(
        pa.table({
            # colliding ids + one NULL (round-11 hostile-id class)
            "event_id": pa.array(
                [None if i == 1 else i // 2 for i in range(len(evs))],
                type=pa.int64()),
            "ts": pa.array([e[0] for e in evs], type=pa.timestamp("us")),
            "user_id": pa.array([e[1] for e in evs], type=pa.int64()),
            "event_type": pa.array([e[2] for e in evs], type=pa.string()),
            "value": pa.array([e[3] for e in evs], type=pa.float64()),
            "props": pa.array([e[4] for e in evs], type=pa.string()),
        }),
        f"{sf}/events.parquet",
    )
    for name in ("sessionize_events", "event_props_json",
                 "event_type_pivot", "skew_salted_counts",
                 "event_cube", "robust_outliers",
                 # round-6: the IVM signed-delta merge (NULL-user
                 # group, NULL event_ids out of the feed) and the
                 # Morton quantizer (NULL/pre-epoch/far-future ts)
                 "ivm_user_totals", "zorder_layout",
                 # round-6 session 6: per-user chains on microsecond
                 # ties, weighted election ties, QI classes over
                 # non-finite value buckets, epoch-residue calendar
                 # cells on pre-epoch rows, signup/purchase lags,
                 # co-occurrence on tiny baskets
                 "event_transitions", "label_vote", "l_diversity_audit",
                 "seasonal_baseline", "conversion_lag",
                 "item_cooccurrence",
                 # round-7: per-user run chains under NULL types,
                 # NULL ts and microsecond ties
                 "run_compress"):
        ok, msg = compare(QUERIES[name](spark, sf), ORACLE_SQL[name], sf)
        assert ok, f"{name} diverged on {evs!r}: {msg}"


_ORD = st.tuples(
    st.one_of(st.none(), st.integers(min_value=0, max_value=5)),  # cust
    st.sampled_from(["O", "F", "P", None]),
    st.one_of(st.none(), st.sampled_from([0.0, -0.0]), st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False)),  # price
    st.one_of(st.none(), st.datetimes(
        min_value=dt.datetime(1995, 1, 1),
        max_value=dt.datetime(1995, 1, 20),
    )),  # tight range → same-day collisions exercise OHLC aggregation
    # orderkey from a SMALL domain (collisions likely, NULLs allowed):
    # the round-11 hostile-orders find was an exact-key twin making
    # the open/close arg-pick engine-arbitrary — unique range(n) ids
    # could never re-find that class generatively
    st.one_of(st.none(), st.integers(min_value=0, max_value=6)),
)


@settings(
    max_examples=_N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_ORD, min_size=1, max_size=15))
def test_ohlc_queries_match_oracle_on_arbitrary_orders(
    spark, fuzz_root, ords
):
    """Arbitrary orders (NULL/zero/negative prices, NULL keys/dates,
    same-day collisions) through the OHLC window pipelines — zero
    closes against lag-division, decimal window sums, percentile
    ranks."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare

    _counter[0] += 1
    sf = os.path.join(fuzz_root, f"or{_counter[0]}")
    os.makedirs(sf, exist_ok=True)
    for t in TABLES + ("documents",):
        if t == "orders":
            continue
        dst = f"{sf}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copy(f"{BASE}/{t}.parquet", dst)
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array([o[4] for o in ords], type=pa.int64()),
            "o_custkey": pa.array([o[0] for o in ords], type=pa.int64()),
            "o_orderstatus": pa.array(
                [o[1] for o in ords], type=pa.string()),
            "o_totalprice": pa.array(
                [o[2] for o in ords], type=pa.float64()),
            "o_orderdate": pa.array(
                [o[3] for o in ords], type=pa.timestamp("us")),
            "o_orderpriority": pa.array(
                ["1-URGENT"] * len(ords), type=pa.string()),
        }),
        f"{sf}/orders.parquet",
    )
    for name in ("ohlc_daily", "daily_returns", "moving_avg",
                 "topk_by_volume", "price_percentiles",
                 # round-6: the dyadic-kernel EWMA (lag windows over
                 # arbitrary same-day collisions and -0.0 prices)
                 "ewma_prices",
                 # round-6 session 6: manifest bin packing and the
                 # retention ledger on arbitrary (date, key) shapes
                 "compaction_plan", "vacuum_plan",
                 # round-7: dangling/NULL custkeys through the FK
                 # census, validity-range joins on NULL/extreme
                 # dates, heavy-survivor join-back vs orphan keys
                 "fk_orphan_audit", "pit_enrich",
                 "tpch_q18_large_orders", "tpch_q5_local_supply"):
        ok, msg = compare(QUERIES[name](spark, sf), ORACLE_SQL[name], sf)
        assert ok, f"{name} diverged on {ords!r}: {msg}"


_NAME = st.one_of(st.none(), st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=30))


@settings(
    max_examples=_N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_NAME, min_size=1, max_size=25))
def test_ticker_sync_matches_oracle_on_arbitrary_names(
    spark, fuzz_root, names
):
    """Arbitrary unicode customer names through the diff + fuzzy
    rename machinery (gram blocking, containment, token overlap,
    deterministic 1:1 assignment) — the operator with the most
    string machinery gets the generative treatment too."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare

    _counter[0] += 1
    sf = os.path.join(fuzz_root, f"cu{_counter[0]}")
    os.makedirs(sf, exist_ok=True)
    for t in TABLES + ("documents",):
        if t == "customer":
            continue
        dst = f"{sf}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copy(f"{BASE}/{t}.parquet", dst)
    n = len(names)
    pq.write_table(
        pa.table({
            "c_custkey": pa.array(range(1, n + 1), type=pa.int64()),
            "c_name": pa.array(names, type=pa.string()),
            "c_nationkey": pa.array([i % 5 for i in range(n)],
                                    type=pa.int32()),
            "c_acctbal": pa.array([float(i) for i in range(n)],
                                  type=pa.float64()),
            "c_mktsegment": pa.array(
                ["BUILDING", "MACHINERY"][:1] * n, type=pa.string()),
        }),
        f"{sf}/customer.parquet",
    )
    for name in ("snapshot_diff", "rename_detection",
                 "rename_detection_parity", "symbol_normalize"):
        ok, msg = compare(QUERIES[name](spark, sf), ORACLE_SQL[name], sf)
        assert ok, f"{name} diverged on {names!r}: {msg}"


_PRICE = st.one_of(
    st.none(), st.sampled_from([0.0, -0.0]),
    st.floats(min_value=-1e4, max_value=1e4, allow_nan=False),
)
_LI = st.tuples(
    st.sampled_from(["N", "R", "A", None]),   # returnflag
    st.sampled_from(["O", "F", None]),        # linestatus
    _PRICE, _PRICE,                           # quantity, extendedprice
    st.one_of(st.none(), st.floats(
        min_value=-1.0, max_value=2.0, allow_nan=False)),  # discount
    st.one_of(st.none(), st.floats(
        min_value=-1.0, max_value=2.0, allow_nan=False)),  # tax
    st.one_of(st.none(), st.datetimes(
        min_value=dt.datetime(1995, 1, 1),
        max_value=dt.datetime(2000, 1, 1))),  # shipdate
)


@settings(
    max_examples=_N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_LI, min_size=1, max_size=15))
def test_pricing_summary_matches_oracle_on_arbitrary_lineitems(
    spark, fuzz_root, lis
):
    """Arbitrary lineitems (NULL flags/values, ±0.0, negative and
    out-of-domain discounts/taxes, NULL/boundary shipdates) through
    the flagship 8-aggregate decimal-quantized pipeline."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare

    _counter[0] += 1
    sf = os.path.join(fuzz_root, f"li{_counter[0]}")
    os.makedirs(sf, exist_ok=True)
    for t in TABLES + ("documents",):
        if t == "lineitem":
            continue
        dst = f"{sf}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copy(f"{BASE}/{t}.parquet", dst)
    n = len(lis)
    pq.write_table(
        pa.table({
            "l_orderkey": pa.array(range(n), type=pa.int64()),
            "l_partkey": pa.array([1] * n, type=pa.int64()),
            "l_suppkey": pa.array([1] * n, type=pa.int64()),
            "l_linenumber": pa.array([1] * n, type=pa.int32()),
            "l_quantity": pa.array([x[2] for x in lis], type=pa.float64()),
            "l_extendedprice": pa.array(
                [x[3] for x in lis], type=pa.float64()),
            "l_discount": pa.array([x[4] for x in lis], type=pa.float64()),
            "l_tax": pa.array([x[5] for x in lis], type=pa.float64()),
            "l_returnflag": pa.array([x[0] for x in lis], type=pa.string()),
            "l_linestatus": pa.array([x[1] for x in lis], type=pa.string()),
            "l_shipdate": pa.array(
                [x[6] for x in lis], type=pa.timestamp("us")),
        }),
        f"{sf}/lineitem.parquet",
    )
    ok, msg = compare(
        QUERIES["pricing_summary"](spark, sf),
        ORACLE_SQL["pricing_summary"], sf,
    )
    assert ok, f"pricing_summary diverged on {lis!r}: {msg}"


_DOCMETA = st.tuples(
    st.one_of(st.none(), st.integers(min_value=0, max_value=9)),  # doc_id
    st.one_of(st.none(), st.sampled_from(["a", "b", "c", ""])),   # source
    st.one_of(                                                     # n_chars
        st.none(),
        st.integers(min_value=-(2**40), max_value=2**40),
        st.sampled_from([0, -1, 15, 16, 17, 1023, 1024, 2**62]),
    ),
)


@settings(
    max_examples=_N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_DOCMETA, min_size=1, max_size=15))
def test_distrib_queries_match_oracle_on_arbitrary_doc_meta(
    spark, fuzz_root, metas
):
    """Arbitrary (doc_id, source, n_chars) — NULL ids/sources/lengths,
    negative and astronomically large lengths, duplicate ids, empty
    source strings — through the distribution-audit family: quantile
    ranks, KS bin clamping (a source living entirely in negative bins
    must not divide by zero), and stratified quota arithmetic."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare

    _counter[0] += 1
    sf = os.path.join(fuzz_root, f"dm{_counter[0]}")
    os.makedirs(sf, exist_ok=True)
    for t in TABLES:
        dst = f"{sf}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copy(f"{BASE}/{t}.parquet", dst)
    pq.write_table(
        pa.table({
            "doc_id": pa.array([m[0] for m in metas], type=pa.int64()),
            "text": pa.array(["w"] * len(metas), type=pa.string()),
            "lang": pa.array(["en"] * len(metas), type=pa.string()),
            "source": pa.array([m[1] for m in metas], type=pa.string()),
            "n_chars": pa.array([m[2] for m in metas], type=pa.int64()),
        }),
        f"{sf}/documents.parquet",
    )
    for name in ("group_quantiles", "ks_drift", "stratified_sample",
                 # round-6: quantile normalization (arbitrary n_chars
                 # domains, single-doc sources, all-equal scores)
                 "quantile_calibrate",
                 # round-6 session 6: the bounded-bin sketch vs exact
                 # ranks on negative/astronomical lengths
                 "histogram_quantiles"):
        ok, msg = compare(QUERIES[name](spark, sf), ORACLE_SQL[name], sf)
        assert ok, f"{name} diverged on {metas!r}: {msg}"


# round-8 batch 3: the six remaining TPC-H shapes under ARBITRARY
# relational content — NULL keys/dates/prices everywhere, non-finite
# retail prices crossing Q9's profit arithmetic, negative revenues
# driving Q11's global threshold negative, duplicate (part, supplier)
# pairs exercising Q20's window shares and Q15's exact-tie argmax.
_TPCH_B3 = (
    "tpch_q6_forecast_revenue", "tpch_q9_product_profit",
    "tpch_q11_important_parts", "tpch_q12_lateness_priority",
    "tpch_q15_top_supplier", "tpch_q20_surplus_suppliers",
)

_B3_LI = st.tuples(
    st.one_of(st.none(), st.integers(min_value=1, max_value=3)),  # partkey
    st.one_of(st.none(), st.integers(min_value=1, max_value=2)),  # suppkey
    st.integers(min_value=0, max_value=4),                        # orderkey
    _PRICE, _PRICE,                            # quantity, extendedprice
    st.one_of(st.none(), st.floats(
        min_value=-1.0, max_value=2.0, allow_nan=False)),  # discount
    st.one_of(st.none(), st.datetimes(
        min_value=dt.datetime(1995, 1, 1),
        max_value=dt.datetime(2000, 1, 1))),   # shipdate
)
_B3_ORDER = st.tuples(
    st.one_of(st.none(), st.datetimes(
        min_value=dt.datetime(1995, 1, 1),
        max_value=dt.datetime(2000, 1, 1))),   # orderdate
    st.sampled_from(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-LOW",
                     "5-LOW", None]),          # priority
)
_B3_RETAIL = st.sampled_from(
    [None, 10.0, -1.0, 0.0, float("nan"), float("inf"), 1e30]
)


@settings(
    max_examples=_N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(_B3_LI, min_size=1, max_size=15),
    st.lists(_B3_ORDER, min_size=5, max_size=5),
    st.lists(_B3_RETAIL, min_size=3, max_size=3),
)
def test_tpch_b3_match_oracle_on_arbitrary_relations(
    spark, fuzz_root, lis, orders, retail
):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare

    _counter[0] += 1
    sf = os.path.join(fuzz_root, f"b3_{_counter[0]}")
    os.makedirs(sf, exist_ok=True)
    n = len(lis)
    pq.write_table(
        pa.table({
            "l_orderkey": pa.array(
                [int(x[2]) for x in lis], type=pa.int64()),
            "l_partkey": pa.array([x[0] for x in lis], type=pa.int64()),
            "l_suppkey": pa.array([x[1] for x in lis], type=pa.int64()),
            "l_linenumber": pa.array([1] * n, type=pa.int32()),
            "l_quantity": pa.array([x[3] for x in lis], type=pa.float64()),
            "l_extendedprice": pa.array(
                [x[4] for x in lis], type=pa.float64()),
            "l_discount": pa.array([x[5] for x in lis], type=pa.float64()),
            "l_tax": pa.array([0.0] * n, type=pa.float64()),
            "l_returnflag": pa.array(["N"] * n, type=pa.string()),
            "l_linestatus": pa.array(["O"] * n, type=pa.string()),
            "l_shipdate": pa.array(
                [x[6] for x in lis], type=pa.timestamp("us")),
        }),
        f"{sf}/lineitem.parquet",
    )
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array(range(5), type=pa.int64()),
            "o_custkey": pa.array([1] * 5, type=pa.int64()),
            "o_orderstatus": pa.array(["O"] * 5, type=pa.string()),
            "o_totalprice": pa.array([100.0] * 5, type=pa.float64()),
            "o_orderdate": pa.array(
                [o[0] for o in orders], type=pa.timestamp("us")),
            "o_orderpriority": pa.array(
                [o[1] for o in orders], type=pa.string()),
        }),
        f"{sf}/orders.parquet",
    )
    pq.write_table(
        pa.table({
            "p_partkey": pa.array([1, 2, 3], type=pa.int64()),
            "p_name": pa.array(["red widget", "small bolt", None]),
            "p_brand": pa.array(["Brand#12"] * 3, type=pa.string()),
            "p_type": pa.array(["PROMO"] * 3, type=pa.string()),
            "p_size": pa.array([3] * 3, type=pa.int32()),
            "p_retailprice": pa.array(retail, type=pa.float64()),
        }),
        f"{sf}/part.parquet",
    )
    pq.write_table(
        pa.table({
            "s_suppkey": pa.array([1, 2], type=pa.int64()),
            "s_name": pa.array(["s-one", None], type=pa.string()),
            "s_nationkey": pa.array([1, None], type=pa.int32()),
            "s_acctbal": pa.array([1.0, 2.0], type=pa.float64()),
        }),
        f"{sf}/supplier.parquet",
    )
    for t in TABLES + ("documents",):
        dst = f"{sf}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copy(f"{BASE}/{t}.parquet", dst)
    for name in _TPCH_B3:
        ok, msg = compare(QUERIES[name](spark, sf), ORACLE_SQL[name], sf)
        assert ok, f"{name} diverged: {msg}\nlis={lis!r}\nretail={retail!r}"


# round-11 (judge ask #5): the generative twin of the STATIC
# hostile-embeddings probe. That probe is a curated 15-vector salt;
# this property draws ARBITRARY float32 arrays — NaN/±Inf/subnormal
# components, NULL ELEMENTS inside otherwise-valid vectors (a class
# the static salt lacks entirely), ±0.0, float32-huge magnitudes,
# wrong dims (0..70 around the 64 contract), NULL embeddings, NULL
# labels — salts them onto the benign base corpus exactly like the
# probe does, and requires the ENTIRE embeddings-reading family to
# stay engine-vs-oracle identical. The round-10 denormal-tiny
# task-kill (quantized norm 0 passing the "some component nonzero"
# gate) is precisely the class hypothesis re-finds here.
_F32_ANY = st.floats(
    width=32, allow_nan=True, allow_infinity=True, allow_subnormal=True
)
_FUZZ_VEC = st.one_of(
    st.none(),
    st.lists(st.one_of(st.none(), _F32_ANY), min_size=0, max_size=70),
    # dimension-exact vectors get extra weight: most gates only
    # engage after the 64-dim contract check passes
    st.lists(st.one_of(st.none(), _F32_ANY), min_size=64, max_size=64),
)
_EMB_ROW = st.tuples(
    _FUZZ_VEC, st.one_of(st.none(), st.integers(min_value=0, max_value=15))
)

# every query whose oracle reads the embeddings table (the static
# probe's own selection predicate, frozen so a rename is loud)
_EMBEDDING_FAMILY = (
    "ann_recall", "cosine_topk", "embedding_centroid_drift",
    "embedding_dedup", "embedding_outliers", "embedding_quantize",
    "embedding_stats", "hard_negatives", "ivf_topk", "kmeans_topics",
    "lsh_bucketed_neighbors", "neighbor_triangles", "pagerank_sim",
    "pq_adc_topk", "pq_recall", "semdedup",
)


@settings(
    max_examples=_N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_EMB_ROW, min_size=1, max_size=8))
def test_embedding_family_matches_oracle_on_hostile_vectors(
    spark, fuzz_root, rows
):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
    from tests.oracle_check import compare

    _counter[0] += 1
    sf = os.path.join(fuzz_root, f"ef{_counter[0]}")
    os.makedirs(sf, exist_ok=True)
    for t in TABLES + ("documents",):
        if t == "embeddings":
            continue
        dst = f"{sf}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copy(f"{BASE}/{t}.parquet", dst)
    base = pq.read_table(f"{BASE}/embeddings.parquet")
    max_id = pa.compute.max(base.column("vec_id")).as_py()
    hostile = pa.table(
        {
            # pairs SHARE a vec_id and one is NULL (round-11
            # hostile-id class as a permanent fuzz axis)
            "vec_id": pa.array(
                [None if i == 1 else max_id + 1 + i // 2
                 for i in range(len(rows))], pa.int64()),
            "embedding": pa.array(
                [r[0] for r in rows], pa.list_(pa.float32())),
            "label": pa.array([r[1] for r in rows], pa.int32()),
        },
        schema=base.schema,
    )
    pq.write_table(
        pa.concat_tables([base, hostile]), f"{sf}/embeddings.parquet")
    for name in _EMBEDDING_FAMILY:
        ok, msg = compare(QUERIES[name](spark, sf), ORACLE_SQL[name], sf)
        assert ok, f"{name} diverged on {rows!r}: {msg}"
