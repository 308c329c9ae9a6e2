"""Pin the degenerate-events/embeddings semantics the hostile probe
established (tools/hostile_events_probe.py): NULL keys/timestamps/
values, pre-epoch and far-future timestamps, malformed props JSON,
and NULL / zero / NaN / Inf / huge embedding vectors must neither
crash any operator nor silently diverge from the stated contract."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from psx_data_pipeline_spark.operators.similarity import (
    indexable_embedding,
    valid_embedding,
)

_DIM = 4


@pytest.fixture(scope="module")
def vec_df(spark):
    nan, inf = float("nan"), float("inf")
    rows = [
        (1, [0.1, 0.2, -0.3, 0.4]),
        (2, None),
        (3, []),
        (4, [0.0, 0.0, 0.0, 0.0]),
        (5, [nan, 0.1, 0.1, 0.1]),
        (6, [inf, 0.1, 0.1, 0.1]),
        (7, [-inf, 0.1, 0.1, 0.1]),
        (8, [1e30, 1e30, 1e30, 1e30]),
        (9, [0.1, 0.2]),  # wrong dim
        (10, [None, 0.1, 0.1, 0.1]),  # NULL component
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_embedding_validity_contract(vec_df):
    got = {
        r.vec_id: (r.v, r.ix)
        for r in vec_df.select(
            "vec_id",
            valid_embedding("embedding", _DIM).alias("v"),
            indexable_embedding("embedding", _DIM).alias("ix"),
        ).collect()
    }
    assert got[1] == (True, True)
    assert got[4] == (True, False)  # zero vector: valid, not indexable
    for bad in (2, 3, 5, 6, 7, 8, 9, 10):
        assert got[bad] == (False, False), bad


def test_embedding_validity_sql_twin(vec_df):
    """The DuckDB predicate must classify exactly like the Spark one."""
    import duckdb

    from psx_data_pipeline_spark.operators.similarity import (
        indexable_embedding_sql,
        valid_embedding_sql,
    )

    pdf = vec_df.toPandas()
    con = duckdb.connect()
    con.register("v", pdf)
    sql = (
        f"SELECT vec_id, {valid_embedding_sql('embedding', _DIM)} AS val,"
        f" {indexable_embedding_sql('embedding', _DIM)} AS ix FROM v"
    )
    duck = {r[0]: (bool(r[1]), bool(r[2])) for r in con.execute(sql).fetchall()}
    spark_side = {
        r.vec_id: (r.v, r.ix)
        for r in vec_df.select(
            "vec_id",
            valid_embedding("embedding", _DIM).alias("v"),
            indexable_embedding("embedding", _DIM).alias("ix"),
        ).collect()
    }
    assert duck == spark_side


def test_cosine_family_survives_hostile_vectors(spark, vec_df, tmp_path):
    """End to end: the gated queries run (no ANSI crash, no 0-division)
    and only indexable vectors appear in their outputs."""
    sf = str(tmp_path)
    # pad the corpus so query/centroid mod subsets are non-trivial
    import numpy as np

    extra = [
        (100 + i, [float(x) for x in np.sin(np.arange(_DIM) + i) * 0.3])
        for i in range(40)
    ]
    base = spark.createDataFrame(extra, "vec_id long, embedding array<float>")
    vec_df.unionByName(base).withColumn(
        "label", F.lit(1)
    ).write.parquet(f"{sf}/embeddings.parquet")

    from psx_data_pipeline_spark.operators.similarity import (
        lsh_bucketed_neighbors,
    )
    from psx_data_pipeline_spark.plans.similarity import _indexable
    from psx_data_pipeline_spark.sources.fixtures import load_table

    emb = _indexable(load_table(spark, "embeddings", sf))
    pairs = lsh_bucketed_neighbors(
        emb, "embedding", "vec_id", dim=_DIM, bits=4, threshold=0.1
    ).collect()
    ids = {i for r in pairs for i in (r.id_a, r.id_b)}
    assert ids.isdisjoint({2, 3, 4, 5, 6, 7, 8, 9, 10})
    assert all(math.isfinite(r.cosine) for r in pairs)


def test_user_totals_state_null_semantics():
    """The applyInPandasWithState updater skips NULL values like SQL
    SUM (NaN-poisoning crashed the int64 cast before) and emits NULL
    for an all-NULL group."""
    import pandas as pd

    # exercise the arithmetic the updater uses, worker-free
    vals = pd.Series([1.5, None, 2.25], dtype="float64")
    nn = vals.dropna()
    assert int(((nn * 1000) // 1).astype("int64").sum()) == 1500 + 2250


def test_window_floor_formula_matches_spark_on_negatives():
    """win_start = x - ((x % H) + H) % H must floor (Spark window()),
    not truncate (DuckDB //), for pre-epoch microseconds."""
    H = 3600 * 1_000_000
    for x in (-1, -1_000_000, -H, -H - 1, 0, 1, H, H + 1):
        assert x - ((x % H) + H) % H == (x // H) * H  # python // floors


def test_milli_quantization_is_total(spark):
    """MILLI_SQL must map NULL/NaN/±Inf/out-of-range doubles to NULL
    (never crash, never saturate) and agree with DuckDB value-for-
    value — the round-6 probe extension one-sided-crashed four
    queries (skew_salted_counts, event_cube, stream_window_counts,
    stream_user_totals) before the shared gate existed."""
    import duckdb

    from psx_data_pipeline_spark.functions.numeric import MILLI_SQL

    vals = [None, float("nan"), float("inf"), float("-inf"),
            1e30, -1e30, 9e12, -9e12, 9.001e12, 1.5, -1.5, 0.0, -0.0,
            123.456, -123.456]
    sdf = spark.createDataFrame([(v,) for v in vals], "value double")
    got = [r.m for r in sdf.select(
        F.expr(MILLI_SQL.format("value")).alias("m")).collect()]
    con = duckdb.connect()
    duck = [
        con.execute(
            "SELECT " + MILLI_SQL.format("value")
            + " FROM (SELECT CAST(? AS DOUBLE) AS value)", [v]
        ).fetchone()[0]
        for v in vals
    ]
    duck = [int(d) if d is not None else None for d in duck]
    assert got == duck
    # the gate itself: non-finite / out-of-range -> NULL, floor exact
    by_val = dict(zip([str(v) for v in vals], got))
    for k in ("nan", "inf", "-inf", "1e+30", "-1e+30", "9001000000000.0"):
        assert by_val[k] is None, k
    assert by_val["1.5"] == 1500 and by_val["-1.5"] == -1500
    assert by_val["9000000000000.0"] == 9_000_000_000_000_000


# --- governance audits under degenerate QI cardinalities ---------------------


def _events_table(spark, tmp_path, rows):
    import datetime as dt  # noqa: F401  (callers build timestamps)

    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    ).write.parquet(f"{sf}/events.parquet")
    return sf


def test_k_anonymity_single_uniform_class(spark, tmp_path):
    """Degenerate minimum-cardinality QI: every row lands in ONE
    equivalence class. With the class at size >= k the audit must
    report zero risk — a pipeline that counts the giant class as
    small (or divides by classes-1 somewhere) breaks exactly here."""
    import datetime as dt

    ts = dt.datetime(2024, 3, 1, 14, 30)
    rows = [(i, ts, 1, "click", 2.5, None) for i in range(6)]
    sf = _events_table(spark, tmp_path, rows)
    from psx_data_pipeline_spark.plans import QUERIES

    [r] = QUERIES["k_anonymity_audit"](spark, sf).collect()
    assert (r.event_type, r.n_classes, r.min_class_size,
            r.n_small_classes, r.rows_at_risk) == ("click", 1, 6, 0, 0)


def test_k_anonymity_every_row_unique(spark, tmp_path):
    """Degenerate maximum-cardinality QI: every row is its own
    class, so every row is at risk — the audit's worst case must
    count ALL rows, not saturate or skip singletons."""
    import datetime as dt

    ts = dt.datetime(2024, 3, 1, 14, 30)
    rows = [(i, ts, 1, "click", float(10 * i), None) for i in range(5)]
    sf = _events_table(spark, tmp_path, rows)
    from psx_data_pipeline_spark.plans import QUERIES

    [r] = QUERIES["k_anonymity_audit"](spark, sf).collect()
    assert (r.n_classes, r.min_class_size,
            r.n_small_classes, r.rows_at_risk) == (5, 1, 5, 5)


def test_l_diversity_homogeneous_class_is_exposed(spark, tmp_path):
    """k-anonymity's blind spot, pinned: a big crowd that all shares
    one sensitive value (diversity 1) is fully exposed, while a
    same-sized mixed crowd is not. Also pins the NULL-sensitive
    edge: a class whose types are ALL NULL has COUNT(DISTINCT) = 0
    and must surface as exposed, not vanish."""
    import datetime as dt

    ts = dt.datetime(2024, 3, 1, 9, 0)
    rows = (
        # value bucket 1: 5 rows, all "click" -> diversity 1, exposed
        [(i, ts, 1, "click", 1.0, None) for i in range(5)]
        # value bucket 7: 3 distinct types -> diversity 3, safe
        + [(10, ts, 1, "click", 7.0, None),
           (11, ts, 1, "view", 7.0, None),
           (12, ts, 1, "purchase", 7.0, None)]
        # value bucket 9: only NULL types -> diversity 0, exposed
        + [(20, ts, 1, None, 9.0, None),
           (21, ts, 1, None, 9.0, None)]
    )
    sf = _events_table(spark, tmp_path, rows)
    from psx_data_pipeline_spark.plans import QUERIES

    [r] = QUERIES["l_diversity_audit"](spark, sf).collect()
    assert (r.n_classes, r.min_diversity,
            r.n_low_diversity, r.rows_exposed) == (3, 0, 2, 7)
