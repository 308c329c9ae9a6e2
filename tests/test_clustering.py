"""Pins for unrolled integer k-means (plans/clustering.py): the
catalogue is min(K, n) rows, membership partitions the indexable set,
empty clusters carry their centroid, and hostile vectors are gated
out rather than crashing the ANSI plan."""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from psx_data_pipeline_spark.plans import ORACLE_SQL, QUERIES
from tests.oracle_check import TABLES, compare
from psx_data_pipeline_spark.plans.clustering import _K, _quantized

SF = "/root/testdata/sf0.01"
_BASE = SF


def test_membership_partitions_indexable_set(spark):
    rows = QUERIES["kmeans_topics"](spark, SF).collect()
    assert len(rows) == _K
    assert sorted(r.cluster_id for r in rows) == list(range(1, _K + 1))
    n_indexable = _quantized(spark, SF).count()
    assert sum(r.n_members for r in rows) == n_indexable
    assert all(r.wss_q >= 0 for r in rows)


def test_tiny_corpus_one_seed_per_point(spark, tmp_path):
    """Fewer vectors than K: the catalogue is min(K, n) seeds (each
    point sits on its own seed at distance 0), and hostile rows
    (NULL id, NaN component, wrong dim, zero vector) are gated out
    up front — and the hostile fixture still hash-matches DuckDB."""
    sf = str(tmp_path)
    good = [[float(i + 1)] * 64 for i in range(3)]
    rows = [
        (1, good[0], 0),
        (2, good[1], 0),
        (3, good[2], 0),
        (None, good[0], 0),            # NULL id
        (4, [float("nan")] * 64, 0),   # NaN components
        (5, [1.0] * 63, 0),            # wrong dimension
        (6, [0.0] * 64, 0),            # zero vector (not indexable)
        (7, None, 0),                  # NULL vector
    ]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array(
                    [r[1] for r in rows], pa.list_(pa.float32())
                ),
                "label": pa.array([r[2] for r in rows], pa.int32()),
            }
        ),
        f"{sf}/embeddings.parquet",
    )
    for t in TABLES:  # oracle views for the untouched tables
        dst = f"{sf}/{t}.parquet"
        if not os.path.exists(dst):
            try:
                os.link(f"{_BASE}/{t}.parquet", dst)
            except OSError:
                shutil.copy(f"{_BASE}/{t}.parquet", dst)
    out = QUERIES["kmeans_topics"](spark, sf).collect()
    assert len(out) == 3
    assert sum(r.n_members for r in out) == 3
    assert all(r.n_members == 1 and r.wss_q == 0 for r in out)
    ok, msg = compare(
        QUERIES["kmeans_topics"](spark, sf), ORACLE_SQL["kmeans_topics"], sf
    )
    assert ok, msg
