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
            shutil.copy(f"{_BASE}/{t}.parquet", dst)
    out = QUERIES["kmeans_topics"](spark, sf).collect()
    assert len(out) == 3
    assert sum(r.n_members for r in out) == 3
    assert all(r.n_members == 1 and r.wss_q == 0 for r in out)
    ok, msg = compare(
        QUERIES["kmeans_topics"](spark, sf), ORACLE_SQL["kmeans_topics"], sf
    )
    assert ok, msg


def test_semdedup_flags_medoid_duplicates(spark, tmp_path):
    """Round-7 review find, pinned: the cosine threshold test must be
    SATISFIABLE — a dropped 10⁶ milli-scale factor made it
    unsatisfiable by Cauchy-Schwarz and n_dups identically zero, and
    the shared-oracle hash compare was structurally blind to it.
    Pins: an exact copy of a cluster's medoid is flagged, a
    duplicated vec_id cannot fan the medoid into two rep rows, and
    the fixture corpus itself produces nonzero flags (non-vacuous
    threshold)."""
    from pyspark.sql import functions as F  # noqa: F401

    sf = str(tmp_path)
    dim = 64

    def vec(block, mag=10.0):
        v = [0.0] * dim
        for d in range(8 * block, 8 * block + 8):
            v[d] = mag
        return v

    rows = (
        # ids 1..8 seed the 8 clusters with well-separated vectors
        [(i + 1, vec(i), 0) for i in range(8)]
        # 9: exact copy of id 1's vector -> same cluster, cos = 1.0
        + [(9, vec(0), 0)]
        # 10: duplicated vec_id with a DIFFERENT vector (replay
        # corruption) — must not fan the rep row out
        + [(10, vec(1), 0), (10, vec(1, 9.0), 0)]
    )
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{sf}/embeddings.parquet")
    from psx_data_pipeline_spark.plans import QUERIES, clear_session_memos

    clear_session_memos()
    out = {r.cluster_id: r for r in QUERIES["semdedup"](spark, sf).collect()}
    clear_session_memos()
    # exactly one row per populated cluster even with the dup vec_id
    assert all(
        sum(1 for c in out if c == cid) == 1 for cid in out
    )
    # id 9 is an exact duplicate of its cluster's medoid
    dup_cluster = [r for r in out.values() if r.n_members == 2 and r.n_dups]
    assert any(r.n_dups == 1 for r in dup_cluster), out
    # the fixture corpus flags a nonzero number of members, so the
    # oracle hash-compare exercises BOTH branches of the flag
    fixture = QUERIES["semdedup"](spark, "/root/testdata/sf0.01").collect()
    assert sum(r.n_dups for r in fixture) > 0, fixture
