"""Pins for winnowing (plans/winnowing.py): the coverage guarantee —
docs sharing a token run of >= w+k-1 tokens share a fingerprint —
plus short-doc windows and edit robustness."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from psx_data_pipeline_spark.plans import QUERIES
from psx_data_pipeline_spark.plans.winnowing import _K, _W

SF = "/root/testdata/sf0.01"


def _write_docs(tmp_path, texts):
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
        }),
        f"{tmp_path}/documents.parquet",
    )


def test_shared_run_guarantees_shared_fingerprint(spark, tmp_path):
    """Two docs share a (w+k-1)=6-token run embedded in otherwise
    disjoint text — winnowing MUST select a common fingerprint (the
    published guarantee this implementation claims)."""
    shared = "alpha beta gamma delta epsilon zeta"
    _write_docs(tmp_path, [
        f"one two three {shared} four five six",
        f"seven eight nine ten {shared} eleven twelve",
        "totally unrelated words with no common run at all here",
    ])
    rows = {r.doc_id: set(r.fingerprints.split(","))
            for r in QUERIES["winnowing_fingerprints"](
                spark, str(tmp_path)).collect()}
    assert rows[1] & rows[2], "guaranteed shared fingerprint missing"
    # density sanity: selections exist for every doc
    assert all(len(fp) >= 1 for fp in rows.values())


def test_short_docs_single_window(spark, tmp_path):
    """k <= tokens < k+w-1: one whole-list window, exactly one
    fingerprint; < k tokens: excluded."""
    _write_docs(tmp_path, [
        "a b c",            # 3 tokens = k -> 1 gram -> 1 fingerprint
        "a b",              # < k -> excluded
        "a b c d e",        # 3 grams < w -> single window min
    ])
    rows = {r.doc_id: r for r in QUERIES["winnowing_fingerprints"](
        spark, str(tmp_path)).collect()}
    assert set(rows) == {1, 3}
    assert rows[1].n_grams == 1 and rows[1].n_fingerprints == 1
    assert rows[3].n_grams == 3 and rows[3].n_fingerprints == 1


def test_position_shift_preserves_fingerprints(spark, tmp_path):
    """Prepending tokens (a pure position shift) must not change the
    fingerprints selected from the shared tail beyond the seam — the
    content-anchored property positional rolling hashes lack."""
    body = " ".join(f"tok{i}" for i in range(40))
    _write_docs(tmp_path, [body, "prefix words here " + body])
    rows = {r.doc_id: set(r.fingerprints.split(","))
            for r in QUERIES["winnowing_fingerprints"](
                spark, str(tmp_path)).collect()}
    # every fingerprint of the original body except possibly those
    # near its head window is selected from the shifted copy too
    assert len(rows[1] - rows[2]) <= _W + _K
