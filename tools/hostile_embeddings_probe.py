"""Hostile-embeddings probe: re-run the DuckDB oracle comparison for
every embeddings-reading query on a corpus salted with adversarial
vectors — NULL embeddings, empty arrays, wrong dimensions (1 / 63 /
65), the zero vector (norm 0: cosine's division guard), NaN / +Inf /
-Inf components, negative zero, denormal-tiny and float32-huge
magnitudes, an exact-duplicate vector pair, and NULL labels.

The driver fixtures are uniformly dense, well-conditioned 64-dim
unit-ish vectors, so every similarity/quantization/clustering query
can be oracle-green while silently diverging from DuckDB on
degenerate input (NaN ordering in top-k windows, zip_with NULL
padding on length mismatch vs list-function errors, 0/0 in cosine,
float32 overflow). This probe puts the SAME query / SAME oracle SQL
pair in front of vectors those fixtures never produce: any MISMATCH
or one-sided crash is a real latent bug in the engine, the oracle,
or an undocumented data contract.

Usage:
    python tools/hostile_embeddings_probe.py
    python tools/hostile_embeddings_probe.py --queries cosine_topk
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hostile_common import BASE, copy_untouched, run_probe  # noqa: E402

OUT = "/tmp/hostile_embeddings_corpus"

DIM = 64


def hostile_vectors() -> list[tuple[object, object, str]]:
    """(embedding, label, why) rows. Base vector = a valid-looking
    unit-ish pattern so partially-hostile rows aren't trivially
    filtered by magnitude."""
    base = [0.1] * DIM
    nan_vec = list(base)
    nan_vec[7] = float("nan")
    inf_vec = list(base)
    inf_vec[3] = float("inf")
    ninf_vec = list(base)
    ninf_vec[5] = float("-inf")
    return [
        (None, 1, "null embedding"),
        ([], 2, "empty array"),
        ([0.5], 3, "1-dim vector"),
        ([0.1] * (DIM - 1), 4, "63-dim vector"),
        ([0.1] * (DIM + 1), 5, "65-dim vector"),
        ([0.0] * DIM, 6, "zero vector (norm 0)"),
        (nan_vec, 7, "NaN component"),
        (inf_vec, 8, "+Inf component"),
        (ninf_vec, 9, "-Inf component"),
        ([-0.0] * DIM, 10, "negative zero vector"),
        ([1e-38] * DIM, 11, "denormal-tiny magnitudes"),
        ([1e19] * DIM, 12, "float32-huge (dot overflows)"),
        (base, None, "NULL label"),
        (base, 13, "duplicate A"),
        (base, 14, "duplicate B (exact dup of A)"),
    ]


def build_corpus() -> None:
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    copy_untouched(OUT, salted=("embeddings",))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW base AS SELECT * FROM read_parquet('{BASE}/embeddings.parquet')"
    )
    max_id = con.execute("SELECT max(vec_id) FROM base").fetchone()[0]
    schema = pq.read_schema(f"{BASE}/embeddings.parquet")
    con.close()
    rows = hostile_vectors()
    hostile = pa.table(
        {
            "vec_id": pa.array(
                [max_id + 1 + i for i in range(len(rows))], type=pa.int64()
            ),
            "embedding": pa.array(
                [v for v, _l, _w in rows],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array([l for _v, l, _w in rows], type=pa.int32()),
        },
        schema=schema,
    )
    pq.write_table(
        pa.concat_tables(
            [pq.read_table(f"{BASE}/embeddings.parquet"), hostile]
        ),
        f"{OUT}/embeddings.parquet",
    )


def main() -> int:
    return run_probe(
        build_corpus, OUT, lambda sql: "embedding" in sql.lower()
    )


if __name__ == "__main__":
    raise SystemExit(main())
