"""Hostile events/embeddings probe: the sibling of
hostile_text_probe.py for the other two fixture tables.

Salts sf0.01 with adversarial rows the dense synthetic fixtures never
contain, then re-runs the full DuckDB oracle comparison for every
query whose oracle reads `events` or `embeddings`:

events — NULL user_id, NULL event_type, NULL value, NULL props,
  malformed / empty / non-object / mistyped props JSON,
  NULL ts, pre-epoch ts, far-future ts, two events on the same
  microsecond for one user (ordering ties);
embeddings — NULL embedding, empty list, all-zero vector (zero norm:
  the cosine division trap), NaN / +-Inf components, a huge-magnitude
  vector, a duplicate of an existing vector, NULL label.

Any MISMATCH or one-sided crash is a real latent bug in either the
Spark plan or the oracle SQL (both are ours — the probe finds where
they silently disagree off the happy path).

Usage:
    python tools/hostile_events_probe.py
    python tools/hostile_events_probe.py --queries sessionize_events
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hostile_common import BASE, copy_untouched, run_probe  # noqa: E402

OUT = "/tmp/hostile_events_corpus"


def build_corpus() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    copy_untouched(OUT, salted=("events", "embeddings"))

    # events: preserve the fixture's exact physical timestamp type by
    # appending through pyarrow (DuckDB COPY normalizes timestamps —
    # same ts_us-seam reasoning as scale_rehearsal.build_corpus)
    tbl = pq.read_table(f"{BASE}/events.parquet")
    max_id = max(tbl.column("event_id").to_pylist())
    base_ts = tbl.column("ts")[0].as_py()

    def ev(i, ts, user, etype, value, props):
        return {
            "event_id": max_id + 1 + i, "ts": ts, "user_id": user,
            "event_type": etype, "value": value, "props": props,
        }

    import datetime as dt

    rows = [
        ev(0, base_ts, None, "click", 1.0, '{"k": 1}'),
        ev(1, base_ts, 1, None, 1.0, '{"k": 2}'),
        ev(2, base_ts, 1, "click", None, '{"k": 3}'),
        ev(3, base_ts, 1, "click", 1.0, None),
        ev(4, base_ts, 1, "click", 1.0, ""),
        ev(5, base_ts, 1, "click", 1.0, "not json"),
        ev(6, base_ts, 1, "click", 1.0, "[1,2,3]"),
        ev(7, base_ts, 1, "click", 1.0, '{"k": null}'),
        ev(8, base_ts, 1, "click", 1.0, '{"other": 5}'),
        ev(15, base_ts, 1, "click", 1.0, '{"k": "12"}'),   # quoted number
        ev(16, base_ts, 1, "click", 1.0, '{"k": 7.5}'),    # non-integer
        ev(17, base_ts, 1, "click", 1.0, '{"k": true}'),   # boolean
        ev(9, None, 2, "view", 2.0, '{"k": 4}'),
        ev(10, dt.datetime(1969, 12, 31, 23, 59, 59), 2, "view", 2.0, '{"k": 5}'),
        ev(11, dt.datetime(2099, 1, 1), 2, "view", 2.0, '{"k": 6}'),
        # same-microsecond tie for one user (ordering determinism)
        ev(12, base_ts + dt.timedelta(seconds=1), 3, "click", 1.0, '{"k": 7}'),
        ev(13, base_ts + dt.timedelta(seconds=1), 3, "purchase", 9.0, '{"k": 8}'),
        ev(14, base_ts, None, None, None, None),
        # non-finite / overflow values: floor(Inf)->BIGINT errors in
        # DuckDB but saturates in Spark; |v| >= 2^63/1000 overflows
        # the milli-int floor (robust_outliers fence class)
        ev(18, base_ts, 4, "click", float("nan"), '{"k": 9}'),
        ev(19, base_ts, 4, "click", float("inf"), '{"k": 10}'),
        ev(20, base_ts, 4, "click", float("-inf"), '{"k": 11}'),
        ev(21, base_ts, 4, "click", 1e30, '{"k": 12}'),
        ev(22, base_ts, 4, "click", -1e30, '{"k": 13}'),
    ]
    hostile = pa.Table.from_pylist(rows, schema=tbl.schema)
    pq.write_table(
        pa.concat_tables([tbl, hostile.cast(tbl.schema)]),
        f"{OUT}/events.parquet",
    )

    # embeddings
    etbl = pq.read_table(f"{BASE}/embeddings.parquet")
    emax = max(etbl.column("vec_id").to_pylist())
    dim = len(etbl.column("embedding")[0].as_py())
    first = etbl.column("embedding")[0].as_py()
    nan, inf = float("nan"), float("inf")
    erows = [
        {"vec_id": emax + 1, "embedding": None, "label": 1},
        {"vec_id": emax + 2, "embedding": [], "label": 1},
        {"vec_id": emax + 3, "embedding": [0.0] * dim, "label": 1},
        {"vec_id": emax + 4, "embedding": [nan] + [0.1] * (dim - 1), "label": 1},
        {"vec_id": emax + 5, "embedding": [inf] + [0.1] * (dim - 1), "label": 1},
        {"vec_id": emax + 6, "embedding": [-inf] + [0.1] * (dim - 1), "label": 1},
        {"vec_id": emax + 7, "embedding": [1e30] * dim, "label": 1},
        {"vec_id": emax + 8, "embedding": list(first), "label": None},
        {"vec_id": emax + 9,
         "embedding": [None] + [0.1] * (dim - 1), "label": 1},
    ]
    ehost = pa.Table.from_pylist(erows, schema=etbl.schema)
    pq.write_table(
        pa.concat_tables([etbl, ehost.cast(etbl.schema)]),
        f"{OUT}/embeddings.parquet",
    )


def main() -> int:
    return run_probe(
        build_corpus, OUT,
        lambda sql: "events" in sql.lower() or "embeddings" in sql.lower(),
    )


if __name__ == "__main__":
    raise SystemExit(main())
