"""Hostile-id probe: primary-key violations on the three tables whose
probes always mint FRESH ids (documents, embeddings, events).

Round-11's orders find generalized a class: any arg-pick / ranked
window whose ordering key assumes id uniqueness is ENGINE-ARBITRARY
the moment hostile data duplicates the id (both engines break
arg-ties by whichever row their aggregation state saw first; at
100 TB the same property is run-to-run nondeterminism). The existing
text/events/embeddings probes salt degenerate VALUES but give every
hostile row a fresh `max_id + i` id, so id-uniqueness assumptions in
the ~40 row_number/min_by sites over these tables were never
exercised. This probe salts:

- documents: one doc_id carried by TWO rows (different text, lang,
  source) and a NULL doc_id row;
- embeddings: one vec_id carried by TWO rows (different vectors and
  labels) and a NULL vec_id row;
- events: one event_id carried by TWO rows (different ts, type,
  value, user) and a NULL event_id row;

then re-runs the full DuckDB oracle comparison for every query
reading any of the three. Any MISMATCH or one-sided crash is a real
latent bug in either the Spark plan or the oracle SQL.

Usage:
    python tools/hostile_id_probe.py
    python tools/hostile_id_probe.py --queries cosine_topk
"""

from __future__ import annotations

import datetime as dt
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hostile_common import BASE, copy_untouched, run_probe  # noqa: E402

OUT = "/tmp/hostile_id_corpus"

_SALTED = ("documents", "embeddings", "events")


def _append(table: str, rows: list[dict]) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{BASE}/{table}.parquet")
    hostile = pa.Table.from_pylist(rows, schema=tbl.schema)
    pq.write_table(
        pa.concat_tables([tbl, hostile.cast(tbl.schema)]),
        f"{OUT}/{table}.parquet",
    )


def build_corpus() -> None:
    copy_untouched(OUT, salted=_SALTED)

    _append("documents", [
        # the same doc_id twice, nothing else equal — any per-doc pick
        # (rarest shingle, chunk rank, rep election) must stay total
        {"doc_id": 990001, "text": "twin alpha text about markets",
         "lang": "en", "source": "src0", "n_chars": 29},
        {"doc_id": 990001, "text": "twin beta completely different",
         "lang": "ur", "source": "src1", "n_chars": 30},
        # a THIRD copy that shares its token LENGTH with the first —
        # per-(id, length) rollups that survive the simple twin still
        # merge this one (the dup_span_fraction find needed it)
        {"doc_id": 990001, "text": "twin gamma words about nothing",
         "lang": "en", "source": "src0", "n_chars": 30},
        # shared-content twins: the SAME query term in both rows of
        # one id (df/tf and span-coverage attribution seams)
        {"doc_id": 990002, "text": "spark spark query scan merge",
         "lang": "en", "source": "src0", "n_chars": 28},
        {"doc_id": 990002, "text": "spark window merge vector",
         "lang": "en", "source": "src1", "n_chars": 25},
        # NULL-id PAIR: groups under the NULL key (engines must agree
        # whether two NULL ids are one group), joins never match it
        {"doc_id": None, "text": "null id document", "lang": "en",
         "source": "src0", "n_chars": 16},
        {"doc_id": None, "text": "second null id paper", "lang": "ur",
         "source": "src0", "n_chars": 20},
        # NEGATIVE ids (round-12 ADVICE): Python floor-mod and SQL
        # trunc-mod diverge below zero, so every id%k formula shared
        # between a Python synth seam and a SQL oracle is suspect —
        # and `% 3 = 2`-style predicates diverge from the guarded
        # CASE arms they claim to restate. -7 exercises the video
        # modality arm (-7 % 3 = -1), -6 the image arm (= 0), -4 the
        # bmp/ppm evenness split and the stream/store side split.
        {"doc_id": -7, "text": "negative seven id doc words",
         "lang": "en", "source": "src0", "n_chars": 27},
        {"doc_id": -6, "text": "negative six id doc papers",
         "lang": "ur", "source": "src1", "n_chars": 26},
        {"doc_id": -4, "text": "negative four id doc market",
         "lang": "en", "source": "src0", "n_chars": 27},
        # PAYLOAD twins (round 12): identical (doc_id, text) differing
        # only in lang/source — any per-doc pick whose ordering stops
        # at (id, content) emits engine-arbitrary metadata here
        {"doc_id": 990003, "text": "payload twin same words",
         "lang": "en", "source": "srcA", "n_chars": 23},
        {"doc_id": 990003, "text": "payload twin same words",
         "lang": "ur", "source": "srcB", "n_chars": 23},
    ])
    _append("embeddings", [
        # payload twins: identical (vec_id, embedding), differing label
        {"vec_id": 990002, "embedding": [0.5] * 64, "label": 1},
        {"vec_id": 990002, "embedding": [0.5] * 64, "label": 7},
        {"vec_id": 990001, "embedding": [0.25] * 64, "label": 1},
        {"vec_id": 990001, "embedding": [-0.75] * 64, "label": 2},
        {"vec_id": 990001, "embedding": [0.125] * 64, "label": 4},
        {"vec_id": None, "embedding": [0.5] * 64, "label": 3},
        {"vec_id": None, "embedding": [-0.5] * 64, "label": 5},
        # negative ids through split/query-set predicates (vec_id%k)
        {"vec_id": -3, "embedding": [0.5] * 64, "label": 1},
        {"vec_id": -2, "embedding": [-0.25] * 64, "label": 2},
    ])
    _append("events", [
        {"event_id": 990001, "ts": dt.datetime(2024, 3, 1, 10, 0),
         "user_id": 1, "event_type": "click", "value": 5.0,
         "props": None},
        {"event_id": 990001, "ts": dt.datetime(2024, 3, 2, 11, 0),
         "user_id": 2, "event_type": "purchase", "value": 7.0,
         "props": '{"k": 1}'},
        {"event_id": None, "ts": dt.datetime(2024, 3, 3, 12, 0),
         "user_id": 1, "event_type": "view", "value": 1.0,
         "props": None},
        {"event_id": None, "ts": dt.datetime(2024, 3, 4, 12, 0),
         "user_id": 2, "event_type": "click", "value": 2.0,
         "props": None},
        # negative ids through insert/delete predicates (event_id%k)
        # and catalog-item derivations (event_id % N_CATALOG)
        {"event_id": -9, "ts": dt.datetime(2024, 3, 5, 9, 0),
         "user_id": 1, "event_type": "click", "value": 3.0,
         "props": None},
        {"event_id": -17, "ts": dt.datetime(2024, 3, 5, 10, 0),
         "user_id": 2, "event_type": "view", "value": 4.0,
         "props": None},
        # EXACT (user, ts, event_id, type) twins differing only in
        # value/props: any keep-last/arg-pick whose ordering stops at
        # the "unique" id emits an engine-arbitrary payload here
        # (round-12 dedup_latest audit find)
        {"event_id": 990777, "ts": dt.datetime(2024, 3, 6, 8, 0),
         "user_id": 3, "event_type": "click", "value": 1.0,
         "props": None},
        {"event_id": 990777, "ts": dt.datetime(2024, 3, 6, 8, 0),
         "user_id": 3, "event_type": "click", "value": 8.0,
         "props": '{"z": 9}'},
    ])


def main() -> int:
    pat = re.compile(r"\b(documents|embeddings|events)\b")
    return run_probe(
        build_corpus, OUT, lambda sql: pat.search(sql.lower()) is not None
    )


if __name__ == "__main__":
    raise SystemExit(main())
