"""Structured-Streaming queries, oracle-checked.

Each query runs a checkpointed `Trigger.AvailableNow` stream over the
static events fixture to completion and returns the materialized
result — deterministic under replay, so the driver's DuckDB oracle
checks the *streaming* engine's output value-for-value against the
equivalent batch SQL (the strongest correctness statement available
for a streaming operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from psx_data_pipeline_spark.functions.numeric import MILLI_SQL
from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.scratch import scratch_dir
from psx_data_pipeline_spark.sources.fixtures import load_table, load_table_parallel
from psx_data_pipeline_spark.streaming.jobs import (
    incremental_ingest,
    running_user_totals,
    streaming_sessionize,
    streaming_sync_change_log,
    windowed_event_counts,
)

_HOUR_US = 3600 * 1_000_000
_GAP_US = 30 * 60 * 1_000_000

# window start must FLOOR-divide: DuckDB's integer // truncates
# toward zero, which disagrees with Spark's window() on pre-epoch
# (negative-µs) timestamps — ((x % H) + H) % H is the sign-safe
# nonnegative residue (hostile-probe finding)
STREAM_WINDOW_ORACLE = f"""
SELECT epoch_us(ts) - ((epoch_us(ts) % {_HOUR_US}) + {_HOUR_US}) % {_HOUR_US}
         AS win_start_us,
       event_type, COUNT(*) AS n,
       CAST(SUM({MILLI_SQL.format('value')}) AS BIGINT) AS value_k
FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
"""


@query("stream_window_counts", STREAM_WINDOW_ORACLE)
def q_stream_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked hourly tumbling-window counts, run as a real
    streaming query (streaming/jobs.py)."""
    return windowed_event_counts(spark, sf_dir)


STREAM_SESSIONIZE_ORACLE = f"""
WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events
            WHERE ts IS NOT NULL),
lagged AS (
  SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS prev
  FROM ev
),
flagged AS (
  SELECT *, CASE WHEN prev IS NULL OR ts_us - prev >= {_GAP_US}
                 THEN 1 ELSE 0 END AS new_s
  FROM lagged
),
sess AS (
  SELECT *, SUM(new_s) OVER (
    PARTITION BY user_id ORDER BY ts_us
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id, MIN(ts_us) AS session_start_us,
       MAX(ts_us) + {_GAP_US} AS session_end_us,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id, sid
"""


@query("stream_sessionize", STREAM_SESSIONIZE_ORACLE)
def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native `session_window` stateful sessionization (30-min gap,
    session end = last event + gap). The oracle is the batch
    gaps-and-islands SQL with the session_window boundary rule
    (a gap of exactly 30 min starts a new session — half-open
    windows), which must and does agree with the streaming state
    machine."""
    return streaming_sessionize(spark, sf_dir)


STREAM_USER_TOTALS_ORACLE = f"""
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM({MILLI_SQL.format('value')}) AS BIGINT) AS value_k,
       MAX(event_id) AS max_event_id
FROM events GROUP BY user_id
"""


@query("stream_user_totals", STREAM_USER_TOTALS_ORACLE)
def q_stream_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (`applyInPandasWithState`) carrying
    per-user running totals; over a single-batch replay the 'update'
    stream emits exactly the final aggregates."""
    return running_user_totals(spark, sf_dir)


STREAM_ATTRIBUTION_ORACLE = """
WITH c AS (
  SELECT event_id AS click_id, user_id, epoch_us(ts) AS click_ts_us
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS purchase_ts_us
  FROM events WHERE event_type = 'purchase'
)
SELECT p.user_id, p.purchase_id, c.click_id,
       p.purchase_ts_us, c.click_ts_us
FROM p JOIN c ON p.user_id = c.user_id
 AND c.click_ts_us >= p.purchase_ts_us - 3600000000
 AND c.click_ts_us <= p.purchase_ts_us
"""


@query("stream_click_attribution", STREAM_ATTRIBUTION_ORACLE)
def q_stream_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (purchase ← clicks within the
    preceding hour), run as a real watermark-bounded streaming join;
    the oracle is the equivalent batch range join."""
    from psx_data_pipeline_spark.streaming.jobs import (
        stream_stream_click_attribution,
    )

    return stream_stream_click_attribution(spark, sf_dir)


# epoch_us(ts) >= 0: Spark's INITIAL watermark is the epoch, so a
# pre-epoch (corrupt-timestamp) event is "late" before the stream
# even starts and is silently dropped — the contract states the
# exclusion explicitly on both sides (hostile-probe finding).
# DISTINCT over exactly the engine's 4-column dedup key: two source
# rows identical on (event_id, user_id, event_type, ts_us) but
# differing in value/props collapse to ONE on both sides (round-12
# ADVICE — without DISTINCT the oracle kept both)
STREAM_DEDUP_ORACLE = """
SELECT DISTINCT event_id, user_id, event_type, epoch_us(ts) AS ts_us
FROM events WHERE ts IS NOT NULL AND epoch_us(ts) >= 0
"""


@query("stream_dedup", STREAM_DEDUP_ORACLE)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-bounded streaming deduplication
    (`dropDuplicatesWithinWatermark`) over a twice-delivered feed;
    the oracle is the batch table distinct on the same
    (event_id, user_id, event_type, ts_us) key — every distinct
    projected event exactly once."""
    from psx_data_pipeline_spark.streaming.jobs import streaming_dedup

    return streaming_dedup(spark, sf_dir)


# --- the two streaming JOBS, query-shaped --------------------------------------
#
# incremental_ingest and streaming_sync_change_log are sink-side jobs
# (they write tables, they don't return DataFrames), previously
# pytest-verified only (tests/test_streaming.py). These wrappers stage
# fixture-derived landing files in a temp dir, run the job through its
# real checkpointed multi-run lifecycle — including a REPLAYED run that
# must append nothing — and return the sink read back, so the driver's
# DuckDB oracle now checks the jobs' exactly-once semantics
# value-for-value, not just a hand-written pytest scenario.

_INGEST_SCHEMA = T.StructType([
    T.StructField("o_orderkey", T.LongType(), True),
    T.StructField("o_orderstatus", T.StringType(), True),
    T.StructField("o_totalprice", T.DoubleType(), True),
])

# the centi quantization is the TOTAL form (MILLI_SQL's convention):
# NaN / ±Inf / |v| > 9e13 map to NULL instead of a Spark ANSI long
# overflow vs DuckDB BIGINT-cast error split (round-6 relational-
# probe finding); ±9e13 keeps each centi term <= 9e15
_CENTI_SQL = (
    "CASE WHEN {0} BETWEEN -9e13 AND 9e13 "
    "THEN CAST(floor({0} * 100) AS BIGINT) END"
)

STREAM_INGEST_ORACLE = f"""
SELECT o_orderstatus, COUNT(*) AS n,
       CAST(SUM({_CENTI_SQL.format('o_totalprice')}) AS BIGINT) AS price_c
FROM orders GROUP BY o_orderstatus
"""


@query("stream_incremental_ingest", STREAM_INGEST_ORACLE)
def q_stream_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once checkpointed ingest (§7 daily-append layer) as an
    oracle-checked query: the orders table lands as two 'daily' JSON
    batches, each ingested by its own `AvailableNow` run against ONE
    checkpoint; a third run with nothing new must append nothing.
    The sink aggregate equals the plain batch GROUP BY over orders
    iff no batch was dropped or double-ingested."""
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    landing = scratch_dir("ingest_landing")
    sink = scratch_dir("ingest_sink") + "/data"
    ckpt = scratch_dir("ingest_ckpt")
    day1 = orders.where(F.col("o_orderkey") % 2 == 0)
    day2 = orders.where(F.col("o_orderkey") % 2 == 1)
    day1.coalesce(1).write.mode("append").json(landing)
    incremental_ingest(spark, landing, sink, ckpt, _INGEST_SCHEMA)
    day2.coalesce(1).write.mode("append").json(landing)
    incremental_ingest(spark, landing, sink, ckpt, _INGEST_SCHEMA)
    # replayed scheduled run: checkpoint says everything is committed
    incremental_ingest(spark, landing, sink, ckpt, _INGEST_SCHEMA)
    return (
        spark.read.schema(_INGEST_SCHEMA).parquet(sink)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr(_CENTI_SQL.format("o_totalprice"))).alias(
                "price_c"
            ),
        )
    )


_SYNC_SCHEMA = T.StructType([
    T.StructField("symbol_id", T.LongType(), True),
    T.StructField("name", T.StringType(), True),
])

# run 1 lands the 'prev' universe (everything ADDED against an empty
# universe — R11 first-run semantics), run 2 lands 'cur' (delta only);
# prev/cur are the same customer-derived snapshots the batch ticker
# queries use (plans/ticker.PREV_SQL/CUR_SQL).
STREAM_SYNC_ORACLE = """
WITH prev AS (
  SELECT c_custkey AS symbol_id FROM customer WHERE c_custkey % 5 <> 0
), cur AS (
  SELECT c_custkey AS symbol_id FROM customer WHERE c_custkey % 7 <> 0
  UNION ALL
  SELECT c_custkey + 100000 FROM customer
  WHERE c_custkey % 21 = 0 AND c_custkey % 5 <> 0
)
SELECT 'ADDED' AS change_type, '+ ' || CAST(symbol_id AS VARCHAR) AS line
FROM prev
UNION ALL
SELECT 'ADDED', '+ ' || CAST(symbol_id AS VARCHAR)
FROM cur WHERE symbol_id NOT IN (SELECT symbol_id FROM prev)
UNION ALL
SELECT 'DELETED', '- ' || CAST(symbol_id AS VARCHAR)
FROM prev WHERE symbol_id NOT IN (SELECT symbol_id FROM cur)
"""


@query("stream_sync_change_log", STREAM_SYNC_ORACLE)
def q_stream_sync_change_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole sync loop as a streaming job
    (streaming/jobs.streaming_sync_change_log, foreachBatch diff →
    change log + universe overwrite), oracle-checked: two snapshot
    files land as two scheduled runs; the typed change log read back
    must equal the batch diff of the same two snapshots."""
    from psx_data_pipeline_spark.plans.ticker import _cur, _prev

    landing = scratch_dir("sync_landing")
    universe = scratch_dir("sync_universe") + "/universe"
    log = scratch_dir("sync_log") + "/changes"
    ckpt = scratch_dir("sync_ckpt")
    prev = _prev(spark, sf_dir).select("symbol_id", "name")
    cur = _cur(spark, sf_dir).select("symbol_id", "name")
    prev.coalesce(1).write.mode("append").json(landing)
    streaming_sync_change_log(
        spark, landing, universe, log, ckpt, _SYNC_SCHEMA, key="symbol_id"
    )
    cur.coalesce(1).write.mode("append").json(landing)
    streaming_sync_change_log(
        spark, landing, universe, log, ckpt, _SYNC_SCHEMA, key="symbol_id"
    )
    return spark.read.parquet(log).select("change_type", "line")


# --- streaming multimodal decode --------------------------------------------

from psx_data_pipeline_spark.plans.multimodal import IMAGE_DECODE_ORACLE  # noqa: E402
from psx_data_pipeline_spark.streaming.jobs import streaming_image_decode  # noqa: E402


@query("stream_image_decode", IMAGE_DECODE_ORACLE)
def q_stream_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The image_decode pipeline under the streaming runtime
    (decode-on-ingest): same oracle as the batch query — the
    streaming engine must produce value-identical decode output."""
    return streaming_image_decode(spark, sf_dir)


from psx_data_pipeline_spark.plans.multimodal import (  # noqa: E402
    STREAM_IMAGE_NEAR_DUP_ORACLE,
)
from psx_data_pipeline_spark.streaming.jobs import (  # noqa: E402
    streaming_image_near_dup,
)


@query("stream_image_near_dup", STREAM_IMAGE_NEAR_DUP_ORACLE)
def q_stream_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual dedup-on-ingest: streamed (odd-id) images dHash and
    probe a static band index of the even-id corpus — stateless
    append plan whose first-matching-band emission makes the output
    value-identical to the even×odd oracle
    (streaming/jobs.streaming_image_near_dup)."""
    return streaming_image_near_dup(spark, sf_dir)


# --- streaming safety filter --------------------------------------------------

from psx_data_pipeline_spark.plans.safety import BLOCKLIST_ORACLE  # noqa: E402
from psx_data_pipeline_spark.streaming.jobs import streaming_blocklist  # noqa: E402


@query("stream_blocklist", BLOCKLIST_ORACLE)
def q_stream_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The blocklist audit as filter-on-ingest: a stateless streaming
    projection (per-row expressions over the constant pattern list,
    zero shuffle per micro-batch) that must agree value-for-value
    with the batch explode+aggregate plan — same oracle."""
    return streaming_blocklist(spark, sf_dir)


# --- streaming vocabulary sketch ---------------------------------------------

from psx_data_pipeline_spark.plans.text import VOCAB_SKETCH_ORACLE  # noqa: E402
from psx_data_pipeline_spark.streaming.jobs import streaming_vocab_sketch  # noqa: E402


@query("stream_vocab_sketch", VOCAB_SKETCH_ORACLE)
def q_stream_vocab_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL vocabulary sketch under the streaming runtime: state =
    the per-source register array (O(k) forever, the mergeable-
    summary property); same oracle as the batch query — the stream's
    final update must equal the batch sketch bit-for-bit."""
    return streaming_vocab_sketch(spark, sf_dir)


from psx_data_pipeline_spark.plans.distrib import (  # noqa: E402
    COUNT_MIN_ORACLE,
    cm_occurrences,
    cm_audit,
)
from psx_data_pipeline_spark.streaming.jobs import streaming_cm_cells  # noqa: E402


@query("stream_heavy_hitters", COUNT_MIN_ORACLE)
def q_stream_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Count-Min counter grid under the streaming runtime, as a
    NATIVE incremental aggregation over the bounded (i, cell) key
    space — map-side partial agg caps every micro-batch's exchange at
    d·w rows per task and the state store at d·w counters forever
    (streaming/jobs.streaming_cm_cells). The exact-recount AUDIT half
    (top-k candidates + ground-truth counts) runs batch-side over the
    same replayed input, exactly as a production pipeline would probe
    a continuously-maintained sketch with an offline candidate set;
    same oracle as the batch query — the stream-built grid must make
    the audit agree bit-for-bit (and equals the batch grid
    cell-for-cell: tests/test_distrib.py)."""
    cells = streaming_cm_cells(spark, sf_dir)
    occ = cm_occurrences(load_table_parallel(spark, "documents", sf_dir))
    return cm_audit(occ, cells)


from psx_data_pipeline_spark.plans.multimodal import VIDEO_DECODE_ORACLE  # noqa: E402
from psx_data_pipeline_spark.streaming.jobs import streaming_video_decode  # noqa: E402


@query("stream_video_decode", VIDEO_DECODE_ORACLE)
def q_stream_video_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The video_decode demux under the streaming runtime
    (decode-on-ingest): same oracle as the batch query — the
    streaming engine must produce value-identical sampled-frame
    rows."""
    return streaming_video_decode(spark, sf_dir)


# --- streaming constraint audit ----------------------------------------------

from psx_data_pipeline_spark.streaming.jobs import (  # noqa: E402
    streaming_constraint_audit,
)

STREAM_RULES_ORACLE = f"""
WITH w AS (
  SELECT epoch_us(ts) - ((epoch_us(ts) % {_HOUR_US}) + {_HOUR_US})
           % {_HOUR_US} AS win_start_us,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS vu,
         CAST(sum(CASE WHEN value IS NOT NULL AND (isnan(value)
                  OR value = CAST('inf' AS DOUBLE)
                  OR value = CAST('-inf' AS DOUBLE))
                  THEN 1 ELSE 0 END) AS BIGINT) AS vv,
         CAST(sum(CASE WHEN NOT coalesce(event_type IN
                  ('click','view','purchase','signup','error'), FALSE)
                  THEN 1 ELSE 0 END) AS BIGINT) AS ve
  FROM events WHERE ts IS NOT NULL GROUP BY 1
)
SELECT win_start_us, 'events.user_id.complete' AS rule_id,
       n AS n_checked, vu AS n_violations FROM w
UNION ALL SELECT win_start_us, 'events.value.finite', n, vv FROM w
UNION ALL SELECT win_start_us, 'events.event_type.in_set', n, ve FROM w
"""


@query("stream_constraint_audit", STREAM_RULES_ORACLE)
def q_stream_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-quality suite as a continuous windowed audit
    (streaming/jobs.py:streaming_constraint_audit): one stateful
    conditional-sum aggregate per hourly window, per-rule rows via a
    stateless post-agg explode; batch-equivalent by the oracle."""
    return streaming_constraint_audit(spark, sf_dir)


# --- streaming pseudonymization ----------------------------------------------

from psx_data_pipeline_spark.plans.governance import _PSEUDO_SALT  # noqa: E402
from psx_data_pipeline_spark.functions.hashing import md5_long_sql  # noqa: E402
from psx_data_pipeline_spark.streaming.jobs import (  # noqa: E402
    streaming_pseudonymize,
)

STREAM_PSEUDO_ORACLE = f"""
SELECT event_id,
       CASE WHEN user_id IS NULL THEN NULL
       ELSE {md5_long_sql(f"'{_PSEUDO_SALT}' || CAST(user_id AS VARCHAR)")}
       END AS user_token,
       event_type,
       {MILLI_SQL.format('value')} AS value_k
FROM events
"""


@query("stream_pseudonymize", STREAM_PSEUDO_ORACLE)
def q_stream_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize-on-ingest: the salted-token projection as a stateless
    streaming job — raw ids never land
    (streaming/jobs.py:streaming_pseudonymize); same oracle rows as
    the batch projection."""
    return streaming_pseudonymize(spark, sf_dir)


# --- streaming weak-label election ---------------------------------------------

from psx_data_pipeline_spark.plans.weaklabel import (  # noqa: E402
    LABEL_VOTE_ORACLE,
    elect,
)
from psx_data_pipeline_spark.streaming.jobs import (  # noqa: E402
    streaming_label_tally,
)


@query("stream_label_vote", LABEL_VOTE_ORACLE)
def q_stream_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weak-label election over a CONTINUOUSLY maintained vote tally:
    the (item, label) weighted counts accumulate as bounded native
    streaming state (streaming/jobs.streaming_label_tally); the
    winner/margin windows (plans/weaklabel.elect) then run batch-side
    over the catalogue-bounded tally — the same split as
    stream_heavy_hitters (stream the combinable half, keep rank logic
    on the bounded result). Batch-equivalent by the label_vote
    oracle."""
    return elect(streaming_label_tally(spark, sf_dir))


# --- streaming zone-map maintenance --------------------------------------------

from psx_data_pipeline_spark.plans.skipping import _ZONES_SQL  # noqa: E402
from psx_data_pipeline_spark.streaming.jobs import (  # noqa: E402
    streaming_zone_maps,
)

STREAM_ZONE_MAPS_ORACLE = f"SELECT * FROM ({_ZONES_SQL})"


@query("stream_zone_maps", STREAM_ZONE_MAPS_ORACLE)
def q_stream_zone_maps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The zone-map manifest as continuously maintained streaming
    state (streaming/jobs.streaming_zone_maps) — data skipping
    metadata that is ALREADY current when the batch audit
    (zone_map_prune) asks, instead of a scan-the-world refresh.
    Batch-equivalent by the manifest oracle."""
    return streaming_zone_maps(spark, sf_dir)


# --- streaming CDC upsert --------------------------------------------------------

from psx_data_pipeline_spark.plans.lakehouse import CDC_APPLY_ORACLE  # noqa: E402
from psx_data_pipeline_spark.streaming.jobs import (  # noqa: E402
    streaming_cdc_apply,
)


@query("stream_cdc_apply", CDC_APPLY_ORACLE)
def q_stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDC-maintained live table as continuous streaming state
    (streaming/jobs.streaming_cdc_apply): per-key struct-MAX
    last-writer-wins, tombstones dropped on read. Batch-equivalent by
    the cdc_apply oracle — the streaming upsert and the batch merge
    must land the identical table."""
    live = streaming_cdc_apply(spark, sf_dir)
    return live.where(F.col("m.op") != "D").select(
        F.col("k").alias("c_custkey"),
        F.col("m.name").alias("name"),
        F.col("m.segment").alias("segment"),
        F.col("m.seq").cast("long").alias("applied_seq"),
    )


# --- streaming PII census ----------------------------------------------------

from psx_data_pipeline_spark.plans.pii import PII_SCAN_ORACLE  # noqa: E402
from psx_data_pipeline_spark.streaming.jobs import streaming_pii_scan  # noqa: E402


@query("stream_pii_scan", PII_SCAN_ORACLE)
def q_stream_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PII census at ingest: stateless regexp_counts per
    micro-batch, then a native bounded-key per-source streaming
    aggregation (state = one counter row per source). Must agree
    value-for-value with the batch scan — same oracle."""
    return streaming_pii_scan(spark, sf_dir)
