"""Structured Streaming jobs (SURVEY.md §2 K3 streaming analogue,
§7's `Trigger.AvailableNow` incremental layer).

The reference has no streaming runtime — its cadence is cron re-runs
(reference README.md:93-102) and its planned incremental layer is
"read last date, fetch the delta, append" (README.md:62-71). The
Spark-native form is a checkpointed file stream: `readStream` over
the landing directory, `Trigger.AvailableNow` per scheduled run, and
exactly-once append through the checkpoint — restarts resume, reruns
do not duplicate.

Every job here is deterministic under replay of a static input
directory, which is what lets the driver's DuckDB oracle check the
streaming results value-for-value against the equivalent batch SQL.

Scale notes: the streaming aggregations shuffle on the same keys as
their batch twins (window×type, user_id); state is bounded by the
watermark horizon, not the stream length; `applyInPandasWithState`
holds one tiny struct per key — the classic bounded-state shapes for
a 1000-executor continuous pipeline.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from psx_data_pipeline_spark.functions.numeric import MILLI_BOUND, milli
from psx_data_pipeline_spark.scratch import scratch_dir
from psx_data_pipeline_spark.sources.fixtures import ts_us_expr

_uniq = itertools.count()


from contextlib import contextmanager


@contextmanager
def _pinned_state_shuffle(spark: SparkSession, n: int = 8):
    """Pin spark.sql.shuffle.partitions while a stateful stream runs.

    Each state partition carries a state-store instance (checkpoint
    dir, snapshot files) — real per-micro-batch overhead, so stateful
    stages use a modest pinned count instead of inheriting the
    batch-oriented session default. State partitioning is fixed at
    the first checkpoint; every job here uses a fresh checkpoint per
    call, so re-pinning is safe."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _sink_name(prefix: str) -> str:
    return f"{prefix}_{os.getpid()}_{next(_uniq)}"


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events fixture with event-time
    columns: ``ts_us`` (µs since epoch) and ``ts_ts`` (timestamp).

    readStream needs a declared schema; hard-coding one is exactly how
    round 3's fixture type change (int64-ns → timestamp[µs]) turned
    into SILENT wrong answers — an explicit LongType over µs data read
    cleanly but 1000× off. So the schema is taken from the actual file
    footer (one metadata-only batch read) and event time goes through
    the same type-adaptive ts_us seam as the batch path."""
    raw = spark.readStream.schema(
        spark.read.parquet(f"{sf_dir}/events.parquet").schema
    ).option(
        # the file source wants a directory: scan sf_dir, glob-filter
        # down to the events table
        "pathGlobFilter", "events.parquet"
    ).parquet(sf_dir)
    return raw.withColumn("ts_us", ts_us_expr(raw)).withColumn(
        "ts_ts", F.timestamp_micros(F.col("ts_us"))
    )


def run_to_memory(result: DataFrame, output_mode: str, prefix: str) -> str:
    """Run a streaming DataFrame to completion (AvailableNow) into an
    in-memory table; returns the table name. The checkpoint lives in a
    fresh temp dir — each call is an independent 'scheduled run'."""
    name = _sink_name(prefix)
    ckpt = scratch_dir(f"ckpt_{name}")
    q = (
        result.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return name


def windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregation: events per (hour,
    type) with an exact quantized value sum.

    Late data up to 1 hour is admitted by the watermark; 'complete'
    output keeps every window so a replay of a static directory is
    total and deterministic (the append-mode tail-window cutoff would
    make results depend on the final watermark position)."""
    # time-windowed aggregation is defined only for timestamped
    # events; Spark's watermark path drops NULL event times silently —
    # state the filter explicitly so the oracle can state it too
    # (hostile-probe finding)
    ev = events_stream(spark, sf_dir).where(F.col("ts_ts").isNotNull())
    agg = (
        ev.withWatermark("ts_ts", "1 hour")
        .groupBy(F.window("ts_ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(milli("value")).alias("value_k"),
        )
    )
    out = agg.select(
        F.unix_micros("win.start").alias("win_start_us"),
        "event_type", "n", "value_k",
    )
    with _pinned_state_shuffle(spark):
        table = run_to_memory(out, "complete", "win_counts")
    return spark.table(table)


def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native stateful sessionization: `session_window` with a
    30-minute gap — the streaming twin of operators/sessions.sessionize
    (new session iff the gap from the previous event is >= 30 min;
    session end = last event + gap, half-open)."""
    # NULL event times cannot be sessioned (same contract as the
    # batch sessionize); the streaming engine would drop them anyway
    ev = events_stream(spark, sf_dir).where(F.col("ts_ts").isNotNull())
    sess = (
        ev.withWatermark("ts_ts", "30 minutes")
        .groupBy("user_id", F.session_window("ts_ts", "30 minutes").alias("sw"))
        .agg(F.count("*").alias("n_events"))
    )
    out = sess.select(
        "user_id",
        F.unix_micros("sw.start").alias("session_start_us"),
        F.unix_micros("sw.end").alias("session_end_us"),
        "n_events",
    )
    with _pinned_state_shuffle(spark):
        table = run_to_memory(out, "complete", "sessions")
    return spark.table(table)


_USER_STATE_OUT = "user_id LONG, n_events LONG, value_k LONG, max_event_id LONG"
_USER_STATE = "n LONG, vk LONG, meid LONG, nv LONG, ne LONG"


def running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via `applyInPandasWithState`: per-user
    running totals carried in a 5-field state struct (totals + the
    non-null input counters that keep SUM/MAX SQL-null-correct).

    Arrow-batched per group; state is O(1) per user. Each micro-batch
    emits the user's current totals ('update' mode) — over a static
    single-file replay that is exactly the final per-user aggregate."""
    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        n, vk, meid, nv, ne = (
            state.get if state.exists else (0, 0, 0, 0, 0)
        )
        import numpy as np  # noqa: PLC0415 — worker-side

        for pdf in pdfs:
            n += len(pdf)
            # SQL SUM semantics: NULL values are skipped, not NaN-
            # poisoned (a NULL value crashed the int64 cast before;
            # hostile-probe finding). Non-finite / out-of-range
            # values follow the same total-milli gate as MILLI_SQL
            # (Inf crashed the int64 astype; round-6 probe finding).
            # Raw-numpy single pass: update() fires once per user per
            # batch, so per-call pandas overhead is the hot cost here
            # (NULL→NaN under float64, and isfinite covers both).
            v = pdf["value"].to_numpy(dtype="float64", copy=False)
            v = v[np.isfinite(v) & (np.abs(v) <= MILLI_BOUND)]
            if len(v):
                vk += int(np.floor(v * 1000).astype("int64").sum())
                nv += len(v)
            # raw-numpy path for event_id too (pandas dropna on a
            # small per-group series costs ~100µs of pure overhead
            # per update() call, which dominates at many groups).
            # Arrow hands the column over as exact int64 when the
            # batch has no NULLs and as float64 (NULL→NaN) when it
            # does — only the float path needs the finite mask, and
            # it carries the same 2^53 precision ceiling the previous
            # dropna()-on-float64 path had.
            e = pdf["event_id"].to_numpy(copy=False)
            if e.dtype.kind == "f":
                e = e[np.isfinite(e)]
            if len(e):
                # ne==0 means meid still holds the 0 sentinel — seed
                # it from the data instead of max()ing against it, or
                # an all-negative event_id stream would report the
                # sentinel as its maximum (review finding, round 5)
                m = int(e.max())
                meid = m if ne == 0 else max(meid, m)
                ne += len(e)
        state.update((n, vk, meid, nv, ne))
        # SUM/MAX over zero non-null inputs is NULL in SQL, not 0
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n],
             "value_k": [vk if nv else None],
             "max_event_id": [meid if ne else None]}
        )

    ev = events_stream(spark, sf_dir)
    out = ev.groupBy("user_id").applyInPandasWithState(
        update, _USER_STATE_OUT, _USER_STATE, "update",
        GroupStateTimeout.NoTimeout,
    )
    with _pinned_state_shuffle(spark):
        table = run_to_memory(out, "update", "user_totals")
    return spark.table(table)


def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once ingest of an at-least-once feed: the event stream
    unioned with itself (every event delivered twice, the redelivery
    pattern of any at-least-once transport) is collapsed by
    ``dropDuplicatesWithinWatermark`` on the full PROJECTED tuple
    (event_id, user_id, event_type, ts_us) — each distinct projected
    event emits exactly once, and the dedup state is EVICTED once the
    watermark passes the event's time, so state size is bounded by
    the redelivery horizon (1 h here), not the stream's lifetime —
    the property that makes streaming dedup viable on an unbounded
    feed."""
    # Redelivery is modeled by fanning every source row out twice
    # (posexplode over a 2-element array). Before round 13 this was a
    # union of TWO independent readStream sources over the SAME file —
    # two source listings, two offset logs, two scans per micro-batch
    # (the r13 stream census: batch 0 read 200 K rows for a 100 K-row
    # fixture). One source with a ×2 explode delivers the identical
    # twice-each-row feed to the dedup operator — same dedup state,
    # same watermark eviction exercise, same output (the duplicates
    # are bit-identical either way) — at half the source machinery.
    ev = events_stream(spark, sf_dir)
    feed = ev.select(
        "*", F.explode(F.array(F.lit(1), F.lit(2))).alias("__copy")
    ).drop("__copy")
    out = (
        # watermark-bounded dedup needs an event time: NULL-ts rows
        # are excluded by contract (they would be dropped by the
        # watermark machinery anyway — silently), and so are
        # pre-epoch timestamps, which sit below Spark's INITIAL
        # watermark and would be dropped as late before the stream
        # even starts
        feed.where(F.col("ts_ts").isNotNull() & (F.col("ts_us") >= 0))
        .withWatermark("ts_ts", "1 hour")
        # the dedup key is the full PROJECTED tuple (event_id,
        # user_id, event_type, ts_us — every column this job emits),
        # not event_id alone: a redelivery is bit-identical, so the
        # tuple collapses it exactly — while two DIFFERENT events
        # wearing one colliding id (round-11 hostile-id probe) both
        # survive. Keyed on the id alone, dropDuplicates kept
        # whichever twin ARRIVED first: payload-nondeterministic
        # output at any scale. (value/props are deliberately outside
        # both the key and the projection — rows differing only there
        # are ONE projected event, and the oracle's DISTINCT states
        # the same collapse.)
        .dropDuplicatesWithinWatermark(
            ["event_id", "user_id", "event_type", "ts_us"])
        .select("event_id", "user_id", "event_type", "ts_us")
    )
    with _pinned_state_shuffle(spark):
        table = run_to_memory(out, "append", "dedup")
    return spark.table(table)

def incremental_ingest(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    schema: T.StructType,
) -> None:
    """§7's incremental daily-append layer: checkpointed exactly-once
    file ingest. Each call is one scheduled run (`AvailableNow`);
    files already committed in the checkpoint are not re-ingested, so
    re-runs append only the delta — the engine twin of the reference's
    planned 'read last date, fetch delta, append' (README.md:62-71),
    keyed by checkpoint state instead of a scanned max(date)."""
    q = (
        spark.readStream.schema(schema)
        .json(source_dir)
        .writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_sync_change_log(
    spark: SparkSession,
    landing_dir: str,
    universe_path: str,
    change_log_path: str,
    checkpoint_dir: str,
    schema: T.StructType,
    key: str = "symbol",
) -> None:
    """The reference's whole ticker-sync loop (scrape → diff → change
    log → new universe, scrape_tickers.py:627-660) as ONE streaming
    job: snapshots land as JSON files; each micro-batch anti-joins the
    batch against the current universe both ways (ADDED / DELETED),
    writes typed `+/-` rows to the change log (K3), and replaces the
    universe. foreachBatch gives the batch DataFrame full engine
    power — joins against external state included.

    Delivery semantics: the checkpoint gives at-least-once delivery of
    each micro-batch to the sink function; exactly-once OBSERVED state
    comes from making both side effects idempotent per batch_id —
    the change log is written to a `batch_id=` partition directory
    with overwrite (a replayed batch overwrites its own output rather
    than appending duplicates), and the universe overwrite is
    naturally idempotent. ``maxFilesPerTrigger=1`` makes each landed
    snapshot its own micro-batch, so consecutive snapshots diff
    individually instead of collapsing into one union batch."""
    from pyspark.sql import functions as SF

    def sync(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        try:
            universe = s.read.schema(schema).parquet(universe_path)
        except Exception:
            # first run: diff against an empty frame of the same
            # schema (R11 semantics), never a skip branch
            universe = batch.where(F.lit(False))
        added = batch.join(universe, key, "left_anti")
        deleted = universe.join(batch, key, "left_anti")
        changes = added.select(
            SF.lit("ADDED").alias("change_type"),
            SF.concat(SF.lit("+ "), SF.col(key)).alias("line"),
        ).unionByName(
            deleted.select(
                SF.lit("DELETED").alias("change_type"),
                SF.concat(SF.lit("- "), SF.col(key)).alias("line"),
            )
        ).withColumn("change_ts", SF.current_timestamp())
        # batch_id-keyed overwrite = idempotent under foreachBatch
        # replay; readers of change_log_path see batch_id as a
        # partition-discovered column
        changes.select("change_ts", "change_type", "line").write.mode(
            "overwrite"
        ).parquet(f"{change_log_path}/batch_id={batch_id}")
        # the change write above already materialized both anti-joins,
        # and writing `batch` never scans the universe path — a direct
        # overwrite is safe for this single-writer sync job
        batch.write.mode("overwrite").parquet(universe_path)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(landing_dir)
        .writeStream.foreachBatch(sync)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


_JOIN_HOUR_US = 3600 * 1_000_000


def stream_stream_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: each purchase attributed to the
    same user's clicks in the preceding hour. Both sides are
    watermarked streams; Spark bounds the join state by the watermark
    + interval (state eviction is what makes this run forever on an
    unbounded stream). Over the static fixture replay the result is
    exactly the batch range join, which is what the oracle checks.

    The equality key is (user, hour-bin), not user alone — the
    streaming twin of the batch binned range join. Keyed only by
    user, the symmetric-hash join probes EVERY stored row of that
    user per arriving row: quadratic in the hot key's density per
    watermark horizon (the scale_rehearsal --hot-frac probe measured
    3 s → 1781 s at 30% single-user skew). Binning splits a hot
    user's state across hour bins — the purchase side explodes into
    the two bins its 1-hour lookback can touch (a click has exactly
    one bin, so no pair is produced twice) — and each probe touches
    one bin's rows. Same skew, same result set (6.2M pairs): 24.7 s —
    output-bound instead of state-probe-bound."""
    # Two independent readStream sources, one per join leg — MEASURED
    # (round 13): deriving both legs from a single source (a true
    # stream-stream self-join) is supported and result-identical
    # (oracle MATCH) but censused 2× SLOWER (wall 3.35 → 6.68 s,
    # addBatch 1.17 → 2.26 s, and the watermark-flush batch 0.89 →
    # 2.79 s) — the self-join plan re-executes the shared source
    # subtree per leg anyway (numInputRows stayed 200 K) and loses
    # the per-leg scan pushdown. Two sources it stays.
    clicks = (
        events_stream(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts_ts").alias("click_ts"),
            F.col("ts_us").alias("click_ts_us"),
        )
        .withColumn("c_bin", F.expr(f"click_ts_us div {_JOIN_HOUR_US}"))
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts_ts").alias("purchase_ts"),
            F.col("ts_us").alias("purchase_ts_us"),
        )
        .withColumn(
            "p_bin",
            F.explode(
                F.sequence(
                    F.expr(
                        f"(purchase_ts_us - {_JOIN_HOUR_US}) div {_JOIN_HOUR_US}"
                    ),
                    F.expr(f"purchase_ts_us div {_JOIN_HOUR_US}"),
                )
            ),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            """
            p_user = c_user AND
            p_bin = c_bin AND
            click_ts >= purchase_ts - INTERVAL 1 HOUR AND
            click_ts <= purchase_ts
            """
        ),
        "inner",
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id", "click_id",
        "purchase_ts_us", "click_ts_us",
    )
    # A stream-stream join keeps FOUR state stores per shuffle
    # partition (left/right × keyToNumValues/keyWithIndexToValue),
    # each with its own checkpoint files.
    with _pinned_state_shuffle(spark):
        table = run_to_memory(joined, "append", "attribution")
    return spark.table(table)


def streaming_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-on-ingest: the documents table replayed as a file
    stream; every micro-batch synthesizes its binary payload column
    and runs the real BMP/PPM decoder (operators/multimodal) inside
    Arrow-batched mapInPandas. Stateless and narrow — no watermark,
    no state store, no shuffle — so the streaming plan is the batch
    plan fed micro-batch-sized Arrow slices: the shape a production
    media-ingest pipeline has (decode once, on arrival, not in every
    downstream job)."""
    from psx_data_pipeline_spark.operators.multimodal import (
        decode_images,
        synth_image_payloads,
    )

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    decoded = decode_images(synth_image_payloads(raw.select("doc_id")))
    table = run_to_memory(decoded, "append", "img_decode")
    return spark.table(table)


def streaming_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-on-ingest: the blocklist audit as a STATELESS streaming
    projection (append mode, no state store, no watermark). The batch
    query explodes the pattern array and aggregates per doc — the
    right plan when the blocklist is large; at ingest the same
    semantics compile to per-row expressions over the constant
    pattern list (one column bundle per pattern), so each micro-batch
    is a narrow map with zero shuffle — the shape a production safety
    filter runs at the front of the pipeline. Same oracle as the
    batch query: the two plans must agree value-for-value."""
    from psx_data_pipeline_spark.plans.safety import (
        _BLOCKLIST,
        _MAX_OCC,
        _MAX_PATTERNS,
    )

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .where(F.col("text").isNotNull())
    )
    occ = {
        p: F.expr(
            f"CAST((length(text) - length(replace(text, '{p}', '')))"
            f" / length('{p}') AS BIGINT)"
        )
        for p in _BLOCKLIST
    }
    n_patterns = sum(
        (o > 0).cast("long") for o in occ.values()
    ).alias("n_patterns")
    n_occurrences = sum(occ.values()).alias("n_occurrences")
    max_occ = F.greatest(*occ.values())
    # lexicographic-min struct over (neg count, pattern) — the same
    # worst-pattern convention as the batch aggregate; least() skips
    # NULLs, and all-zero docs yield NULL
    worst = F.least(*[
        F.when(o > 0, F.struct((-o).alias("no"), F.lit(p).alias("p")))
        for p, o in occ.items()
    ]).getField("p").alias("worst_pattern")
    out = raw.select(
        "doc_id", n_patterns, n_occurrences, worst,
        (
            (max_occ > _MAX_OCC)
            | (sum((o > 0).cast("long") for o in occ.values()) > _MAX_PATTERNS)
        ).alias("dropped"),
    )
    table = run_to_memory(out, "append", "blocklist")
    return spark.table(table)


_HLL_STATE = "nt LONG, regs ARRAY<LONG>"
_HLL_OUT = "source STRING, n_tokens LONG, v1 LONG, z LONG"


def _hll_merge(nt: int, regs: list, pdfs) -> tuple[int, list]:
    """Merge micro-batch (b, v) rows into the register state —
    register-wise min, the mergeable-summary property. Pure (returns
    new state), so arbitrary batchings are property-testable: ANY
    split of the same rows must converge to the same registers
    (tests/test_vocab_sketch.py)."""
    from psx_data_pipeline_spark.plans.text import _HLL_VMOD  # noqa: PLC0415

    regs = list(regs)
    for pdf in pdfs:
        nt += len(pdf)
        for b, v in pdf.groupby("b")["v"].min().items():
            iv = int(v)
            if iv < regs[int(b)]:
                regs[int(b)] = iv
    return nt, regs


def _hll_reduce(regs: list) -> tuple[int, int]:
    """(empty-register count, dyadic harmonic-mean numerator) from a
    register array — integer-exact twin of the batch query's z
    aggregation (plans/text._hll_z_agg); VMOD is the empty sentinel."""
    from psx_data_pipeline_spark.plans.text import (  # noqa: PLC0415
        _HLL_VMOD,
        _HLL_Z_EMPTY,
    )

    v1 = sum(1 for m in regs if m >= _HLL_VMOD)
    z = sum(
        0 if m >= _HLL_VMOD else (1 if m <= 0 else 1 << m.bit_length())
        for m in regs
    ) + _HLL_Z_EMPTY * v1
    return v1, z


def streaming_vocab_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL vocabulary sketch as a custom STATEFUL streaming
    operator (plans/text.q_vocab_sketch is the batch twin): per
    source, the state is the 256-register array itself — the
    mergeable-summary property means ingesting a micro-batch is just
    register-wise min with the batch's registers, so state is O(k)
    per source FOREVER, independent of how many tokens stream
    through. Tokenize/hash/bucket run as native expressions BEFORE
    the stateful stage (the Python worker only merges integer mins,
    Arrow-batched), and the estimate is computed JVM-side from the
    emitted (z, v1) with the exact integer formula the batch query
    and the DuckDB oracle share — no Python float seam.

    Over a static single-file replay the final update equals the
    batch sketch exactly, which is what the shared oracle pins."""
    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.state import GroupStateTimeout

    from psx_data_pipeline_spark.functions.hashing import md5_long
    from psx_data_pipeline_spark.functions.textfns import tokens
    from psx_data_pipeline_spark.plans.text import (
        _HLL_K,
        _HLL_VMOD,
        _hll_est_col,
    )

    def update(key, pdfs, state):
        if state.exists:
            nt, regs = state.get
            regs = list(regs)
        else:
            nt, regs = 0, [_HLL_VMOD] * _HLL_K  # VMOD = empty sentinel
        nt, regs = _hll_merge(nt, regs, pdfs)
        state.update((nt, regs))
        v1, z = _hll_reduce(regs)
        yield pd.DataFrame({
            "source": [key[0]], "n_tokens": [nt], "v1": [v1], "z": [z],
        })

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    hv = (
        raw.select("source", F.explode(tokens("text")).alias("tok"))
        .withColumn("h", md5_long(F.col("tok")))
        .select(
            "source",
            F.expr(f"h % {_HLL_K}").alias("b"),
            F.expr(f"(h div {_HLL_K}) % {_HLL_VMOD}").alias("v"),
        )
    )
    out = hv.groupBy("source").applyInPandasWithState(
        update, _HLL_OUT, _HLL_STATE, "update", GroupStateTimeout.NoTimeout
    )
    with _pinned_state_shuffle(spark):
        table = run_to_memory(out, "update", "vocab_sketch")
    return (
        spark.table(table)
        .withColumnRenamed("v1", "empty_registers")
        .withColumn("v1", F.col("empty_registers"))
        .select(
            "source", "n_tokens", "empty_registers",
            _hll_est_col().alias("est_distinct"),
        )
    )


# --- Count-Min sketch as streaming state -------------------------------------


def streaming_cm_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Count-Min counter grid (plans/distrib.cm_cells is the batch
    twin) maintained under the streaming runtime as a NATIVE streaming
    aggregation: CM cells have a bounded key space (d*w = 4096), so
    the idiomatic plan is an incremental groupBy(i, cell) count --
    partial aggregation combines map-side, shrinking every
    micro-batch's exchange to at most d*w rows per task no matter how
    many tokens streamed through it, and the state store holds at
    most d*w counters forever. No Python worker touches the hot path
    (contrast streaming_vocab_sketch, which takes the
    applyInPandasWithState route to demonstrate the custom-stateful
    seam; counters need nothing custom -- addition IS the built-in
    agg's merge). 'complete' output re-emits the whole bounded grid
    each trigger, so a replay's final table equals the batch grid."""
    from psx_data_pipeline_spark.functions.hashing import HASH_P, md5_long
    from psx_data_pipeline_spark.functions.textfns import tokens
    from psx_data_pipeline_spark.plans.distrib import cm_cell_array

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    ic = (
        raw.select(F.explode(tokens("text")).alias("tok"))
        .select((md5_long(F.col("tok")) % HASH_P).alias("hp"))
        .select(F.explode(cm_cell_array()).alias("x"))
        .select(F.col("x.i").cast("long").alias("i"), "x.cell")
    )
    out = ic.groupBy("i", "cell").agg(F.count(F.lit(1)).alias("cnt"))
    with _pinned_state_shuffle(spark):
        table = run_to_memory(out, "complete", "cm_cells")
    return spark.table(table)


def streaming_video_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-on-ingest for the video leg (streaming_image_decode's
    sibling): every micro-batch synthesizes its AVI payload column
    and runs the real RIFF demuxer + frame sampler inside
    Arrow-batched mapInPandas. Stateless and narrow — the streaming
    plan is the batch plan fed micro-batch-sized Arrow slices."""
    from psx_data_pipeline_spark.operators.multimodal import (
        decode_video_frames,
        synth_video_payloads,
    )

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    decoded = decode_video_frames(synth_video_payloads(raw.select("doc_id")))
    table = run_to_memory(decoded, "append", "vid_decode")
    return spark.table(table)


_EVENT_TYPE_SET = ["click", "view", "purchase", "signup", "error"]


def streaming_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-quality rule suite (plans/rules.py) as a CONTINUOUS
    audit: per hourly window, (rule, checked, violations) rows — the
    Deequ-on-streams shape that gates an always-on ingest instead of
    a published snapshot.

    Same execution idea as the batch suite: all rules ride ONE
    windowed conditional-sum aggregate (state = one 4-counter row
    per open window, watermark-bounded), and the per-rule pivot is a
    stateless post-aggregation explode. Violation predicates are the
    batch suite's TOTAL forms, so streaming and batch answers agree
    on hostile input (NaN/Inf, NULL uid, unknown event types)."""
    ev = events_stream(spark, sf_dir).where(F.col("ts_ts").isNotNull())
    viol_uid = F.col("user_id").isNull()
    viol_val = F.col("value").isNotNull() & (
        F.isnan("value")
        | (F.col("value") == F.lit(float("inf")))
        | (F.col("value") == F.lit(float("-inf")))
    )
    viol_type = ~F.coalesce(
        F.col("event_type").isin(_EVENT_TYPE_SET), F.lit(False)
    )
    agg = (
        ev.withWatermark("ts_ts", "1 hour")
        .groupBy(F.window("ts_ts", "1 hour").alias("win"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(viol_uid, 1).otherwise(0)).cast("long").alias("vu"),
            F.sum(F.when(viol_val, 1).otherwise(0)).cast("long").alias("vv"),
            F.sum(F.when(viol_type, 1).otherwise(0)).cast("long").alias("ve"),
        )
    )

    def rule(rid: str, v: str):
        return F.struct(
            F.lit(rid).alias("rule_id"),
            F.col("n").alias("n_checked"),
            F.col(v).alias("n_violations"),
        )

    rules = agg.select(
        F.unix_micros(F.col("win.start")).alias("win_start_us"),
        F.explode(
            F.array(
                rule("events.user_id.complete", "vu"),
                rule("events.value.finite", "vv"),
                rule("events.event_type.in_set", "ve"),
            )
        ).alias("r"),
    ).select("win_start_us", "r.*")
    with _pinned_state_shuffle(spark):
        table = run_to_memory(rules, "complete", "rule_audit")
    return spark.table(table)


def streaming_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize-on-ingest (plans/governance.py's scan-side hash as a
    STATELESS streaming projection): every micro-batch lands with the
    raw user_id already replaced by the salted token, so raw
    identifiers never reach the sink — the governance twin of
    streaming_blocklist's filter-on-ingest. Zero shuffle, zero state;
    the streaming plan is the batch projection fed micro-batches."""
    from psx_data_pipeline_spark.plans.governance import _PSEUDO_SALT
    from psx_data_pipeline_spark.functions.hashing import md5_long

    ev = events_stream(spark, sf_dir)
    token = F.when(
        F.col("user_id").isNotNull(),
        md5_long(
            F.concat(F.lit(_PSEUDO_SALT), F.col("user_id").cast("string"))
        ),
    )
    out = ev.select(
        "event_id", token.alias("user_token"), "event_type",
        milli("value").alias("value_k"),
    )
    table = run_to_memory(out, "append", "pseudo_ingest")
    return spark.table(table)


def streaming_label_tally(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (item, label) weighted vote tally (plans/weaklabel.py's
    first aggregate) maintained as a NATIVE streaming aggregation:
    the tally key space is bounded by catalogue x label vocabulary,
    so — exactly like streaming_cm_cells — the idiomatic plan is an
    incremental groupBy with map-side partial aggregation, state
    bounded at |items| * |labels| rows forever, and 'complete' output
    whose final table equals the batch tally. The election windows
    stay batch-side on the bounded result (plans/stream.py)."""
    from psx_data_pipeline_spark.plans.weaklabel import _N_ITEMS

    ev = events_stream(spark, sf_dir)
    votes = ev.where(
        F.col("event_id").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    ).select(
        (F.col("event_id") % _N_ITEMS).alias("item"),
        F.col("event_type").alias("label"),
        (1 + F.col("user_id") % 3).cast("long").alias("w"),
    )
    tally = votes.groupBy("item", "label").agg(
        F.sum("w").cast("long").alias("votes_w"),
        F.count(F.lit(1)).cast("long").alias("n_votes"),
    )
    with _pinned_state_shuffle(spark):
        table = run_to_memory(tally, "complete", "label_tally")
    return spark.table(table)


def streaming_zone_maps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone maps maintained ON INGEST: the (file month, writer) min/
    max/count statistics plans/skipping.py's pruning audit reads,
    kept continuously current as lineitem micro-batches land — a
    native streaming aggregation over a (partition x writer)-bounded
    key space, so state is the manifest size forever and every
    trigger's exchange is map-side combined to at most that many rows
    (the streaming_cm_cells / streaming_label_tally argument, applied
    to the storage layer). 'complete' output re-emits the manifest;
    a replay's final table equals the batch zone-map scan."""
    schema = spark.read.parquet(f"{sf_dir}/lineitem.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "lineitem.parquet")
        .parquet(sf_dir)
    )
    zones = (
        raw.where(
            F.col("l_shipdate").isNotNull() & F.col("l_partkey").isNotNull()
        )
        .groupBy(
            F.date_trunc("month", "l_shipdate").cast("date")
            .alias("file_month"),
            (F.col("l_orderkey") % 16).alias("writer"),
        )
        .agg(
            F.min("l_partkey").cast("long").alias("zmin"),
            F.max("l_partkey").cast("long").alias("zmax"),
            F.count(F.lit(1)).cast("long").alias("rows_in_file"),
        )
    )
    with _pinned_state_shuffle(spark):
        table = run_to_memory(zones, "complete", "zone_maps")
    return spark.table(table)


def streaming_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ordered CDC merge (plans/lakehouse.q_cdc_apply) maintained
    as streaming state: the change log lands as micro-batches and the
    live table is a native per-key MAX over struct(seq, ...) — the
    struct comparison is decided by the leading seq (unique per key),
    so the aggregate IS last-writer-wins, and being a plain MAX it
    combines map-side and merges associatively across micro-batches
    in any arrival order. State = one struct per live key (the table
    itself, the floor for any streaming upsert); tombstone drops stay
    batch-side on the bounded result. A replay's final table equals
    the batch merge."""
    from psx_data_pipeline_spark.plans.lakehouse import cdc_log
    from psx_data_pipeline_spark.scratch import scratch_dir

    log = cdc_log(spark, sf_dir)
    landing = scratch_dir("cdc_landing")
    log.write.mode("overwrite").parquet(landing)
    raw = spark.readStream.schema(log.schema).parquet(landing)
    latest = raw.groupBy("k").agg(
        F.max(F.struct("seq", "op", "name", "segment")).alias("m")
    )
    with _pinned_state_shuffle(spark):
        table = run_to_memory(latest, "complete", "cdc_live")
    return spark.table(table)


def streaming_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PII pattern census (plans/pii.q_pii_scan is the batch
    twin) as filter-on-ingest plus a NATIVE bounded-key streaming
    aggregation: the three regexp_counts run as stateless per-row
    expressions in each micro-batch (scan-side, no Python), and the
    per-source rollup is an incremental groupBy over the bounded
    |sources| key space — partial aggregation combines map-side, the
    state store holds one counter row per source forever, and
    'complete' mode re-emits the bounded table each trigger so a
    replay's final table equals the batch census (the shared oracle
    pins it)."""
    from psx_data_pipeline_spark.plans.pii import pii_census, pii_counts

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    out = pii_census(pii_counts(raw))
    with _pinned_state_shuffle(spark):
        table = run_to_memory(out, "complete", "pii_census")
    return spark.table(table)


def streaming_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-on-ingest: arriving images (odd doc_ids, replayed as a
    file stream) are dHashed in Arrow-batched mapInPandas and probe a
    STATIC band index of the already-ingested corpus (even doc_ids) —
    the production shape where each new image is checked against the
    catalog before landing, never corpus × corpus.

    Fully STATELESS append-mode plan: no watermark, no state store,
    and no stream-side distinct — a pair that collides in several
    bands would duplicate, so the join keeps only the FIRST matching
    band (band k matches and no band j < k matches, decidable
    row-side because both hash vectors ride the joined row). Each
    qualifying pair emits exactly once, making the stream's output
    value-identical to the batch even×odd oracle. At scale the static
    side is a precomputed (band, bval) index bucketed on the join
    key; here it is rebuilt from the fixture because the driver
    supplies one static table."""
    from psx_data_pipeline_spark.operators.multimodal import (
        perceptual_hash,
        synth_patterned_images,
    )

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .where(F.expr("doc_id % 2 = 1"))
        .select("doc_id")
    )
    store_docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.expr("doc_id % 2 = 0"))
        .select("doc_id")
    )
    bcols = ["b0", "b1", "b2", "b3"]

    def bands(df: DataFrame, tag: str) -> DataFrame:
        h = perceptual_hash(synth_patterned_images(df)).where(
            F.col("error").isNull()
        )
        return h.select(
            F.col("doc_id").alias(f"{tag}_id"),
            *[F.col(c).alias(f"{tag}{k}") for k, c in enumerate(bcols)],
            F.posexplode(F.array(*bcols)).alias("band", "bval"),
        )

    first_match = F.expr(
        "CASE band WHEN 0 THEN true"
        " WHEN 1 THEN x0 <> y0"
        " WHEN 2 THEN x0 <> y0 AND x1 <> y1"
        " ELSE x0 <> y0 AND x1 <> y1 AND x2 <> y2 END"
    )
    hamming = sum(
        F.bit_count(F.col(f"x{k}").bitwiseXOR(F.col(f"y{k}")))
        for k in range(4)
    ).cast("long")
    out = (
        bands(raw, "y")
        .join(bands(store_docs, "x"), ["band", "bval"])
        .where(first_match)
        .withColumn("hamming", hamming)
        .where(F.col("hamming") <= 3)
        .select(
            F.col("x_id").alias("store_id"),
            F.col("y_id").alias("stream_id"),
            "hamming",
        )
    )
    table = run_to_memory(out, "append", "img_near")
    return spark.table(table)
