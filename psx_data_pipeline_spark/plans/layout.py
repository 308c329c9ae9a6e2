"""Storage-layout and scan-pruning operators: the Z-ORDER clustering
audit and the Bloom-filter semi-join.

Both answer the same 100 TB question — "how much of the store does
this query have to READ?" — from the two ends a lakehouse controls:
how files are laid out (multi-dimensional clustering) and what a scan
can skip at runtime (a compact membership filter pushed to the probe
side). Extends the reference's planned incremental OHLC store
(/root/reference/README.md:61-71) with the layout/pruning layer a
store that size actually needs.

``zorder_layout`` — the write-side audit behind Z-ORDER BY (Morton
interleave; see the Delta/Iceberg OPTIMIZE ZORDER docs): both event
dimensions (user, hour) are range-quantized to 16 bits, bit-
interleaved into a 32-bit Morton code, and bucketed by its top 6
bits — 64 "files". The audit emits, per file and per layout
(z-order vs plain time-ordered), the min/max span of EACH dimension
— exactly the parquet footer stats a scan prunes on. Under the time
layout every file spans the full user range (a user-equality scan
reads all 64 files); under z-order each file spans ~1/8 of each
dimension (the scan reads ~8). Pure integer arithmetic, one scan,
two constant-size (<=64-row) aggregates; the only broadcast is the
single quantization-range row.

``bloom_semijoin`` — the runtime-filter pattern (Spark's
spark.sql.optimizer.runtime.bloomFilter, made explicit and
oracle-checkable): the build side's join keys are folded into a
constant-size bit array (2^20 bits as 32768 x 32-bit words — a
map-side-combinable groupBy, never a driver collect), and the probe
side tests k=3 md5-affine bit positions via joins against that
constant-size words table — at cluster scale a broadcast, so the
probe NEVER shuffles on the join key; rows failing the filter would
skip the real join entirely. The summary row counts true members,
false positives (expected, bounded by the m/n load factor), and
false negatives (structurally zero — the self-audit column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psx_data_pipeline_spark.functions.hashing import (
    HASH_P,
    md5_long,
    md5_long_sql,
    minhash_perms,
)
from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_events, load_table

# --- zorder_layout ------------------------------------------------------------

_QBITS = 16                 # per-dimension quantization width
_QMAX = 1 << _QBITS         # 65536 quantization cells per dimension
_NFILES_SHIFT = 26          # 32-bit Morton >> 26 = top 6 bits = 64 files
_TIME_SHIFT = 10            # 16-bit hour cell >> 10 = 64 time files
# clusterable-domain contract: |dim| <= 2^40 keeps every product below
# (2^41 range) * 2^16 = 2^57 — no int64 overflow under ANSI in either
# engine (hostile inputs beyond the bound are excluded, not crashed)
_DIM_BOUND = 1 << 40

_US_PER_HOUR = 3_600_000_000


def _interleave(qu: str, qt: str, idiv: str) -> str:
    """Morton interleave as pure +,*,%,intdiv arithmetic — the same
    expression text in both engines modulo the intdiv token (Spark
    ``div``, DuckDB ``//``); no shift builtins, so no 1<<63 edge."""
    terms = []
    for i in range(_QBITS):
        terms.append(f"(({qu} {idiv} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({qt} {idiv} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def _zorder_oracle() -> str:
    z = _interleave("qu", "qt", "//")
    return f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) // {_US_PER_HOUR} AS h
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
    AND user_id BETWEEN -{_DIM_BOUND} AND {_DIM_BOUND}
),
ev2 AS (
  SELECT * FROM ev WHERE h BETWEEN -{_DIM_BOUND} AND {_DIM_BOUND}
),
r AS (
  SELECT min(user_id) AS umin, max(user_id) AS umax,
         min(h) AS hmin, max(h) AS hmax
  FROM ev2
),
q AS (
  SELECT ((user_id - umin) * {_QMAX}) // (umax - umin + 1) AS qu,
         ((h - hmin) * {_QMAX}) // (hmax - hmin + 1) AS qt
  FROM ev2, r
),
coded AS (
  SELECT qu, qt, ({z}) // {1 << _NFILES_SHIFT} AS zbucket,
         qt // {1 << _TIME_SHIFT} AS tbucket
  FROM q
),
layouts AS (
  SELECT 'zorder' AS layout, zbucket AS bucket, qu, qt FROM coded
  UNION ALL
  SELECT 'time', tbucket, qu, qt FROM coded
)
SELECT layout, CAST(bucket AS BIGINT) AS bucket,
       count(*) AS n_rows,
       min(qu) AS qu_min, max(qu) AS qu_max,
       min(qt) AS qt_min, max(qt) AS qt_max,
       ((max(qu) - min(qu) + 1) * 1000) // {_QMAX} AS u_span_permille,
       ((max(qt) - min(qt) + 1) * 1000) // {_QMAX} AS t_span_permille
FROM layouts GROUP BY layout, bucket
"""


ZORDER_LAYOUT_ORACLE = _zorder_oracle()


@query("zorder_layout", ZORDER_LAYOUT_ORACLE)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file min/max dimension spans under Morton vs time-ordered
    layout — the footer-stats skipping audit (module docstring)."""
    ev = (
        load_events(spark, sf_dir)
        .where(
            F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("user_id").between(-_DIM_BOUND, _DIM_BOUND)
        )
        .select("user_id", F.expr(f"ts_us div {_US_PER_HOUR}").alias("h"))
        .where(F.col("h").between(-_DIM_BOUND, _DIM_BOUND))
    )
    ranges = ev.agg(
        F.min("user_id").alias("umin"), F.max("user_id").alias("umax"),
        F.min("h").alias("hmin"), F.max("h").alias("hmax"),
    )
    q = ev.crossJoin(F.broadcast(ranges)).select(
        F.expr(f"((user_id - umin) * {_QMAX}) div (umax - umin + 1)")
        .alias("qu"),
        F.expr(f"((h - hmin) * {_QMAX}) div (hmax - hmin + 1)").alias("qt"),
    )
    coded = q.select(
        "qu", "qt",
        F.expr(
            f"({_interleave('qu', 'qt', 'div')}) div {1 << _NFILES_SHIFT}"
        ).alias("zbucket"),
        F.expr(f"qt div {1 << _TIME_SHIFT}").alias("tbucket"),
    )
    both = coded.select(
        F.lit("zorder").alias("layout"), F.col("zbucket").alias("bucket"),
        "qu", "qt",
    ).unionByName(
        coded.select(
            F.lit("time").alias("layout"), F.col("tbucket").alias("bucket"),
            "qu", "qt",
        )
    )
    return both.groupBy("layout", F.col("bucket").cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("qu").alias("qu_min"), F.max("qu").alias("qu_max"),
        F.min("qt").alias("qt_min"), F.max("qt").alias("qt_max"),
    ).select(
        "layout", "bucket", "n_rows", "qu_min", "qu_max", "qt_min", "qt_max",
        F.expr(f"((qu_max - qu_min + 1) * 1000) div {_QMAX}")
        .alias("u_span_permille"),
        F.expr(f"((qt_max - qt_min + 1) * 1000) div {_QMAX}")
        .alias("t_span_permille"),
    )


# --- bloom_semijoin -----------------------------------------------------------

_M_BITS = 1 << 20   # filter size: 2^20 bits
_WORD = 32          # bits per word: max shift 31, no 1<<63 edge anywhere
_N_WORDS = _M_BITS // _WORD
_BLOOM_K = 3
_BLOOM_PERMS = minhash_perms(_BLOOM_K)

_BUILD_PRED = "o_orderpriority = '1-URGENT'"


def _bit_pos_sql(h: str, a: int, b: int) -> str:
    """j = affine(h) % m for the oracle side (h already reduced % P)."""
    return f"(({a} * ({h}) + {b}) % {HASH_P}) % {_M_BITS}"


def _bloom_oracle() -> str:
    hexpr = f"{md5_long_sql('CAST(k AS VARCHAR)')} % {HASH_P}"
    bit_rows = " UNION ALL ".join(
        f"SELECT ({_bit_pos_sql('h', a, b)}) // {_WORD} AS word,"
        f" ({_bit_pos_sql('h', a, b)}) % {_WORD} AS bit FROM bh"
        for _, a, b in _BLOOM_PERMS
    )
    probe_cols = ", ".join(
        f"({_bit_pos_sql('h', a, b)}) // {_WORD} AS w{i},"
        f" ({_bit_pos_sql('h', a, b)}) % {_WORD} AS b{i}"
        for i, a, b in _BLOOM_PERMS
    )
    passes = " AND ".join(
        f"coalesce((x{i}.mask >> p.b{i}) & 1, 0) = 1"
        for i, _, _ in _BLOOM_PERMS
    )
    probe_joins = " ".join(
        f"LEFT JOIN words x{i} ON x{i}.word = p.w{i}"
        for i, _, _ in _BLOOM_PERMS
    )
    return f"""
WITH bk AS (
  SELECT DISTINCT o_orderkey AS k FROM orders
  WHERE {_BUILD_PRED} AND o_orderkey IS NOT NULL
),
bh AS (SELECT k, {hexpr} AS h FROM bk),
bits AS ({bit_rows}),
words AS (
  SELECT word, bit_or(CAST(1 AS BIGINT) << bit) AS mask
  FROM bits GROUP BY word
),
pk AS (
  SELECT DISTINCT l_orderkey AS k FROM lineitem
  WHERE l_orderkey IS NOT NULL
),
p AS (
  SELECT k, {probe_cols}
  FROM (SELECT k, {hexpr} AS h FROM pk) t
),
tested AS (
  SELECT p.k,
         CASE WHEN {passes} THEN 1 ELSE 0 END AS pass,
         CASE WHEN bk.k IS NOT NULL THEN 1 ELSE 0 END AS member
  FROM p {probe_joins}
  LEFT JOIN bk ON bk.k = p.k
)
SELECT count(*) AS n_probe,
       CAST(sum(pass) AS BIGINT) AS n_pass,
       CAST(sum(member) AS BIGINT) AS n_member,
       CAST(sum(pass * (1 - member)) AS BIGINT) AS n_false_pos,
       CAST(sum(member * (1 - pass)) AS BIGINT) AS n_missed,
       CASE WHEN count(*) = sum(member) THEN 0
            ELSE (CAST(sum(pass * (1 - member)) AS BIGINT) * 1000)
                 // (count(*) - CAST(sum(member) AS BIGINT)) END
         AS fp_permille
FROM tested
"""


BLOOM_SEMIJOIN_ORACLE = _bloom_oracle()


def bloom_words(keys: DataFrame) -> DataFrame:
    """The filter itself: (word, mask) rows, at most _N_WORDS of them
    regardless of build size — a map-side-combinable groupBy."""
    h = (md5_long(F.col("k").cast("string")) % HASH_P).alias("h")
    bits = keys.select(h).select(
        F.explode(
            F.array(*[
                F.struct(
                    F.expr(f"({_bit_pos_sql('h', a, b)}) div {_WORD}")
                    .alias("word"),
                    F.expr(f"({_bit_pos_sql('h', a, b)}) % {_WORD}")
                    .alias("bit"),
                )
                for _, a, b in _BLOOM_PERMS
            ])
        ).alias("x")
    ).select("x.word", "x.bit")
    return bits.groupBy("word").agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("mask")
    )


@query("bloom_semijoin", BLOOM_SEMIJOIN_ORACLE)
def q_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a 2^20-bit Bloom filter from the urgent orders' keys,
    probe every lineitem key through it, and audit the outcome
    against exact membership (module docstring)."""
    bk = (
        load_table(spark, "orders", sf_dir)
        .where(F.expr(_BUILD_PRED) & F.col("o_orderkey").isNotNull())
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    words = bloom_words(bk)
    pk = (
        load_table(spark, "lineitem", sf_dir)
        .where(F.col("l_orderkey").isNotNull())
        .select(F.col("l_orderkey").alias("k"))
        .distinct()
    )
    h = (md5_long(F.col("k").cast("string")) % HASH_P).alias("h")
    p = pk.select("k", h).select(
        "k",
        *[
            c
            for i, a, b in _BLOOM_PERMS
            for c in (
                F.expr(f"({_bit_pos_sql('h', a, b)}) div {_WORD}")
                .alias(f"w{i}"),
                F.expr(f"({_bit_pos_sql('h', a, b)}) % {_WORD}")
                .alias(f"b{i}"),
            )
        ],
    )
    # k probes = k joins against the constant-size words table (a
    # broadcast at scale); the probe side never shuffles on the key
    for i, _, _ in _BLOOM_PERMS:
        w = F.broadcast(
            words.select(
                F.col("word").alias(f"word{i}"), F.col("mask").alias(f"mask{i}")
            )
        )
        p = p.join(w, p[f"w{i}"] == w[f"word{i}"], "left")
    pass_expr = " AND ".join(
        f"coalesce(shiftright(mask{i}, b{i}) & 1, 0) = 1"
        for i, _, _ in _BLOOM_PERMS
    )
    tested = (
        p.withColumn("pass", F.expr(f"CASE WHEN {pass_expr} THEN 1 ELSE 0 END"))
        .join(
            bk.select(F.col("k").alias("mk"), F.lit(1).alias("member_flag")),
            F.col("k") == F.col("mk"),
            "left",
        )
        .withColumn("member", F.coalesce(F.col("member_flag"), F.lit(0)))
    )
    return tested.agg(
        F.count(F.lit(1)).alias("n_probe"),
        F.sum("pass").cast("long").alias("n_pass"),
        F.sum("member").cast("long").alias("n_member"),
        F.sum(F.expr("pass * (1 - member)")).cast("long").alias("n_false_pos"),
        F.sum(F.expr("member * (1 - pass)")).cast("long").alias("n_missed"),
    ).select(
        "n_probe", "n_pass", "n_member", "n_false_pos", "n_missed",
        F.expr(
            "CASE WHEN n_probe = n_member THEN 0 "
            "ELSE (n_false_pos * 1000) div (n_probe - n_member) END"
        ).alias("fp_permille"),
    )


# --- zorder_benefit: the layout A/B read-amplification audit --------------------

# Workload predicates in QUANTIZED cell space (engine-identical by
# construction): a user-equality-ish band, a time-range band, and a
# combined box — the three shapes Z-ORDER exists to serve.
_ZB_PREDS = [
    # (pred_id, qu_lo, qu_hi, qt_lo, qt_hi)
    (1, 20_000, 20_600, 0, _QMAX),          # narrow user band, all time
    (2, 0, _QMAX, 30_000, 34_000),          # all users, narrow time range
    (3, 20_000, 28_000, 30_000, 38_000),    # combined box
]

_ZB_PREDS_SQL = " UNION ALL ".join(
    f"SELECT {p} AS pred_id, {ul} AS qu_lo, {uh} AS qu_hi,"
    f" {tl} AS qt_lo, {th} AS qt_hi"
    for p, ul, uh, tl, th in _ZB_PREDS
)

ZORDER_BENEFIT_ORACLE = f"""
WITH z AS ({ZORDER_LAYOUT_ORACLE}),
preds AS ({_ZB_PREDS_SQL}),
audit AS (
  SELECT z.layout, p.pred_id,
         CASE WHEN z.qu_max < p.qu_lo OR z.qu_min > p.qu_hi
                OR z.qt_max < p.qt_lo OR z.qt_min > p.qt_hi
              THEN 0 ELSE 1 END AS scanned,
         z.n_rows
  FROM z CROSS JOIN preds p
)
SELECT layout, pred_id,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(scanned) AS BIGINT) AS n_scanned,
       CAST(sum(scanned * n_rows) AS BIGINT) AS rows_scanned,
       CAST((count(*) - sum(scanned)) * 1000 // count(*) AS BIGINT)
         AS prune_permille
FROM audit GROUP BY layout, pred_id
"""


@query("zorder_benefit", ZORDER_BENEFIT_ORACLE)
def q_zorder_benefit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The question zorder_layout's spans exist to answer, closed
    out: per workload predicate, how many files (and rows) a
    footer-stats-pruned scan reads under the z-order layout vs the
    time layout — the read-amplification A/B that justifies an
    OPTIMIZE ZORDER rewrite. A file is skipped iff its (qu, qt)
    bounding box misses the predicate box.

    Shape: composes the zorder_layout aggregate (<=128 file rows);
    the predicate catalogue rides as an exploded literal
    (zone_map_prune's no-join device); the audit aggregate runs over
    files x |catalogue| rows."""
    z = q_zorder_layout(spark, sf_dir)
    preds = F.array(*[
        F.struct(
            F.lit(p).alias("pred_id"),
            F.lit(ul).alias("qu_lo"), F.lit(uh).alias("qu_hi"),
            F.lit(tl).alias("qt_lo"), F.lit(th).alias("qt_hi"),
        )
        for p, ul, uh, tl, th in _ZB_PREDS
    ])
    audit = z.select(
        "layout", "n_rows", "qu_min", "qu_max", "qt_min", "qt_max",
        F.explode(preds).alias("p"),
    ).select(
        "layout", F.col("p.pred_id").alias("pred_id"),
        F.when(
            (F.col("qu_max") < F.col("p.qu_lo"))
            | (F.col("qu_min") > F.col("p.qu_hi"))
            | (F.col("qt_max") < F.col("p.qt_lo"))
            | (F.col("qt_min") > F.col("p.qt_hi")),
            F.lit(0),
        ).otherwise(F.lit(1)).alias("scanned"),
        "n_rows",
    )
    return audit.groupBy("layout", "pred_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("scanned").cast("long").alias("n_scanned"),
        F.sum(F.col("scanned") * F.col("n_rows"))
        .cast("long").alias("rows_scanned"),
        F.expr(
            "CAST((count(1) - sum(scanned)) * 1000 div count(1) AS BIGINT)"
        ).alias("prune_permille"),
    )
