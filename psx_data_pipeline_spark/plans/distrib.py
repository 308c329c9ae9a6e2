"""Distribution analytics over the ``documents`` corpus — the sketch /
quantile / sampling / drift operators a training-data pipeline runs to
AUDIT a 100 TB corpus without corpus-sized shuffles.

Four operators, all integer-exact cross-engine (DuckDB oracle in the
same file, repo determinism conventions from plans/registry.py):

* ``count_min_hitters`` — a Count-Min sketch (Cormode & Muthukrishnan
  2005) of token frequencies, audited against the exact counts of the
  top tokens: the sketch is a fixed d×w = 4×1024 integer grid that
  map-side combines, so the only vocabulary-wide exchange left is the
  candidate recount the audit itself requires.
* ``group_quantiles`` — EXACT per-source length percentiles via the
  distinct-value-cume trick: pre-aggregate to (source, value) counts,
  then a window over the ≤|domain| distinct rows — never a per-row
  sort of the corpus.
* ``stratified_sample`` — deterministic proportional-allocation
  sampling (the corpus_sample Bernoulli gate's exact-count sibling):
  hash-ranked row_number per stratum against a broadcast quota table.
* ``ks_drift`` — per-source two-sample Kolmogorov–Smirnov distance vs
  the rest of the corpus on a fixed 64-bin length grid; the bin grid
  bounds the state at |sources|·64 rows regardless of corpus size.

Generalizes the reference's update_statistics audit
(/root/reference/psx_data_automation/scrape_tickers.py:503-533 —
counts per category after a sync) to distribution-level audits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from psx_data_pipeline_spark.functions.numeric import MILLI_BOUND
from psx_data_pipeline_spark.functions.hashing import (
    HASH_P,
    md5_long,
    md5_long_sql,
    minhash_perms,
)
from psx_data_pipeline_spark.functions.textfns import TOKENS_SQL, tokens
from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_table_parallel

_TOKS = TOKENS_SQL.format("text")

# --- Count-Min sketch heavy hitters ------------------------------------------

_CM_D = 4          # sketch depth (independent hash rows)
_CM_W = 1024       # sketch width (cells per row)
_CM_TOP = 20       # audited candidate set: exact top-k tokens
_CM_PERMS = minhash_perms(_CM_D)  # deterministic (i, a, b) rows

_CM_PERMS_SQL = "(VALUES " + ", ".join(
    f"({i}, {a}, {b})" for i, a, b in _CM_PERMS
) + ") AS perms(i, a, b)"

COUNT_MIN_ORACLE = f"""
WITH occ AS (
  SELECT unnest({_TOKS}) AS tok FROM documents
),
h AS (
  SELECT tok, {md5_long_sql('tok')} % {HASH_P} AS hp FROM occ
),
cells AS (
  SELECT i, ((a * hp + b) % {HASH_P}) % {_CM_W} AS cell,
         count(*) AS cnt
  FROM h, {_CM_PERMS_SQL}
  GROUP BY 1, 2
),
top AS (
  SELECT tok, count(*) AS exact_c, max(hp) AS hp
  FROM h GROUP BY tok
  ORDER BY exact_c DESC, tok LIMIT {_CM_TOP}
),
probe AS (
  SELECT t.tok, t.exact_c, p.i,
         ((p.a * t.hp + p.b) % {HASH_P}) % {_CM_W} AS cell
  FROM top t, {_CM_PERMS_SQL.replace('AS perms(', 'AS p(')}
)
SELECT tok, CAST(exact_c AS BIGINT) AS exact_c,
       CAST(min(cnt) AS BIGINT) AS cm_est,
       CAST(min(cnt) - exact_c AS BIGINT) AS over_err
FROM probe JOIN cells USING (i, cell)
GROUP BY tok, exact_c
"""


def cm_occurrences(docs: DataFrame) -> DataFrame:
    """Token occurrences with the reduced hash ``hp`` every CM hash
    row derives from."""
    return docs.select(F.explode(tokens("text")).alias("tok")).select(
        "tok", (md5_long(F.col("tok")) % HASH_P).alias("hp")
    )


def cm_cell_array() -> F.Column:
    """d (i, cell) structs per occurrence as a literal array — pure
    projection, no join, stays inside whole-stage codegen."""
    return F.array(*[
        F.struct(
            F.lit(i).alias("i"),
            ((F.lit(a) * F.col("hp") + F.lit(b)) % HASH_P % _CM_W).alias("cell"),
        )
        for i, a, b in _CM_PERMS
    ])


def cm_cells(occ: DataFrame) -> DataFrame:
    """The d×w counter grid: a map-side-combinable groupBy that emits
    at most d·w rows per map task regardless of corpus size."""
    return (
        occ.select(F.explode(cm_cell_array()).alias("x"))
        .select("x.i", "x.cell")
        .groupBy("i", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_audit(occ: DataFrame, cells: DataFrame) -> DataFrame:
    """Probe ``cells`` with the exact top-{_CM_TOP} tokens of ``occ``
    and report estimate vs truth (shared by the batch query and the
    streaming twin, which builds ``cells`` under the streaming
    runtime)."""
    top = (
        occ.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_c"), F.max("hp").alias("hp"))
        .orderBy(F.desc("exact_c"), "tok")
        .limit(_CM_TOP)
    )
    probe = top.select(
        "tok", "exact_c", F.explode(cm_cell_array()).alias("x")
    ).select("tok", "exact_c", "x.i", "x.cell")
    return (
        probe.join(F.broadcast(cells), ["i", "cell"])
        .groupBy("tok", "exact_c")
        .agg(F.min("cnt").alias("cm_est"))
        .select(
            "tok",
            F.col("exact_c").cast("long").alias("exact_c"),
            F.col("cm_est").cast("long").alias("cm_est"),
            (F.col("cm_est") - F.col("exact_c")).cast("long").alias("over_err"),
        )
    )


@query("count_min_hitters", COUNT_MIN_ORACLE)
def q_count_min_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch of corpus token frequencies, audited against
    the exact counts of the top-{_CM_TOP} tokens.

    The sketch is the scale object: d×w = {_CM_D}×{_CM_W} integer
    cells built by a map-side-combinable groupBy — every map task
    emits at most {_CM_D * _CM_W} rows no matter how many tokens it
    scanned, so the sketch's exchange is CONSTANT in corpus size
    (same shape as the HLL registers in vocab_sketch). CM guarantees
    est ≥ exact and est ≤ exact + εN w.h.p. (ε = e/w); the query
    PROVES both sides for the audited set by reporting
    ``over_err = cm_est − exact_c`` (non-negativity is pinned in
    tests/test_distrib.py).

    The candidate recount (exact top-{_CM_TOP}) is the one
    vocabulary-wide shuffle, and it exists only because the audit
    needs ground truth; a pure 100 TB heavy-hitter pass would take
    candidates from the per-partition Misra-Gries sketch
    (plans/spans.py heavy_shingles) and probe the CM grid with them.
    Hashes are the md5-affine family (functions/hashing.py) so the
    DuckDB oracle reproduces every cell bit-for-bit."""
    occ = cm_occurrences(load_table_parallel(spark, "documents", sf_dir))
    return cm_audit(occ, cm_cells(occ))


# --- exact per-group quantiles -----------------------------------------------

# percentile q over a group of n values = the lowest value whose
# cumulative count reaches ceil(q*n/100) — a total, integer-only
# definition both engines evaluate identically (no interpolation).
_QS = (50, 90, 99)


def _q_case(q: int, engine: str) -> str:
    div = "//" if engine == "duck" else "div"
    return (
        f"min(CASE WHEN cum >= ({q} * n + 99) {div} 100 THEN v END)"
    )


GROUP_QUANTILES_ORACLE = f"""
WITH vc AS (
  SELECT source, n_chars AS v, count(*) AS c
  FROM documents WHERE n_chars IS NOT NULL
  GROUP BY 1, 2
),
cw AS (
  SELECT source, v,
         sum(c) OVER (PARTITION BY source ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY source) AS n
  FROM vc
)
SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
       CAST({_q_case(50, 'duck')} AS BIGINT) AS p50,
       CAST({_q_case(90, 'duck')} AS BIGINT) AS p90,
       CAST({_q_case(99, 'duck')} AS BIGINT) AS p99
FROM cw GROUP BY source
"""


@query("group_quantiles", GROUP_QUANTILES_ORACLE)
def q_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-source length percentiles (p50/p90/p99 of n_chars).

    Scale shape: the naive exact quantile sorts every row of the
    group; this plan first collapses to (source, value) COUNTS — a
    map-side-combinable groupBy bounded by |sources|·|value domain|,
    not by corpus rows — and runs the cumulative window over those
    distinct rows only. A 100 TB corpus with a ~10^6-value length
    domain windows over ≤10^6 rows per source. The percentile
    definition (lowest value whose cume reaches ceil(q·n/100)) is
    integer-only, so there is no interpolation to diverge across
    engines; NULL lengths are excluded from the frame on both sides."""
    docs = load_table_parallel(spark, "documents", sf_dir)
    vc = (
        docs.filter(F.col("n_chars").isNotNull())
        .groupBy("source", F.col("n_chars").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_cum = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("source")
    cw = vc.select(
        "source", "v",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    return cw.groupBy("source").agg(
        F.max("n").cast("long").alias("n_docs"),
        F.expr(_q_case(50, "spark")).cast("long").alias("p50"),
        F.expr(_q_case(90, "spark")).cast("long").alias("p90"),
        F.expr(_q_case(99, "spark")).cast("long").alias("p99"),
    )


# --- deterministic stratified sampling ---------------------------------------

_STRAT_TOTAL = 200  # target sample size across all strata

STRATIFIED_SAMPLE_ORACLE = f"""
WITH base AS (
  SELECT doc_id, source,
         {md5_long_sql("CAST(doc_id AS VARCHAR)")} AS h
  FROM documents WHERE doc_id IS NOT NULL
),
counts AS (
  SELECT source, count(*) AS n_s FROM base GROUP BY source
),
quotas AS (
  SELECT source, n_s,
         greatest(1, ({_STRAT_TOTAL} * n_s)
                     // (SELECT sum(n_s) FROM counts)) AS quota
  FROM counts
),
ranked AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY h, doc_id) AS rk
  FROM base
)
SELECT r.doc_id, r.source,
       CAST(r.rk AS BIGINT) AS rk, CAST(q.quota AS BIGINT) AS quota
FROM ranked r JOIN quotas q USING (source)
WHERE r.rk <= q.quota
"""


@query("stratified_sample", STRATIFIED_SAMPLE_ORACLE)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic proportional-allocation stratified sample: each
    source contributes max(1, floor(T·n_s/N)) documents, chosen by
    md5-hash rank so both engines (and any re-run) pick the same
    rows — the exact-count sibling of corpus_sample's Bernoulli gate.

    Scale shape: the quota table is |sources| rows and broadcasts;
    the per-stratum rank is a window whose ``rk <= quota`` consumer
    lets Spark apply the WindowGroupLimit rewrite (top-quota per
    group pushed below the full sort) — no corpus-wide global sort,
    one exchange on the stratum key. Rows with NULL doc_id are
    excluded from the frame on both sides (no cross-engine NULL
    ordering to disagree on)."""
    docs = load_table_parallel(spark, "documents", sf_dir)
    base = docs.filter(F.col("doc_id").isNotNull()).select(
        "doc_id", "source",
        md5_long(F.col("doc_id").cast("string")).alias("h"),
    )
    counts = base.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    tot = counts.agg(F.sum("n_s").alias("n_tot"))
    quotas = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.greatest(
                F.lit(1), F.expr(f"({_STRAT_TOTAL} * n_s) div n_tot")
            ).alias("quota"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy("h", "doc_id")
    )
    # quota <= _STRAT_TOTAL always (n_s <= N), so this literal bound
    # is a no-op semantically — but a LITERAL rank filter directly
    # over the window is what lets Spark's WindowGroupLimit rewrite
    # prune each stratum to its top rows below the sort, where the
    # data-dependent rk <= quota filter alone cannot
    return (
        base.withColumn("rk", rk)
        .filter(F.col("rk") <= F.lit(_STRAT_TOTAL))
        .join(F.broadcast(quotas), "source")
        .filter(F.col("rk") <= F.col("quota"))
        .select(
            "doc_id", "source",
            F.col("rk").cast("long").alias("rk"),
            F.col("quota").cast("long").alias("quota"),
        )
    )


# --- binned Kolmogorov-Smirnov drift -----------------------------------------

# fixed 64-bin grid over n_chars: bin = min(63, n_chars div 16).
# The grid is the scale lever — per-source state is 64 rows no matter
# the corpus size; cdfs are quantized to per-mille integers (±1 pm
# quantization, documented) so the statistic is pure int arithmetic.
_KS_BINS = 64
_KS_W = 16

KS_DRIFT_ORACLE = f"""
WITH bc AS (
  SELECT source,
         least({_KS_BINS - 1}, greatest(0, n_chars // {_KS_W})) AS bin,
         count(*) AS c
  FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL
  GROUP BY 1, 2
),
dense AS (
  SELECT sg.source, sg.bin, coalesce(bc.c, 0) AS c0
  FROM (SELECT s.source, g.bin
        FROM (SELECT DISTINCT source FROM bc) s,
             (SELECT unnest(generate_series(0, {_KS_BINS - 1})) AS bin) g) sg
  LEFT JOIN bc USING (source, bin)
),
cum AS (
  SELECT source, bin,
         sum(c0) OVER (PARTITION BY source ORDER BY bin
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_s,
         sum(c0) OVER (PARTITION BY source) AS n_s,
         sum(c0) OVER (ORDER BY bin
                       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gcum,
         sum(c0) OVER () AS n_tot
  FROM dense
),
pm AS (
  SELECT source, n_s,
         (1000 * cum_s) // n_s AS pm_s,
         CASE WHEN n_tot - n_s = 0 THEN (1000 * cum_s) // n_s
              ELSE (1000 * (gcum - cum_s)) // (n_tot - n_s) END AS pm_r
  FROM cum
)
SELECT source, CAST(max(n_s) AS BIGINT) AS n_docs,
       CAST(max(abs(pm_s - pm_r)) AS BIGINT) AS ks_permille
FROM pm GROUP BY source
"""


@query("ks_drift", KS_DRIFT_ORACLE)
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source two-sample Kolmogorov-Smirnov distance between the
    source's document-length distribution and the REST of the corpus,
    on a fixed {_KS_BINS}-bin grid — the drift audit a pipeline runs
    when a new crawl snapshot lands (did source X's length profile
    shift?).

    Scale shape: raw lengths collapse to (source, bin) counts first
    (map-side combinable, ≤ |sources|·{_KS_BINS} rows survive), the
    dense grid is a literal sequence explode (projection, no join),
    and every window runs over a bounded grid — corpus size never
    appears in any post-aggregation cardinality. The pooled cume is
    computed once on its own {_KS_BINS}-row grid and joined back
    broadcast, so no corpus-sized window ever collapses to one
    partition. Cdfs are per-mille
    integer floors (±1 pm quantization — exact cross-engine by
    construction, and 1000·cum stays under 2^63 until ~10^16 docs);
    sources whose complement is empty (single-source corpus) define
    drift as 0."""
    docs = load_table_parallel(spark, "documents", sf_dir)
    # NULL sources have no drift identity (and a NULL key never
    # equi-joins onto the dense grid — it would surface as a
    # zero-count source and divide by zero; fuzz-found class)
    bc = (
        docs.filter(
            F.col("n_chars").isNotNull() & F.col("source").isNotNull()
        )
        .groupBy(
            "source",
            # clamped on BOTH ends: a negative length (hostile data)
            # must land in bin 0, not fall off the dense grid — a
            # source living entirely off-grid would divide by n_s = 0
            F.least(
                F.lit(_KS_BINS - 1),
                F.greatest(F.lit(0), F.expr(f"n_chars div {_KS_W}")),
            ).alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dense = (
        bc.select("source").distinct()
        .select(
            "source",
            F.explode(F.sequence(F.lit(0), F.lit(_KS_BINS - 1))).alias("bin"),
        )
        .join(bc, ["source", "bin"], "left")
        .select("source", "bin", F.coalesce(F.col("c"), F.lit(0)).alias("c0"))
    )
    # the global cume lives on its own 64-row grid (one tiny
    # unpartitioned window over exactly _KS_BINS rows) and joins back
    # broadcast — the per-(source, bin) plan never sees an
    # all-rows-to-one-partition window
    gbins = bc.groupBy("bin").agg(F.sum("c").alias("gc"))
    w_g = (
        Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_g_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    gdense = (
        spark.range(1)
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(_KS_BINS - 1))).alias("bin")
        )
        .join(gbins, "bin", "left")
        .select("bin", F.coalesce(F.col("gc"), F.lit(0)).alias("g0"))
        .select(
            "bin",
            F.sum("g0").over(w_g).alias("gcum"),
            F.sum("g0").over(w_g_all).alias("n_tot"),
        )
    )
    w_cum = (
        Window.partitionBy("source").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_src = Window.partitionBy("source")
    cum = (
        dense.select(
            "source", "bin",
            F.sum("c0").over(w_cum).alias("cum_s"),
            F.sum("c0").over(w_src).alias("n_s"),
        )
        .join(F.broadcast(gdense), "bin")
    )
    pm = cum.select(
        "source", "n_s",
        F.expr("(1000 * cum_s) div n_s").alias("pm_s"),
        F.expr(
            "CASE WHEN n_tot - n_s = 0 THEN (1000 * cum_s) div n_s "
            "ELSE (1000 * (gcum - cum_s)) div (n_tot - n_s) END"
        ).alias("pm_r"),
    )
    return pm.groupBy("source").agg(
        F.max("n_s").cast("long").alias("n_docs"),
        F.max(F.abs(F.col("pm_s") - F.col("pm_r")))
        .cast("long")
        .alias("ks_permille"),
    )


# --- robust outlier audit (median / MAD) -------------------------------------

# values enter as milli-int floors (floor(value*1000) is the same
# double op in both engines); median is the group_quantiles lower
# median (lowest v with cume >= ceil(n/2)) — integer-only throughout,
# so the MAD fence 3*MAD needs no float epsilon.

_MED_DUCK = """
SELECT {key}, min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS {out}
FROM (
  SELECT {key}, v,
         sum(c) OVER (PARTITION BY {key} ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY {key}) AS n
  FROM (SELECT {key}, {val} AS v, count(*) AS c FROM {src} GROUP BY 1, 2)
) GROUP BY {key}
"""

# NaN/Inf/overflow guard: floor(Inf) -> BIGINT errors in DuckDB but
# saturates in Spark, and |value| >= 2^63/1000 overflows the milli
# floor — the fence excludes non-finite and out-of-range values
# identically in both engines (hostile-probe class, pre-hardened)
_VAL_OK = (
    "value IS NOT NULL AND NOT isnan(value) "
    f"AND value BETWEEN -{MILLI_BOUND:g} AND {MILLI_BOUND:g}"
)

ROBUST_OUTLIERS_ORACLE = f"""
WITH ev AS (
  SELECT event_type, CAST(floor(value * 1000) AS BIGINT) AS v
  FROM events WHERE {_VAL_OK}
),
med AS ({_MED_DUCK.format(key='event_type', val='v', out='med', src='ev')}),
dev AS (
  SELECT ev.event_type, ev.v, abs(ev.v - med.med) AS d
  FROM ev JOIN med USING (event_type)
),
mad AS ({_MED_DUCK.format(key='event_type', val='d', out='mad', src='dev')})
SELECT dev.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(med.med) AS BIGINT) AS med_milli,
       CAST(max(mad.mad) AS BIGINT) AS mad_milli,
       CAST(sum(CASE WHEN dev.d > 3 * mad.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev
JOIN med USING (event_type)
JOIN mad USING (event_type)
GROUP BY dev.event_type
"""


def _lower_median(df: DataFrame, key: str, val: str, out: str) -> DataFrame:
    """Lowest value whose cumulative count reaches ceil(n/2), per key,
    computed over distinct-(key, value) COUNTS — the group_quantiles
    shape: the window's input is bounded by |keys|x|value domain|."""
    vc = df.groupBy(key, F.col(val).alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w_cum = (
        Window.partitionBy(key).orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(key)
    return (
        vc.select(
            key, "v",
            F.sum("c").over(w_cum).alias("cum"),
            F.sum("c").over(w_all).alias("n"),
        )
        .groupBy(key)
        .agg(
            F.min(
                F.when(F.expr("cum >= (n + 1) div 2"), F.col("v"))
            ).alias(out)
        )
    )


@query("robust_outliers", ROBUST_OUTLIERS_ORACLE)
def q_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type robust outlier audit: median and MAD (median
    absolute deviation) of the value distribution, and how many events
    sit outside the 3-MAD fence — the data-quality gate that survives
    the very outliers a mean/stddev z-score would be skewed by.

    Scale shape: both medians run through the distinct-value-count
    window (see _lower_median — bounded by |types|·|value domain|,
    never a per-row sort), and the median/MAD tables that join back
    are |event types| rows, broadcast. Values are milli-int floors so
    every comparison — including the 3·MAD fence — is int64 and
    engine-exact; NULL/NaN/Inf/out-of-range values are excluded from
    the frame by the same predicate on both sides."""
    ev = (
        load_table_parallel(spark, "events", sf_dir)
        .filter(F.expr(_VAL_OK))
        .select(
            "event_type",
            F.floor(F.col("value") * 1000).cast("long").alias("v"),
        )
    )
    med = _lower_median(ev, "event_type", "v", "med")
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "v", F.abs(F.col("v") - F.col("med")).alias("d")
    )
    mad = _lower_median(dev, "event_type", "d", "mad")
    return (
        dev.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max("med").cast("long").alias("med_milli"),
            F.max("mad").cast("long").alias("mad_milli"),
            F.sum(
                F.when(F.col("d") > 3 * F.col("mad"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
    )


# --- train/val/test split assignment + leakage audit -------------------------

# Deterministic hash split (80/10/10 on a salted id hash) with the
# audit every training pipeline needs next to it: EXACT-DUPLICATE
# LEAKAGE — the split is a function of doc identity, not content, so
# byte-identical documents can land in different splits and leak
# evaluation data into training. A fingerprint spanning >= 2 splits
# marks every carrier document as leaked.
_SPLIT_SQL = (
    "CASE WHEN {h} % 100 < 80 THEN 'train' "
    "WHEN {h} % 100 < 90 THEN 'val' ELSE 'test' END"
).format(h=md5_long_sql("CAST(doc_id AS VARCHAR) || ':split'"))

SPLIT_ASSIGN_ORACLE = f"""
WITH d AS (
  SELECT doc_id, source, {_SPLIT_SQL} AS split,
         CASE WHEN text IS NULL THEN NULL
              ELSE {md5_long_sql('text')} END AS fp
  FROM documents WHERE doc_id IS NOT NULL
),
leaked AS (
  SELECT fp FROM d WHERE fp IS NOT NULL
  GROUP BY fp HAVING count(DISTINCT split) > 1
)
SELECT d.split, d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN l.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_leaked_docs
FROM d LEFT JOIN leaked l ON d.fp = l.fp
GROUP BY d.split, d.source
"""


@query("split_assign", SPLIT_ASSIGN_ORACLE)
def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment (salted md5 of
    the doc id — both engines reproduce every assignment) with the
    cross-split exact-duplicate leakage audit: a content fingerprint
    appearing in two splits means evaluation text leaked into
    training, and every carrier document is counted per (split,
    source).

    Scale shape: the fingerprint check is one map-side-combinable
    groupBy on the 8-byte fp (never the text), the leaked set is
    bounded by cross-split duplicate GROUPS (tiny next to the
    corpus), and the membership join is a plain equi-join on fp that
    AQE turns into a broadcast when the leaked set is small — the
    common case. NULL-text docs carry no fingerprint (they cannot
    leak content); NULL-id docs have no stable split identity and
    are excluded on both sides."""
    docs = load_table_parallel(spark, "documents", sf_dir)
    # native-column twin of _SPLIT_SQL (Spark's parser wants VARCHAR
    # with a length, so the oracle string can't be shared verbatim)
    h = md5_long(
        F.concat(F.col("doc_id").cast("string"), F.lit(":split"))
    ) % 100
    split = (
        F.when(h < 80, "train").when(h < 90, "val").otherwise("test")
    )
    d = docs.filter(F.col("doc_id").isNotNull()).select(
        "source",
        split.alias("split"),
        F.when(
            F.col("text").isNotNull(), md5_long(F.col("text"))
        ).alias("fp"),
    )
    leaked = (
        d.filter(F.col("fp").isNotNull())
        .groupBy("fp")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .select("fp")
    )
    return (
        d.join(leaked.withColumn("lk", F.lit(1)), "fp", "left")
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.coalesce(F.col("lk"), F.lit(0)))
            .cast("long")
            .alias("n_leaked_docs"),
        )
    )


# --- weighted sampling without replacement (Efraimidis–Spirakis) ------------

_WS_M = 100       # sample size
_WS_SALTS = 8     # phase-1 salt groups bounding any single top-M sort

_WS_H = md5_long_sql("CAST(doc_id AS VARCHAR) || ':ws'")

WEIGHTED_SAMPLE_ORACLE = f"""
WITH w AS (
  SELECT doc_id,
         CAST(len({TOKENS_SQL.format('text')}) AS BIGINT) AS weight,
         ({_WS_H}) % {HASH_P} AS hp
  FROM documents
  WHERE doc_id IS NOT NULL AND len({TOKENS_SQL.format('text')}) >= 1
),
keyed AS (
  SELECT doc_id, weight,
         (CAST(floor(1e9 * ln((CAST({HASH_P} AS DOUBLE) + 1) / (hp + 1)))
               AS BIGINT) * 1000000) // weight AS k
  FROM w
),
p1 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY doc_id % {_WS_SALTS} ORDER BY k, doc_id) AS rn1
    FROM keyed
  ) WHERE rn1 <= {_WS_M}
)
SELECT doc_id, weight, k,
       CAST(row_number() OVER (ORDER BY k, doc_id) AS INT) AS rank
FROM p1 QUALIFY rank <= {_WS_M}
"""


@query("weighted_sample", WEIGHTED_SAMPLE_ORACLE)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — the
    Efraimidis–Spirakis exponential-clock scheme with the randomness
    replaced by the repo's md5 hash convention: u = (h%P+1)/(P+1),
    clock = -ln(u)/weight, keep the M smallest clocks. Inclusion
    probability scales with weight (here: token count — the "sample
    long documents proportionally" knob), and the draw replays
    identically on both engines because the clock is the integer
    rational floor(1e9·ln((P+1)/(h%P+1)))·1e6 div weight — no float
    division, ties broken by doc_id.

    Two-phase global top-M (domain_cap's pattern): per-salt top-M
    bounds any single sort to a salt group, then the ≤ S·M survivors
    re-rank once — min-K is distributive so this equals the direct
    top-M the oracle states. Zero-token and NULL-id docs are not
    sampleable (weight ≥ 1 gate)."""
    docs = load_table_parallel(spark, "documents", sf_dir)
    w = docs.where(F.col("doc_id").isNotNull()).select(
        "doc_id",
        F.size(tokens("text")).cast("long").alias("weight"),
        (md5_long(F.concat(F.col("doc_id").cast("string"), F.lit(":ws")))
         % HASH_P).alias("hp"),
    ).where(F.col("weight") >= 1)
    e = F.floor(
        F.lit(1e9)
        * F.log(F.lit(float(HASH_P + 1)) / (F.col("hp") + 1).cast("double"))
    ).cast("long")
    keyed = w.select(
        "doc_id", "weight", (e * 1000000).cast("long").alias("__num")
    ).withColumn("k", F.expr("__num div weight")).drop("__num")
    w1 = Window.partitionBy(F.col("doc_id") % _WS_SALTS).orderBy("k", "doc_id")
    p1 = (
        keyed.withColumn("rn1", F.row_number().over(w1))
        .where(F.col("rn1") <= _WS_M)
        .drop("rn1")
    )
    w2 = Window.orderBy("k", "doc_id")
    return (
        p1.withColumn("rank", F.row_number().over(w2).cast("int"))
        .where(F.col("rank") <= _WS_M)
        .select("doc_id", "weight", "k", "rank")
    )


# --- n-gram novelty of the validation split ------------------------------------

from psx_data_pipeline_spark.plans.dedup import _SHINGLES as _DEDUP_SHINGLES  # noqa: E402

# split_assign audits EXACT-duplicate leakage; novelty is its graded
# complement: how much of the validation split's 3-gram surface the
# training split has never seen. Low novelty means validation loss
# measures memorized text; the per-source breakdown shows WHICH
# sources leak phrasing across the hash split. Shingles compare as
# 60-bit md5 hashes (8-byte keys on the wire, never the strings).
NGRAM_NOVELTY_ORACLE = f"""
WITH d AS (
  SELECT doc_id, source, {_SPLIT_SQL} AS split, text
  FROM documents WHERE doc_id IS NOT NULL
),
tr AS (
  SELECT DISTINCT {md5_long_sql('sh')} AS h
  FROM (
    SELECT unnest(list_distinct({_DEDUP_SHINGLES})) AS sh
    FROM d WHERE split = 'train'
  )
),
va AS (
  SELECT DISTINCT source, {md5_long_sql('sh')} AS h
  FROM (
    SELECT source, unnest(list_distinct({_DEDUP_SHINGLES})) AS sh
    FROM d WHERE split = 'val'
  )
)
SELECT va.source,
       CAST(count(*) AS BIGINT) AS n_val_shingles,
       CAST(sum(CASE WHEN tr.h IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       CAST(sum(CASE WHEN tr.h IS NULL THEN 1 ELSE 0 END) * 1000
            // count(*) AS BIGINT) AS novelty_permille
FROM va LEFT JOIN tr ON va.h = tr.h
GROUP BY va.source
"""


@query("ngram_novelty", NGRAM_NOVELTY_ORACLE)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: how many distinct 3-gram shingles the validation
    split contributes and what fraction the training split never
    contains (permille) — the graded leakage audit next to
    split_assign's exact-duplicate one. Same split function, same
    shingle unit as the dedup family.

    Shape: two distinct-shingle-hash reductions (map-side combinable
    on 8-byte keys) and ONE left anti-style hash join between them —
    decontaminate's shape with the benchmark replaced by the train
    split; no strings cross the exchange."""
    from psx_data_pipeline_spark.functions.textfns import word_shingles

    docs = load_table_parallel(spark, "documents", sf_dir).where(
        F.col("doc_id").isNotNull()
    )
    # native-column twin of _SPLIT_SQL (same device as q_split_assign:
    # Spark's parser rejects the oracle's bare VARCHAR cast)
    h = md5_long(
        F.concat(F.col("doc_id").cast("string"), F.lit(":split"))
    ) % 100
    split = (
        F.when(h < 80, "train").when(h < 90, "val").otherwise("test")
    )
    d = docs.select("source", split.alias("split"), "text")
    def sh_hashes(df):
        return df.select(
            "source",
            F.explode(F.array_distinct(word_shingles("text"))).alias("sh"),
        ).select("source", md5_long(F.col("sh")).alias("h"))

    tr = (
        sh_hashes(d.where(F.col("split") == "train"))
        .select("h").distinct()
        .withColumnRenamed("h", "tr_h")
    )
    va = sh_hashes(d.where(F.col("split") == "val")).distinct()
    joined = va.join(tr, va["h"] == tr["tr_h"], "left")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_val_shingles"),
        F.sum(F.when(F.col("tr_h").isNull(), 1).otherwise(0))
        .cast("long").alias("n_novel"),
        F.expr(
            "CAST(sum(CASE WHEN tr_h IS NULL THEN 1 ELSE 0 END) * 1000"
            " div count(1) AS BIGINT)"
        ).alias("novelty_permille"),
    )
