"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast of the (small)
query set against the corpus, dot products computed with array
higher-order functions (zip_with + aggregate) entirely JVM-side.

Scale path: random-hyperplane LSH — each vector gets a b-bit sign
signature against deterministic pseudo-random planes; candidates
come from an equi-join on the signature bucket, so the comparison
volume is bucket-local instead of n·m. (An IVF variant would swap
the plane signature for a centroid id; same join shape.)

Determinism for the oracle: each product is quantized to an integer
— floor(x·y·10^s) — and summed as BIGINT, which is exact and
order-independent, then divided back by 10^s in double. floor() on a
double is the same IEEE operation in Spark and DuckDB, so the two
engines agree bit-for-bit for ANY partitioning / aggregation order.
(A decimal(38,12) accumulator was tried first: the double→decimal
cast rounds differently across engines at the last digit.)
Hyperplane components are INTEGER constants generated Python-side
(LCG walk, no RNG state) and inlined into both the Spark plan (array
literal) and the oracle SQL (VALUES table), so the two engines agree
by construction — no per-row hashing at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from psx_data_pipeline_spark.functions.hashing import HASH_P

# quantization scale for embedding dots: values are O(1), 64 terms of
# |x·y|·1e12 stay far below bigint range
_SCALE = 1e12


def _qdot(a: Column, b: Column, scale: float = _SCALE) -> Column:
    """Quantized dot product: Σ floor(aᵢ·bᵢ·scale) as BIGINT (exact)."""
    prods = F.zip_with(a, b, lambda x, y: F.floor(x * y * F.lit(scale)))
    return F.aggregate(
        prods, F.lit(0).cast("long"), lambda acc, p: acc + p
    )


def _dot(a: Column, b: Column) -> Column:
    """Deterministic dot product of two double arrays → double."""
    return _qdot(a, b).cast("double") / F.lit(_SCALE)


def dot_sql(a: str, b: str) -> str:
    """DuckDB twin of _dot() for two list-typed expressions."""
    return (
        "(CAST((SELECT SUM(CAST(floor(CAST(x.a AS DOUBLE) * CAST(x.b AS DOUBLE)"
        f" * 1e12) AS BIGINT)) FROM (SELECT UNNEST({a}) AS a, UNNEST({b}) AS b) x)"
        " AS DOUBLE) / 1e12)"
    )


def qdot(a: Column, b: Column) -> Column:
    """Public quantized dot product (BIGINT, exact, order-free) —
    the integer form PQ codes and ADC lookup tables accumulate in."""
    return _qdot(a, b)


def qdot_unrolled(a: Column, b: Column, dim: int) -> Column:
    """qdot() for FIXED-dimension arrays, unrolled: the identical
    per-element floor(aᵢ·bᵢ·1e12) terms summed as a plain expression
    chain instead of interpreted zip_with/aggregate lambdas.
    Higher-order-function lambdas run interpreted (no whole-stage
    codegen), which dominates hot encode/scan paths that evaluate
    millions of small dots (PQ encoding is |corpus|·M·K of them);
    the unrolled chain stays inside codegen at ~10× the throughput.
    Semantics are bit-identical: same double·double multiply, same
    (x·y)·scale association, same per-element floor→BIGINT, integer
    addition (associative, exact), and a NULL element poisons the
    sum to NULL exactly as the fold does. Callers must guarantee
    size(a) = size(b) = dim exactly: a SHORTER array yields NULL
    (out-of-range getItem; qdot() sums the zip_with-padded NULLs to
    NULL too, so the forms agree), but a LONGER array silently
    DIVERGES — this chain sums only the first dim elements while
    qdot()'s fold sums them all and returns a different non-NULL
    value. Every call site gates its input on the exact-dim
    predicate (indexable_embedding / the PQ subspace slicer), which
    is why no runtime size() guard is paid per row here."""
    terms = [
        F.floor(a[i] * b[i] * F.lit(_SCALE)) for i in range(dim)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def qdot_sql(a: str, b: str) -> str:
    """DuckDB twin of qdot(): Σ floor(aᵢ·bᵢ·1e12) as BIGINT.

    The product is taken in SINGLE precision (FLOAT·FLOAT), because
    that is what Spark's Multiply does on two FloatType columns —
    zip_with over array<float> multiplies in float32 and only then
    widens for the ·1e12 scale. A double-precision product here
    diverges from Spark by a few hundred integer units per 16-term
    sum (measured), which is invisible after dot_sql's /1e12 rounding
    but fatal when the raw integer sum IS the compared value (PQ
    codes / ADC scores)."""
    return (
        "(SELECT SUM(CAST(floor(CAST(CAST(x.a AS FLOAT) * CAST(x.b AS FLOAT)"
        f" AS DOUBLE) * 1e12) AS BIGINT))"
        f" FROM (SELECT UNNEST({a}) AS a, UNNEST({b}) AS b) x)"
    )


def qdotd_sql(a: str, b: str) -> str:
    """qdot_sql for DOUBLE-typed lists (e.g. exactly-normalized
    vectors): the product is a double·double multiply, which is what
    Spark's Multiply does on two DoubleType columns — use qdot_sql
    when the inputs are float32, this when they are float64; mixing
    the two diverges at the floor boundary."""
    return (
        "(SELECT SUM(CAST(floor(CAST(x.a AS DOUBLE) * CAST(x.b AS DOUBLE)"
        f" * 1e12) AS BIGINT))"
        f" FROM (SELECT UNNEST({a}) AS a, UNNEST({b}) AS b) x)"
    )


def _norm2(a: Column) -> Column:
    return _dot(a, a)


# Validity contract for vectors entering the similarity machinery.
# |component| ≤ _EMB_BOUND keeps every quantized product
# floor(x·y·1e12) and its 64-term sum far inside int64 (100·100·1e12
# ·64 ≈ 6.4e17 < 2^63); NaN/±Inf components and wrong-dimension /
# NULL vectors are excluded outright. Real embedding corpora contain
# all of these (failed encoders emit zero or NaN vectors) — without
# the gate a single such row crashes the whole job under ANSI
# arithmetic (found by tools/hostile_events_probe.py).
_EMB_BOUND = 100.0


def valid_embedding(vec: Column | str, dim: int, bound: float = _EMB_BOUND) -> Column:
    """Non-NULL, exactly ``dim`` components, all non-NULL, finite,
    and bounded.

    Expressed with JVM-native collection ops, not higher-order
    lambdas — an EXISTS(λ) gate costs ~dim interpreted invocations
    per row on the 100 TB scan. array_compact counts NULL components
    (the engines disagree on NULL lambda results, so NULLs must be
    matched structurally); Spark orders NaN above every value, so a
    NaN anywhere surfaces as array_max (pinned by
    tests/test_hostile_events.py and the hostile probe); +Inf trips
    the max bound, -Inf the min bound."""
    v = F.col(vec) if isinstance(vec, str) else vec
    return (
        v.isNotNull()
        & (F.size(v) == dim)
        & (F.size(F.array_compact(v)) == dim)
        & ~F.isnan(F.array_max(v))
        & (F.array_max(v) <= bound)
        & (F.array_min(v) >= -bound)
    )


def indexable_embedding(vec: Column | str, dim: int, bound: float = _EMB_BOUND) -> Column:
    """valid_embedding AND quantized norm > 0 — the divisor cosine
    actually uses. "Some component nonzero" is NOT enough: the
    geometry is the quantized Σ floor(xᵢ²·1e12), so a denormal-tiny
    vector (every |x| < 1e-6) is nonzero in floats yet has norm2
    EXACTLY 0 in both engines — one such row crashed the whole ANSI
    plan with DIVIDE_BY_ZERO (round-10 hostile-embeddings find).

    Exact and lambda-free (an EXISTS(λ) gate costs ~dim interpreted
    invocations per row on the 100 TB scan): every quantized term is
    ≥ 0, so the sum is > 0 iff the LARGEST term is ≥ 1, and since
    IEEE multiplication is monotone the largest term comes from the
    extreme component m = max(|array_max|, |array_min|) — the gate
    condition floor(m·m·1e12) ≥ 1 is bitwise the same arithmetic the
    quantizer applies to that component, so gate ⟺ divisor > 0 with
    no floating-point boundary mismatch."""
    v = F.col(vec) if isinstance(vec, str) else vec
    m = F.greatest(
        F.abs(F.array_max(v).cast("double")),
        F.abs(F.array_min(v).cast("double")),
    )
    return valid_embedding(v, dim, bound) & (
        F.floor(m * m * F.lit(_SCALE)) >= 1
    )


def valid_embedding_sql(e: str, dim: int, bound: float = _EMB_BOUND) -> str:
    """DuckDB twin of valid_embedding."""
    return (
        f"({e} IS NOT NULL AND len({e}) = {dim}"
        f" AND len(list_filter({e}, x -> x IS NULL"
        f" OR isnan(CAST(x AS DOUBLE))"
        f" OR abs(CAST(x AS DOUBLE)) > {bound})) = 0)"
    )


def indexable_embedding_sql(e: str, dim: int, bound: float = _EMB_BOUND) -> str:
    """DuckDB twin of indexable_embedding (same quantized-norm gate;
    see the engine docstring for the exactness argument)."""
    m = (
        f"GREATEST(abs(CAST(list_max({e}) AS DOUBLE)),"
        f" abs(CAST(list_min({e}) AS DOUBLE)))"
    )
    return (
        f"({valid_embedding_sql(e, dim, bound)}"
        f" AND floor({m} * {m} * 1e12) >= 1)"
    )


def with_unit_geometry(df: DataFrame, vec_col: str) -> DataFrame:
    """Attach vecd (double array) and norm2 — computed once per vector."""
    vecd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.withColumn("vecd", vecd).withColumn("norm2", _norm2(F.col("vecd")))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Brute-force exact top-k neighbors for each query vector.

    queries is broadcast (the typical ANN-serving shape: few probes
    against a huge corpus); ranking tie-breaks on neighbor id so the
    result is unique. Returns (query_id, neighbor_id, cosine, rank).
    """
    c = with_unit_geometry(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("vecd").alias("cvec"),
        F.col("norm2").alias("cn2"),
    )
    q = with_unit_geometry(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("vecd").alias("qvec"),
        F.col("norm2").alias("qn2"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            _dot(F.col("qvec"), F.col("cvec"))
            / (F.sqrt("qn2") * F.sqrt("cn2")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplane_planes(bits: int, dim: int) -> list[list[int]]:
    """bits × dim integer plane matrix from a fixed LCG walk.

    Component m = 2·x − P with x ∈ [0, P): odd, never zero, symmetric
    around 0 — the sign of Σ vec[d]·m(j,d) equals the sign of the
    continuous hyperplane dot in [−0.5, 0.5). Pure constants: both
    engines inline them, so there is no per-row hashing (round-1 cost
    bug) and no cross-engine RNG to reconcile.
    """
    planes: list[list[int]] = []
    x = 48_271
    for _ in range(bits):
        row = []
        for _ in range(dim):
            x = (x * 69_069 + 1) % HASH_P
            row.append(2 * x - HASH_P)
        planes.append(row)
    return planes


# plane components are O(2^31), so products need a smaller scale to
# keep 64-term sums inside bigint: |x·m|·1e6 ≈ 2e15 · 64 ≈ 1.3e17
_PLANE_SCALE = 1e6


def hyperplane_signature(vec: Column, dim: int, bits: int) -> Column:
    """b-bit sign signature: bit j set iff dot(vec, plane_j) > 0.

    Plane dots use the quantized-integer sum (order-independent, so
    the sign decision is identical in both engines); the bit weights
    are plain integer literals (no shiftleft-by-column, which
    PySpark's F.shiftleft cannot express).
    """
    planes = hyperplane_planes(bits, dim)

    def plane_dot(row: list[int]) -> Column:
        plane = F.array(*[F.lit(float(m)) for m in row])
        return _qdot(vec, plane, _PLANE_SCALE)

    sig = F.lit(0).cast("long")
    for j, row in enumerate(planes):
        sig = sig + F.when(plane_dot(row) > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def hyperplane_signature_sql(
    vec_expr: str, id_expr: str, table: str, bits: int, dim: int
) -> str:
    """DuckDB twin: a VALUES plane table joined per (vector, bit).

    Returns a subquery SELECTing (sig_id, sig) for every row of
    ``table``. The oracle is allowed to be slow — bits × dim rows per
    vector is fine at sf0.01.
    """
    planes = hyperplane_planes(bits, dim)
    values = ",".join(
        f"({j},{d},{m})" for j, row in enumerate(planes) for d, m in enumerate(row)
    )
    return f"""
    SELECT sig_id, CAST(SUM(CASE WHEN dot > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS sig
    FROM (
      SELECT t.{id_expr} AS sig_id, p.j,
             SUM(CAST(floor(CAST(t.{vec_expr}[p.d + 1] AS DOUBLE)
                 * CAST(p.m AS DOUBLE) * 1e6) AS BIGINT)) AS dot
      FROM {table} t
      CROSS JOIN (SELECT * FROM (VALUES {values}) AS v(j, d, m)) p
      GROUP BY 1, 2
    )
    GROUP BY sig_id
    """


def lsh_bucketed_neighbors(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    bits: int = 8,
    threshold: float = 0.9,
) -> DataFrame:
    """Bucketed near-neighbor pairs: vectors sharing a full signature
    bucket are compared exactly; output pairs with cosine ≥ threshold.

    The equi-join on the signature replaces the n² comparison — at
    1000 executors each bucket is one shuffle partition's worth of
    local work.
    """
    sig = with_unit_geometry(corpus, vec_col).select(
        F.col(id_col).alias("id"),
        "vecd",
        "norm2",
        hyperplane_signature(F.col("vecd"), dim, bits).alias("sig"),
    )
    a = sig.select(
        F.col("id").alias("id_a"),
        F.col("vecd").alias("va"),
        F.col("norm2").alias("na"),
        "sig",
    )
    b = sig.select(
        F.col("id").alias("id_b"),
        F.col("vecd").alias("vb"),
        F.col("norm2").alias("nb"),
        "sig",
    )
    return (
        a.join(b, "sig")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            _dot(F.col("va"), F.col("vb")) / (F.sqrt("na") * F.sqrt("nb")),
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# --- IVF (inverted-file) ANN -------------------------------------------------

def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    vec_col: str,
    id_col: str,
    cid_col: str = "cid",
    nprobe: int = 1,
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroids by
    cosine (centroids broadcast; rank ties break on centroid id).
    Returns the corpus columns + (cid, cell_rank)."""
    c = with_unit_geometry(corpus, vec_col).select(
        F.col(id_col).alias("id"), F.col("vecd"), F.col("norm2")
    )
    cent = with_unit_geometry(centroids, vec_col).select(
        F.col(cid_col).alias("cid"),
        F.col("vecd").alias("cvec"),
        F.col("norm2").alias("cn2"),
    )
    scored = c.join(F.broadcast(cent)).withColumn(
        "ccos",
        _dot(F.col("vecd"), F.col("cvec")) / (F.sqrt("norm2") * F.sqrt("cn2")),
    )
    w = Window.partitionBy("id").orderBy(F.desc("ccos"), F.asc("cid"))
    return (
        scored.withColumn("cell_rank", F.row_number().over(w))
        .where(F.col("cell_rank") <= nprobe)
        .select("id", "vecd", "norm2", "cid", "cell_rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    vec_col: str,
    id_col: str,
    cid_col: str = "cid",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their nearest
    centroid's cell (inverted list); each query probes its ``nprobe``
    nearest cells and ranks only those cells' vectors by exact cosine.

    The join shape is the scale story: comparisons are
    |query| × (corpus/cells × nprobe) instead of |query| × |corpus|,
    and the cell equi-join shuffles on cid — bucket-local work, same
    as the LSH path but with data-adaptive regions. Centroids here
    are a deterministic corpus subset (training is an offline
    job; the serving-time plan is identical for trained centroids).
    Returns (query_id, neighbor_id, cosine, rank).
    """
    cells = ivf_assign(corpus, centroids, vec_col, id_col, cid_col, nprobe=1)
    probes = ivf_assign(queries, centroids, vec_col, id_col, cid_col, nprobe=nprobe)
    q = probes.select(
        F.col("id").alias("query_id"),
        F.col("vecd").alias("qvec"),
        F.col("norm2").alias("qn2"),
        "cid",
    )
    cand = (
        q.join(cells.select(
            F.col("id").alias("neighbor_id"),
            F.col("vecd").alias("cvec"),
            F.col("norm2").alias("cn2"),
            "cid",
        ), "cid")
        .where(F.col("query_id") != F.col("neighbor_id"))
        # no pair dedup needed: each corpus vector lives in exactly
        # one cell (nprobe=1 assignment), so a (query, neighbor) pair
        # can only arise through that one cell
        .select("query_id", "neighbor_id", "qvec", "qn2", "cvec", "cn2")
        .withColumn(
            "cosine",
            _dot(F.col("qvec"), F.col("cvec")) / (F.sqrt("qn2") * F.sqrt("cn2")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
