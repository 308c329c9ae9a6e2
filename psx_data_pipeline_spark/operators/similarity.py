"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast of the (small)
query set against the corpus, dot products computed with array
higher-order functions (zip_with + aggregate) entirely JVM-side.

Scale path: random-hyperplane LSH — each vector gets a b-bit sign
signature against deterministic pseudo-random planes; candidates
come from an equi-join on the signature bucket, so the comparison
volume is bucket-local instead of n·m. (An IVF variant would swap
the plane signature for a centroid id; same join shape.)

Determinism for the oracle: dot products and norms accumulate in
exact decimal (order-independent), then finish in double — DuckDB
reproduces the same bits via UNNEST + SUM(CAST(...)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from psx_data_pipeline_spark.functions.hashing import HASH_P, md5_long

_DEC = "decimal(38,12)"


def _dot(a: Column, b: Column) -> Column:
    """Exact-decimal dot product of two double arrays → double."""
    prods = F.zip_with(a, b, lambda x, y: (x * y).cast(_DEC))
    return F.aggregate(prods, F.lit(0).cast(_DEC), lambda acc, p: acc + p).cast(
        "double"
    )


def _norm2(a: Column) -> Column:
    return _dot(a, a)


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


def hyperplane_signature(vec: Column, dim: int, bits: int) -> Column:
    """b-bit sign signature against deterministic pseudo-planes.

    Plane component p(j,d) is derived from md5 of "j:d" mapped to
    [-0.5, 0.5) — reproducible in SQL, no RNG state. The signature is
    sum over j of (dot(vec, plane_j) > 0) << j.
    """
    def plane_component(j: Column, d: Column) -> Column:
        h = md5_long(F.concat_ws(":", j.cast("string"), d.cast("string")))
        return (h % F.lit(HASH_P)).cast("double") / F.lit(float(HASH_P)) - 0.5

    def plane_dot(j: Column) -> Column:
        # exact-decimal accumulation so an SQL oracle (unnest + SUM)
        # reproduces the same sign bits regardless of order
        idx = F.sequence(F.lit(0), F.lit(dim - 1))
        return F.aggregate(
            idx,
            F.lit(0).cast(_DEC),
            lambda acc, d: acc
            + (F.element_at(vec, d + 1) * plane_component(j, d)).cast(_DEC),
        ).cast("double")

    bit_seq = F.sequence(F.lit(0), F.lit(bits - 1))
    return F.aggregate(
        bit_seq,
        F.lit(0).cast("long"),
        lambda acc, j: acc
        + F.when(plane_dot(j) > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(
            F.lit(0).cast("long")
        ),
    )


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
