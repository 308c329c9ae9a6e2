"""Cross-engine deterministic hashing primitives.

Spark's native hash functions (xxhash64, murmur3) have no DuckDB
equivalent, so every hash the oracle must reproduce is built from
md5 — identical in both engines — reduced to an integer via hex
parsing. 15 hex chars = 60 bits, always non-negative, fits bigint.

Used by exact dedup (content fingerprints), MinHash (shingle
hashing + affine permutations), SimHash (token bit sampling), and
LSH (band signatures). At 100 TB these are embarrassingly parallel
scan-side expressions — no shuffle, whole-stage codegen'd JVM md5.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne-ish prime below 2^31: keeps (a*h + b) % P inside 62 bits
# so the arithmetic never overflows bigint in either engine
# (DuckDB raises on bigint overflow; Java would silently wrap).
HASH_P = 2_147_483_647


def md5_long(col: Column | str) -> Column:
    """60-bit non-negative integer hash of a string column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """DuckDB twin of md5_long()."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def affine_hash(h: Column, a: Column, b: Column) -> Column:
    """(a*h' + b) mod P with h' = h mod P — the MinHash permutation family."""
    return (a * (h % HASH_P) + b) % HASH_P


def affine_hash_sql(h: str, a: str, b: str) -> str:
    return f"(({a}) * (({h}) % {HASH_P}) + ({b})) % {HASH_P}"


def minhash_perms(k: int) -> list[tuple[int, int, int]]:
    """Deterministic (i, a, b) coefficients for k MinHash permutations.

    Derived from a fixed linear-congruential walk so Spark and the
    oracle (which inlines them as a VALUES table) agree by
    construction.
    """
    out = []
    a, b = 1_103_515_245, 12_345
    for i in range(k):
        a = (a * 69_069 + 1) % HASH_P
        b = (b * 1_103_515_245 + 12_345) % HASH_P
        out.append((i, a | 1, b))  # odd multiplier
    return out
