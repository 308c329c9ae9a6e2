"""SCD-1 conditional merge (reference parity).

Reference: the per-row update loop at
reference update_ticker_info.py:83-211 — look up fresh details per
key; update each field only when the new value is "better" (not a
sentinel, not equal to the old). Re-expressed as ONE left join plus
per-field ``when`` chains; null-safe (sentinels become NULLs at
ingest, SURVEY.md §7.4).

Scale notes: updates are usually ≪ base, so the join side is
broadcast; otherwise it's a single shuffle on the key. This is the
batch-native form of Delta's ``MERGE WHEN MATCHED THEN UPDATE``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd1_merge(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    fields: list[str],
    broadcast_updates: bool = True,
) -> DataFrame:
    """Per-field conditional update: take updates.f when it is non-null
    and differs from base.f (null-safely), else keep base.f.

    Mirrors the update predicates at reference
    update_ticker_info.py:170-197 with sentinels mapped to NULL.
    Adds ``<f>_updated`` flags so the caller can compute the
    reference's update statistics (update_ticker_info.py:98-105)
    in the same pass.
    """
    upd = updates.select(
        F.col(key), *[F.col(f).alias(f"__new_{f}") for f in fields]
    )
    if broadcast_updates:
        upd = F.broadcast(upd)
    joined = base.join(upd, key, "left")
    out = joined
    for f in fields:
        new = F.col(f"__new_{f}")
        better = new.isNotNull() & ~new.eqNullSafe(F.col(f))
        out = out.withColumn(f"{f}_updated", better).withColumn(
            f, F.when(better, new).otherwise(F.col(f))
        )
    return out.drop(*[f"__new_{f}" for f in fields])
