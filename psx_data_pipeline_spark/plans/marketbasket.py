"""Bipartite co-occurrence similarity (item-item collaborative
filtering): which catalogue items the same actors touch — the
classic market-basket / "users who viewed X" neighbor list, and the
co-click graph a recommendation or data-mixing pipeline feeds on.
Complements the content-side neighbor operators (MinHash/SimHash/
ANN) with a BEHAVIORAL similarity that needs no embeddings.

Items derive deterministically from events (item = event_id mod the
catalogue size); similarity is squared cosine over binary user
vectors, kept exact in integer micro-units:
cos2 = c_ij^2 / (c_i * c_j), scaled by 1e6 and floored.

100 TB shape: baskets are DISTINCT (user, item) — one shuffle on the
user key; the pair self-join co-locates on that same key, so its
fanout is per-user basket-size bounded (cap the basket like every
production co-occ job, here bounded by events-per-user); item
degrees are a catalogue-bounded broadcast; the neighbor window is a
rank<=k group-limit over per-item CANDIDATE rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_table

_N_CATALOG = 200
_TOP_K = 5

_BASKET_SQL = f"""
  SELECT DISTINCT user_id AS u, event_id % {_N_CATALOG} AS item
  FROM events WHERE user_id IS NOT NULL AND event_id IS NOT NULL
"""

ITEM_COOCCURRENCE_ORACLE = f"""
WITH basket AS ({_BASKET_SQL}),
pairs AS (
  SELECT a.item AS i1, b.item AS i2, CAST(count(*) AS BIGINT) AS co_users
  FROM basket a JOIN basket b ON a.u = b.u AND a.item < b.item
  GROUP BY a.item, b.item
),
degrees AS (
  SELECT item, CAST(count(*) AS BIGINT) AS deg FROM basket GROUP BY item
),
sym AS (
  SELECT i1 AS item, i2 AS neighbor, co_users FROM pairs
  UNION ALL
  SELECT i2, i1, co_users FROM pairs
),
scored AS (
  SELECT s.item, s.neighbor, s.co_users,
         CAST(s.co_users * s.co_users * 1000000
              // (d1.deg * d2.deg) AS BIGINT) AS cos2_micro
  FROM sym s
  JOIN degrees d1 ON d1.item = s.item
  JOIN degrees d2 ON d2.item = s.neighbor
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY item ORDER BY cos2_micro DESC, neighbor) AS rank
  FROM scored
)
SELECT item, neighbor, co_users, cos2_micro, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {_TOP_K}
"""


@query("item_cooccurrence", ITEM_COOCCURRENCE_ORACLE)
def q_item_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k behavioral neighbors per catalogue item: distinct-user
    co-occurrence counts scored as exact squared cosine over binary
    user vectors (micro-units; c_ij <= c_i, c_j keeps the product in
    int64 far beyond this catalogue). Ties break on the neighbor id.

    The pair join co-locates both sides on the user key (one
    partitioning reused); degrees are a catalogue-bounded broadcast;
    the literal rank bound unlocks WindowGroupLimit so only k rows
    per item survive the rank exchange."""
    ev = load_table(spark, "events", sf_dir).where(
        F.col("user_id").isNotNull() & F.col("event_id").isNotNull()
    )
    basket = ev.select(
        F.col("user_id").alias("u"),
        (F.col("event_id") % _N_CATALOG).alias("item"),
    ).distinct()
    a = basket.alias("a")
    b = basket.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.u") == F.col("b.u"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("i1"), F.col("b.item").alias("i2")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("co_users"))
    )
    degrees = basket.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    sym = pairs.select(
        F.col("i1").alias("item"), F.col("i2").alias("neighbor"), "co_users"
    ).unionByName(
        pairs.select(
            F.col("i2").alias("item"), F.col("i1").alias("neighbor"),
            "co_users",
        )
    )
    d1 = F.broadcast(degrees.select(
        F.col("item").alias("d1_item"), F.col("deg").alias("d1_deg")
    ))
    d2 = F.broadcast(degrees.select(
        F.col("item").alias("d2_item"), F.col("deg").alias("d2_deg")
    ))
    scored = (
        sym.join(d1, sym["item"] == d1["d1_item"])
        .join(d2, sym["neighbor"] == d2["d2_item"])
        .select(
            "item", "neighbor", "co_users",
            F.expr(
                "CAST(co_users * co_users * 1000000"
                " div (d1_deg * d2_deg) AS BIGINT)"
            ).alias("cos2_micro"),
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.desc("cos2_micro"), F.asc("neighbor")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _TOP_K)
        .select(
            "item", "neighbor", "co_users", "cos2_micro",
            F.col("rank").cast("long").alias("rank"),
        )
    )
