"""Weak-supervision label aggregation (Snorkel-style): resolve many
noisy annotator votes per item into one label by reliability-weighted
majority, with the margin that downstream curricula use as a
confidence score. The missing piece between the repo's quality
scores (plans/text.py) and its sampling/mixing operators — labeled
training data at 100 TB is aggregated, not hand-assigned.

Votes derive deterministically from events: item = event_id mod the
catalogue size, annotator = user_id, label = event_type, annotator
weight = 1 + (user_id mod 3) (three reliability tiers). Ties break
lexicographically on the label so both engines elect the same
winner.

100 TB shape: one (item, label) aggregate (map-side combinable),
then windows over the per-item LABEL rows — bounded by the label
vocabulary, never by the vote count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from psx_data_pipeline_spark.plans.registry import query
from psx_data_pipeline_spark.sources.fixtures import load_table

_N_ITEMS = 500

_VOTES_SQL = f"""
  SELECT event_id % {_N_ITEMS} AS item,
         event_type AS label,
         CAST(1 + user_id % 3 AS BIGINT) AS w
  FROM events
  WHERE event_id IS NOT NULL AND user_id IS NOT NULL
        AND event_type IS NOT NULL
"""

LABEL_VOTE_ORACLE = f"""
WITH votes AS ({_VOTES_SQL}),
tally AS (
  SELECT item, label,
         CAST(sum(w) AS BIGINT) AS votes_w,
         CAST(count(*) AS BIGINT) AS n_votes
  FROM votes GROUP BY item, label
),
ranked AS (
  SELECT item, label, votes_w, n_votes,
         row_number() OVER (
           PARTITION BY item ORDER BY votes_w DESC, label) AS rn,
         lead(votes_w) OVER (
           PARTITION BY item ORDER BY votes_w DESC, label) AS runner_w,
         CAST(count(*) OVER (PARTITION BY item) AS BIGINT) AS n_labels,
         CAST(sum(n_votes) OVER (PARTITION BY item) AS BIGINT)
           AS total_votes
  FROM tally
)
SELECT item, label AS winner, votes_w, n_labels, total_votes,
       CAST(votes_w - COALESCE(runner_w, 0) AS BIGINT) AS margin
FROM ranked WHERE rn = 1
"""


def elect(tally: DataFrame) -> DataFrame:
    """Winner election over a (item, label, votes_w, n_votes) tally:
    weighted argmax with lexicographic tie-break, margin vs the next
    row, label diversity and vote totals. Shared by the batch query
    below and the streaming twin (plans/stream.q_stream_label_vote).
    Windows run over label-vocabulary-bounded per-item rows."""
    w_rank = Window.partitionBy("item").orderBy(
        F.desc("votes_w"), F.asc("label")
    )
    w_item = Window.partitionBy("item")
    ranked = tally.select(
        "item", "label", "votes_w", "n_votes",
        F.row_number().over(w_rank).alias("rn"),
        F.lead("votes_w").over(w_rank).alias("runner_w"),
        F.count(F.lit(1)).over(w_item).cast("long").alias("n_labels"),
        F.sum("n_votes").over(w_item).cast("long").alias("total_votes"),
    )
    return ranked.where(F.col("rn") == 1).select(
        "item", F.col("label").alias("winner"), "votes_w",
        "n_labels", "total_votes",
        (F.col("votes_w") - F.coalesce(F.col("runner_w"), F.lit(0)))
        .cast("long").alias("margin"),
    )


@query("label_vote", LABEL_VOTE_ORACLE)
def q_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per item: the reliability-weighted majority label, the label
    diversity, and the winner-minus-runner-up margin (0 margin =
    a coin-flip item a curriculum should hold out). Votes missing an
    annotator or a label are abstentions and carry no weight.

    Determinism: the (votes desc, label asc) ordering is a total
    order over the tally rows, so row_number and lead() are
    cross-engine stable even on fully tied tallies."""
    ev = load_table(spark, "events", sf_dir).where(
        F.col("event_id").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    votes = ev.select(
        (F.col("event_id") % _N_ITEMS).alias("item"),
        F.col("event_type").alias("label"),
        (1 + F.col("user_id") % 3).cast("long").alias("w"),
    )
    tally = votes.groupBy("item", "label").agg(
        F.sum("w").cast("long").alias("votes_w"),
        F.count(F.lit(1)).cast("long").alias("n_votes"),
    )
    return elect(tally)
