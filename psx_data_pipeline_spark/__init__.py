"""psx_data_pipeline_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference pipeline
(uzairnz/psx-data-pipeline, surveyed in SURVEY.md) as idiomatic
Spark DataFrame / SQL operators, plus the large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) the reference's domain implies at
100 TB scale.

Layout:
  session    — SparkSession factory tuned for local[32] testing and
               cluster-scale defaults (AQE, Arrow, UTC).
  schemas    — explicit StructTypes for every table (SURVEY.md §1.2).
  sources/   — fixture/connector readers (SURVEY.md §2 S1-S10).
  operators/ — relational core: diff, merge, dedup, similarity,
               analytics, incremental (SURVEY.md §2 R1-R12 + north star).
  functions/ — scalar/text/date/vector expression builders (F1-F14).
  plans/     — the query registry consumed by __spark_entry__.py:
               each named query with its DuckDB oracle SQL.
  streaming/ — Structured Streaming analogues (watermark windows,
               Trigger.AvailableNow incremental append).
"""

__version__ = "0.1.0"
