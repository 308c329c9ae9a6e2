from psx_data_pipeline_spark.sources.fixtures import load_table, load_all  # noqa: F401
