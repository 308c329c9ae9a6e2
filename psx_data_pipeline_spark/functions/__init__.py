from psx_data_pipeline_spark.functions.numeric import dsum, davg  # noqa: F401
