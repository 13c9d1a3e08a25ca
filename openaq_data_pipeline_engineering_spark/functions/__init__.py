from openaq_data_pipeline_engineering_spark.functions import text, vectors

__all__ = ["text", "vectors"]
