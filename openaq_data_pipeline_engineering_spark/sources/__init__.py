from openaq_data_pipeline_engineering_spark.sources.star import STAR_TABLES, load_star, load_table

__all__ = ["STAR_TABLES", "load_star", "load_table"]
