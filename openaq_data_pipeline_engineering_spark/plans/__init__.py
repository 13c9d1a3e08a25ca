from openaq_data_pipeline_engineering_spark.plans.mart import MartConfig, build_mart
from openaq_data_pipeline_engineering_spark.plans.registry import QUERIES, Query, get_queries, get_oracles

__all__ = ["MartConfig", "build_mart", "QUERIES", "Query", "get_queries", "get_oracles"]
