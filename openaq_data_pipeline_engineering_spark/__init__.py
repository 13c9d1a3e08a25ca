"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference pipeline (stevetran77/OpenAQ-Data-Pipeline-Engineering).

Brand-new Spark-first design: DataFrame/SQL logical plans optimized by
Catalyst, columnar Parquet storage, broadcast-join enrichment, and
LLM-training-data extensions (dedup / similarity / text / multimodal)
designed for 100 TB scale.

Layout
------
- ``engine``     : SparkSession factory + Engine facade (UTC, AQE on).
- ``sources``    : parquet/NDJSON/API-record readers with explicit schemas.
- ``operators``  : DataFrame -> DataFrame ops mirroring SURVEY.md §2.
- ``functions``  : scalar/column expression helpers (no UDFs in hot paths).
- ``plans``      : composed pipelines (mart) + the declared query registry.
- ``streaming``  : incremental ingest (Structured Streaming file source).
"""

from openaq_data_pipeline_engineering_spark.engine import Engine, get_spark
from openaq_data_pipeline_engineering_spark.io import load_versioned, save_versioned

__all__ = ["Engine", "get_spark", "load_versioned", "save_versioned"]
__version__ = "0.1.0"
