from openaq_data_pipeline_engineering_spark.streaming.ingest import incremental_ingest, stream_dedup

__all__ = ["incremental_ingest", "stream_dedup"]
