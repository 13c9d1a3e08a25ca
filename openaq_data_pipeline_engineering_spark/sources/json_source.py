"""NDJSON raw-zone source and sinks (reference S1/S2/S7/S9).

The reference reads the raw zone with Glue's dynamic frame + schema
inference (process_openaq_raw.py:94-100) and writes NDJSON with a
hand-rolled serializer (s3_uploader.py:57-150). Here both directions are
native Spark: ``spark.read.json`` with an EXPLICIT schema (inference is
opt-in) and ``DataFrameWriter.json``.

Scale: an explicit schema avoids the full inference pre-scan (at 100 TB
that pre-scan is a job of its own); `recursiveFileLookup` handles the
``aq_raw/YYYY/MM/DD/HH/`` layout without listing games. Filters on
derived partition columns still prune at file level when the raw zone is
registered with a partition spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from openaq_data_pipeline_engineering_spark.schemas import MEASUREMENT_SCHEMA


def read_ndjson(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = MEASUREMENT_SCHEMA,
    recursive: bool = True,
) -> DataFrame:
    """Read an NDJSON raw zone (S1/S2). ``schema=None`` opts into inference."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path, recursiveFileLookup=recursive)


def write_ndjson(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """NDJSON sink (S7) — one JSON object per line, Spark-readable back."""
    df.write.mode(mode).json(path)


def write_wrapped_archive(
    df: DataFrame, path: str, meta: dict | None = None, mode: str = "overwrite"
) -> None:
    """Wrapped-JSON archive sink (S9, pipelines/openaq_pipeline.py:148-165):
    each line ``{"meta": {...}, "results": [record]}``.

    Kept line-oriented (meta replicated per line, one record per results
    array) so the archive stays splittable — the reference's single giant
    JSON document would not be parallel-readable at scale. Batch-level
    counts belong in ``meta`` (computed once by the caller), not in a
    global window that would serialize the whole write through one task.
    """
    meta_cols = [F.lit(v).alias(k) for k, v in (meta or {}).items()]
    wrapped = df.select(
        F.struct(*meta_cols).alias("meta") if meta_cols else F.struct(F.lit("v1").alias("schema")).alias("meta"),
        F.array(F.struct(*[F.col(c) for c in df.columns])).alias("results"),
    )
    wrapped.write.mode(mode).json(path)
