"""Single-slice local DataFrames for tiny driver-built row sets.

``spark.createDataFrame(rows, schema)`` parallelizes the rows across
``defaultParallelism`` slices (32 on the local bench profile), so a
1-row metrics frame becomes a 32-partition RDD with 31 empty
partitions. Downstream ``.first()`` then pays Spark's take-escalation
(scan 1 partition, then 4, then 16, ...) — measured 0.71 s and 4 jobs
for one metrics row vs 0.19 s and 1 job on a 1-slice frame; every
``count()``/``collect()`` likewise schedules 32 tasks where 1 suffices.

Every statement-metrics frame (OPTIMIZE/VACUUM/DESCRIBE/DML rows) and
in-process fixture seed is driver-built and tiny by construction, so
they route through :func:`local_rows` — content and schema semantics
are identical to ``createDataFrame`` (same row verification path);
only the slice count changes. Real data NEVER goes through here: table
reads are parquet scans and keep their scan-split parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_rows(spark: SparkSession, rows, schema) -> DataFrame:
    """``createDataFrame`` pinned to ONE slice (tiny row sets only)."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(list(rows), numSlices=1), schema
    )
