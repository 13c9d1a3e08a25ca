"""CSV source and sink — the exchange format the reference never
needed (its raw zone is NDJSON, S1/S2) but every warehouse user has:
partner drops, spreadsheet exports, legacy extracts.

Same posture as the NDJSON source (sources/json_source.py): EXPLICIT
schema by default (inference is a full pre-scan job at 100 TB — opt-in
only), FAILFAST parsing by default so malformed rows surface at read
time instead of becoming silent nulls; PERMISSIVE mode plus a
``_corrupt_record`` rescue column is the opt-in for quarantine flows.

CSV files are splittable only when uncompressed (or bzip2); a gzip CSV
becomes ONE task regardless of size — write_csv therefore defaults to
uncompressed output and callers who want compression at scale should
land parquet instead (S6) and keep CSV for interchange edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    mode: str = "FAILFAST",
    timestamp_format: str | None = None,
) -> DataFrame:
    """Read CSV with explicit schema (``schema=None`` opts into inference).

    ``mode="PERMISSIVE"`` with a schema that includes
    :data:`CORRUPT_COL` (StringType) routes unparseable lines into that
    column instead of failing the job — the quarantine pattern.
    """
    reader = spark.read.option("header", str(header).lower()).option("mode", mode)
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_csv(
    df: DataFrame, path: str, header: bool = True, mode: str = "overwrite"
) -> None:
    """CSV sink — uncompressed (splittable on read-back), header row
    per part file."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)
