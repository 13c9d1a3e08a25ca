"""Datetime parsing and partition-column derivation.

Reference semantics:
- P1: ISO-8601 (+offset) string → UTC timestamp
  (glue_jobs/process_openaq_raw.py:118-121).
- P2: year / zero-padded month & day partition columns
  (glue_jobs/process_openaq_raw.py:124-127).
- P5: drop rows whose datetime fails to parse
  (etls/openaq_etl.py:293-297 — pandas ``errors='coerce'`` + dropna).

All pure Column expressions → whole-stage codegen, pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_datetime(df: DataFrame, col: str = "datetime", output_col: str | None = None) -> DataFrame:
    """Cast an ISO-8601 string column (with tz offsets) to a UTC timestamp.

    ``try_cast`` handles ``+07:00`` offsets and ``Z`` natively and yields
    NULL on unparseable input — exactly the pandas
    ``to_datetime(errors='coerce')`` contract the reference relies on.
    (Plain ``cast`` would throw under Spark 4's default ANSI mode.)
    """
    out = output_col or col
    return df.withColumn(out, F.col(col).try_cast("timestamp"))


def drop_invalid_datetime(df: DataFrame, col: str = "datetime") -> DataFrame:
    """Drop rows with NULL (unparseable) datetime — reference P5."""
    return df.na.drop(subset=[col])


def with_partition_columns(df: DataFrame, ts_col: str = "datetime") -> DataFrame:
    """Add ``year`` (string), ``month``/``day`` (zero-padded strings).

    Matches the reference's Hive-partition layout (``year=/month=/day=``)
    byte-for-byte: month/day are lpad'ed 2-char strings
    (process_openaq_raw.py:124-127). Deriving them from the timestamp (not
    carrying them separately) guarantees the partition⇔datetime consistency
    invariant the reference tests assert
    (tests/test_glue_transformation.py:260-296).
    """
    t = F.col(ts_col)
    return (
        df.withColumn("year", F.year(t).cast("string"))
        .withColumn("month", F.lpad(F.month(t).cast("string"), 2, "0"))
        .withColumn("day", F.lpad(F.dayofmonth(t).cast("string"), 2, "0"))
    )
