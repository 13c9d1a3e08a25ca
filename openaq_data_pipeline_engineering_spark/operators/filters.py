"""Predicate / filter / QA operators.

Reference semantics:
- P7: activity filter — keep entities seen within a lookback window
  (extract_api.py:111-186).
- P8/F3: parameter-name normalization + membership (lowercase, strip
  '.', equality or substring — the Dec-2025 'PM2.5'→'pm25' fix,
  extract_api.py:167-179).
- P9: range QA predicates (tests/test_glue_transformation.py:198-253).
- P10: single-pass per-column null profiling
  (process_openaq_raw.py:228-231).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_parameter(col: Column | str) -> Column:
    """Lowercase + strip '.' — 'PM2.5' → 'pm25' (reference F3)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(c), r"\.", "")


def parameter_matches(col: Column | str, required: list[str]) -> Column:
    """Normalized equality OR substring membership (reference P8)."""
    norm = normalize_parameter(col)
    cond = F.lit(False)
    for p in required:
        cond = cond | (norm == p) | norm.contains(p)
    return cond


def filter_active(
    df: DataFrame,
    ts_col: str,
    cutoff,
) -> DataFrame:
    """Keep rows with ``ts_col >= cutoff`` (reference P7 activity window).

    ``cutoff`` may be a literal or a Column (e.g. ``max(ts) - interval``).
    A plain range predicate → pushed to the Parquet scan / prunes
    partitions when the table is date-partitioned.
    """
    c = cutoff if isinstance(cutoff, Column) else F.lit(cutoff)
    return df.filter(F.col(ts_col).cast("timestamp") >= c)


def range_qa_counts(df: DataFrame, bounds: dict[str, tuple[float, float]]) -> DataFrame:
    """One-pass out-of-range counts per column (reference P9 as an agg).

    ``bounds`` maps column -> (lo, hi); result is a single row with one
    ``<col>_oob`` count per column. Conditional aggregation keeps this a
    single scan regardless of how many columns are checked.
    """
    aggs = [
        F.sum(
            F.when((F.col(c) < lo) | (F.col(c) > hi), 1).otherwise(0)
        ).alias(f"{c}_oob")
        for c, (lo, hi) in bounds.items()
    ]
    return df.agg(*aggs)


def null_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column null counts in one scan (reference P10)."""
    aggs = [
        F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}_nulls") for c in cols
    ]
    return df.agg(*aggs)
