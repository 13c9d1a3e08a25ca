"""Operator library: each op is a ``DataFrame -> DataFrame`` function.

Mirrors the reference's operator inventory (SURVEY.md §2) in idiomatic
Spark — declarative Column expressions the Catalyst optimizer can push
down, prune, and codegen. No row-at-a-time Python in any hot path.
"""

from openaq_data_pipeline_engineering_spark.operators.parse import (
    parse_datetime,
    with_partition_columns,
    drop_invalid_datetime,
)
from openaq_data_pipeline_engineering_spark.operators.dedup import dedup_first, exact_dedup
from openaq_data_pipeline_engineering_spark.operators.pivot import pivot_parameters
from openaq_data_pipeline_engineering_spark.operators.enrich import extract_location_dim, enrich_metadata
from openaq_data_pipeline_engineering_spark.operators.filters import (
    filter_active,
    normalize_parameter,
    range_qa_counts,
    null_profile,
)
from openaq_data_pipeline_engineering_spark.operators.aqi import compute_aqi

__all__ = [
    "parse_datetime",
    "with_partition_columns",
    "drop_invalid_datetime",
    "dedup_first",
    "exact_dedup",
    "pivot_parameters",
    "extract_location_dim",
    "enrich_metadata",
    "filter_active",
    "normalize_parameter",
    "range_qa_counts",
    "null_profile",
    "compute_aqi",
]
