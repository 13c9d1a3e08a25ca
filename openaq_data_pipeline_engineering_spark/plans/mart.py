"""The mart pipeline: the reference Glue job's full operator chain,
re-planned Spark-first.

Reference chain (glue_jobs/process_openaq_raw.py, traced in SURVEY §3.2):
read → cast datetime → partition cols → window-dedup → pivot(mean) →
dim-extract → left join → fillna → repartition → partitioned write,
with 5 eager count() actions re-scanning the source every time.

Engine differences (each a deliberate scale fix):
- ONE job: metrics ride on ``observe`` instead of 4 extra count() scans.
- Deterministic dedup tiebreaker (reference orders by the partition key
  itself → nondeterministic survivor).
- Explicit pivot value list → no distinct-scan pre-job, frozen schema.
- Explicit ``F.broadcast`` on the dim join → no fact-side shuffle.
- Write repartitions by the OUTPUT partition columns (year, month, day)
  so each Hive partition is written by as few tasks as possible (the
  reference repartitions by location_id, which sprays every task across
  every date partition → small-file explosion at scale).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.operators.dedup import dedup_first
from openaq_data_pipeline_engineering_spark.operators.enrich import enrich_metadata, extract_location_dim
from openaq_data_pipeline_engineering_spark.operators.parse import (
    drop_invalid_datetime,
    parse_datetime,
    with_partition_columns,
)
from openaq_data_pipeline_engineering_spark.operators.pivot import pivot_parameters

DEFAULT_PARAMETERS = ["pm25", "pm10", "no2", "so2", "o3", "co", "bc"]


@dataclass
class MartConfig:
    """Column mapping + semantics knobs for the long→wide mart build."""

    key: str = "location_id"
    ts: str = "datetime"
    parameter: str = "parameter"
    value: str = "value"
    parameters: list[str] = field(default_factory=lambda: list(DEFAULT_PARAMETERS))
    # source col -> mart col, enrichment metadata carried on the raw rows
    metadata: dict = field(
        default_factory=lambda: {
            "city": "city_name",
            "country": "country_code",
            "latitude": "latitude",
            "longitude": "longitude",
        }
    )
    fills: dict = field(
        default_factory=lambda: {
            "city_name": "Unknown",
            "country_code": "VN",
            "latitude": 0.0,
            "longitude": 0.0,
        }
    )
    tiebreaker: list[str] = field(default_factory=list)  # dedup determinism
    ts_is_string: bool = True  # input datetime is ISO-8601 string
    value_decimals: int | None = None  # fp-stable pivot mean (see pivot.py)


def build_mart(raw: DataFrame, cfg: MartConfig) -> DataFrame:
    """Long measurements → wide mart DataFrame (unwritten logical plan)."""
    df = raw
    if cfg.ts_is_string:
        df = parse_datetime(df, cfg.ts)
        df = drop_invalid_datetime(df, cfg.ts)
    df = with_partition_columns(df, cfg.ts)

    tiebreak = cfg.tiebreaker or [cfg.value]
    deduped = dedup_first(
        df,
        keys=[cfg.key, cfg.ts, cfg.parameter],
        tiebreaker=tiebreak,
    )

    wide = pivot_parameters(
        deduped,
        group_keys=[cfg.key, cfg.ts, "year", "month", "day"],
        pivot_col=cfg.parameter,
        value_col=cfg.value,
        values=cfg.parameters,
        value_decimals=cfg.value_decimals,
    )

    if cfg.metadata:
        dim = extract_location_dim(
            df,
            key=cfg.key,
            attrs=cfg.metadata,
            tiebreaker=[cfg.ts] + tiebreak,
        )
        wide = enrich_metadata(wide, dim, key=cfg.key, fills=cfg.fills)
    return wide


def write_mart(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    sort_cols: list[str] | None = None,
) -> None:
    """Partitioned Snappy-Parquet sink (reference S6) — scale-fixed.

    Repartition by the Hive partition columns so files per partition ==
    tasks that own that partition (reference process_openaq_raw.py:249
    repartitions by location_id instead and writes a file per
    location×date). ``partitionOverwriteMode=dynamic`` (engine conf) makes
    re-runs idempotent where the reference's blind append duplicates.

    ``sort_cols`` (default: whichever of key/ts exist in the frame)
    clusters rows within each file so Parquet row-group min/max stats
    prune point/range lookups on those columns — free at write time, and
    at 100 TB it is the difference between scanning a partition and
    scanning a row group.
    """
    if sort_cols is None:
        sort_cols = [c for c in ("location_id", "datetime") if c in df.columns]
    out = df.repartition("year", "month", "day")
    if sort_cols:
        out = out.sortWithinPartitions("year", "month", "day", *sort_cols)
    (
        out.write.mode(mode)
        .partitionBy("year", "month", "day")
        .parquet(path)
    )
