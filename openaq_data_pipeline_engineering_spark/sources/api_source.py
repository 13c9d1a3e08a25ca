"""API-record adapter + nested-record normalizers (reference S4/S5).

The reference fetches OpenAQ v3 REST pages driver-side
(etls/openaq_etl.py:39-105 locations; :185-260 per-sensor measurements)
and flattens nested objects row-by-row in Python. Here the fetch result
(a list of nested dicts) enters Spark once via ``createDataFrame`` with
an explicit nested schema, and ALL flattening is Column dot-path
projection (F7) — executed on executors, codegen'd, no Python loops.

Live HTTP is out of scope for correctness (SURVEY §7.4); the normalizers
ARE in scope since they define the ingest schema. At real scale the
fetch itself would become a Spark 4 Python DataSource or a
``mapPartitions`` fetcher over a key-range table — the plumbing below is
unchanged either way.
"""

from __future__ import annotations

from openaq_data_pipeline_engineering_spark.localrel import local_rows

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.schemas import API_MEASUREMENT_SCHEMA, LOCATION_SCHEMA

# Static location_id → city fallback map (reference LOCATION_CITY_MAP,
# extract_api.py:355-372): station ids whose API records carry a null
# locality, mapped to their known city. Compiled into a literal
# `create_map` expression (a broadcast dim), never a driver-side dict
# lookup. The reference hardcodes its Vietnam station network; this
# shipped default mirrors that shape and is overridable per-call via
# `enrich_from_locations(city_map=...)`.
LOCATION_CITY_MAP: dict[int, str] = {
    # Hanoi stations (reference extract_api.py:357-361)
    18: "Hanoi",
    2539: "Hanoi",
    307169: "Hanoi",
    6123215: "Hanoi",
    # Ho Chi Minh City stations (extract_api.py:363-372)
    2446: "Ho Chi Minh City",
    268816: "Ho Chi Minh City",
    268821: "Ho Chi Minh City",
    268929: "Ho Chi Minh City",
    268935: "Ho Chi Minh City",
    268937: "Ho Chi Minh City",
    3276359: "Ho Chi Minh City",
    4743591: "Ho Chi Minh City",
    6068138: "Ho Chi Minh City",
}


def locations_to_df(spark: SparkSession, records: list[dict]) -> DataFrame:
    """Nested location JSON records → typed DataFrame (S4)."""
    return local_rows(spark, records, LOCATION_SCHEMA)


def api_measurements_to_df(spark: SparkSession, records: list[dict]) -> DataFrame:
    """Nested sensor-measurement records → typed DataFrame (S5)."""
    return local_rows(spark, records, API_MEASUREMENT_SCHEMA)


def normalize_measurements(df: DataFrame) -> DataFrame:
    """Flatten API measurement records to the long fact shape (F7):
    ``period.datetimeFrom.utc`` → datetime, ``parameter.name/units`` →
    parameter/unit (reference extract_api.py:240-254)."""
    return df.select(
        F.col("sensor_id"),
        F.col("period.datetimeFrom.utc").alias("datetime"),
        F.col("parameter.name").alias("parameter"),
        F.col("parameter.units").alias("unit"),
        F.col("value"),
    )


def sensor_location_dim(locations: DataFrame) -> DataFrame:
    """Explode locations → one row per sensor with location metadata
    (reference's sensor→location Python dict, etls/openaq_etl.py:355-378,
    as a broadcastable dimension DataFrame)."""
    exploded = locations.select(
        F.col("id").alias("location_id"),
        F.col("name").alias("location_name"),
        F.col("locality"),
        F.col("timezone"),
        F.col("country.code").alias("country_code"),
        F.col("coordinates.latitude").alias("latitude"),
        F.col("coordinates.longitude").alias("longitude"),
        F.explode("sensors").alias("sensor"),
    )
    return exploded.select(
        F.col("sensor.id").alias("sensor_id"),
        "location_id",
        "location_name",
        "locality",
        "timezone",
        "country_code",
        "latitude",
        "longitude",
        F.col("sensor.parameter.name").alias("sensor_parameter"),
    )


def enrich_from_locations(
    measurements: DataFrame,
    locations: DataFrame,
    city_map: dict[int, str] | None = None,
) -> DataFrame:
    """Join flattened measurements to the sensor dim with the coalesce-chain
    city fallback: locality → static map → 'Unknown'
    (reference extract_api.py:331-425, one broadcast join instead of 7
    Python ``.map`` calls)."""
    dim = sensor_location_dim(locations)
    city_map = LOCATION_CITY_MAP if city_map is None else city_map
    if city_map:
        mapping = F.create_map(
            *[F.lit(x) for kv in city_map.items() for x in kv]
        )
        city = F.coalesce(
            F.col("locality"), mapping[F.col("location_id")], F.lit("Unknown")
        )
    else:
        city = F.coalesce(F.col("locality"), F.lit("Unknown"))
    return (
        measurements.join(F.broadcast(dim), "sensor_id", "left")
        .withColumn("city", city)
        .drop("locality")
    )


def filter_active_locations(
    locations: DataFrame,
    cutoff_utc: str,
    required_parameters: list[str] | None = None,
) -> DataFrame:
    """Activity + parameter filter on the nested dim (reference P7+P8,
    extract_api.py:111-186): keep locations whose ``datetimeLast.utc`` is
    within the lookback AND (optionally) that carry at least one sensor
    whose normalized parameter name matches a required one."""
    out = locations.filter(
        F.col("datetimeLast").isNotNull()
        & (F.col("datetimeLast.utc").try_cast("timestamp") >= F.lit(cutoff_utc).cast("timestamp"))
    )
    if required_parameters:
        # equality-or-substring on the normalized name, evaluated with
        # F.exists over the sensors array — no explode/shuffle needed
        norm = lambda c: F.regexp_replace(F.lower(c), r"\.", "")  # noqa: E731

        def matcher(param: str):
            # single-arg lambda factory: F.exists introspects lambda arity,
            # so a `p=p` default-arg capture would read as two parameters
            return lambda sensor: norm(sensor["parameter"]["name"]).contains(param)

        cond = F.lit(False)
        for p in required_parameters:
            cond = cond | F.exists(F.col("sensors"), matcher(p))
        out = out.filter(cond)
    return out
