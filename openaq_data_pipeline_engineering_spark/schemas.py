"""Explicit schemas for the ingest edge.

The reference infers schemas everywhere (raw JSON read,
process_openaq_raw.py:94-100; crawler re-inference,
doc/architecture.md:259-263) and pins a 15-column output only in tests
(tests/test_glue_output_schema.py:44-60). SURVEY §1.2's engine decision:
the mart schema is explicit; inference survives only at the ingest edge
when explicitly requested.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Long-format raw measurement (NDJSON shape, doc/GLUE_JOBS_GUIDE.md:111-132
# + the Lambda-path extras extract_api.py:311-318).
MEASUREMENT_SCHEMA = T.StructType(
    [
        T.StructField("location_id", T.StringType()),
        T.StructField("sensor_id", T.LongType()),
        T.StructField("location_name", T.StringType()),
        T.StructField("datetime", T.StringType()),  # ISO-8601 with offset
        T.StructField("parameter", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("unit", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("timezone", T.StringType()),
        T.StructField("extracted_at", T.StringType()),
    ]
)

# Nested location dimension (API shape, data/mock_locations_vn.json:10-64).
LOCATION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("locality", T.StringType()),
        T.StructField("timezone", T.StringType()),
        T.StructField(
            "country",
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("code", T.StringType()),
                    T.StructField("name", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "coordinates",
            T.StructType(
                [
                    T.StructField("latitude", T.DoubleType()),
                    T.StructField("longitude", T.DoubleType()),
                ]
            ),
        ),
        T.StructField(
            "sensors",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.LongType()),
                        T.StructField("name", T.StringType()),
                        T.StructField(
                            "parameter",
                            T.StructType(
                                [
                                    T.StructField("id", T.LongType()),
                                    T.StructField("name", T.StringType()),
                                    T.StructField("units", T.StringType()),
                                    T.StructField("displayName", T.StringType()),
                                ]
                            ),
                        ),
                    ]
                )
            ),
        ),
        T.StructField(
            "datetimeLast",
            T.StructType(
                [
                    T.StructField("utc", T.StringType()),
                    T.StructField("local", T.StringType()),
                ]
            ),
        ),
        T.StructField("isMobile", T.BooleanType()),
        T.StructField("isMonitor", T.BooleanType()),
    ]
)

# Nested sensor-measurement record (API shape, data/sensor_7772024.json:20-41).
API_MEASUREMENT_SCHEMA = T.StructType(
    [
        T.StructField("value", T.DoubleType()),
        T.StructField(
            "parameter",
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("name", T.StringType()),
                    T.StructField("units", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "period",
            T.StructType(
                [
                    T.StructField(
                        "datetimeFrom",
                        T.StructType(
                            [
                                T.StructField("utc", T.StringType()),
                                T.StructField("local", T.StringType()),
                            ]
                        ),
                    ),
                    T.StructField(
                        "datetimeTo",
                        T.StructType(
                            [
                                T.StructField("utc", T.StringType()),
                                T.StructField("local", T.StringType()),
                            ]
                        ),
                    ),
                ]
            ),
        ),
        T.StructField("sensor_id", T.LongType()),
    ]
)

# Wide mart output (tests/test_glue_output_schema.py:44-60 + AQI extension).
MART_SCHEMA = T.StructType(
    [
        T.StructField("location_id", T.StringType(), False),
        T.StructField("datetime", T.TimestampType(), False),
        T.StructField("year", T.StringType(), False),
        T.StructField("month", T.StringType(), False),
        T.StructField("day", T.StringType(), False),
        T.StructField("pm25", T.DoubleType()),
        T.StructField("pm10", T.DoubleType()),
        T.StructField("no2", T.DoubleType()),
        T.StructField("so2", T.DoubleType()),
        T.StructField("o3", T.DoubleType()),
        T.StructField("co", T.DoubleType()),
        T.StructField("bc", T.DoubleType()),
        T.StructField("city_name", T.StringType()),
        T.StructField("country_code", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
    ]
)
