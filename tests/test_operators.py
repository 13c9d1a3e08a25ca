"""Operator unit tests — ports of the reference's Spark-logic invariants
(tests/test_glue_complete.py:123-319, tests/test_glue_transformation.py)
onto the new engine's operators, plus determinism checks the reference
lacks."""

from __future__ import annotations

from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.operators import (
    compute_aqi,
    dedup_first,
    exact_dedup,
    enrich_metadata,
    extract_location_dim,
    normalize_parameter,
    null_profile,
    parse_datetime,
    drop_invalid_datetime,
    pivot_parameters,
    range_qa_counts,
    with_partition_columns,
)
from openaq_data_pipeline_engineering_spark.operators.filters import parameter_matches


RAW_COLS = ["location_id", "datetime", "parameter", "value", "city", "extracted_at"]


def raw_fixture(spark):
    rows = [
        # exact duplicate pair on (location, datetime, parameter)
        ("loc1", "2025-12-20T10:00:00+07:00", "pm25", 25.5, "Hanoi", "t1"),
        ("loc1", "2025-12-20T10:00:00+07:00", "pm25", 26.0, "Hanoi", "t0"),
        # second parameter at same key
        ("loc1", "2025-12-20T10:00:00+07:00", "pm10", 50.0, "Hanoi", "t0"),
        # different timezone offset, same instant as 04:00 UTC
        ("loc2", "2025-12-20T12:00:00+08:00", "pm25", 10.0, None, "t0"),
        # Z suffix
        ("loc2", "2025-12-21T00:00:00Z", "o3", 80.0, None, "t0"),
        # invalid datetime → dropped
        ("loc3", "not-a-date", "pm25", 1.0, "Hue", "t0"),
    ]
    return spark.createDataFrame(rows, RAW_COLS)


class TestParse:
    def test_iso8601_offsets_to_utc(self, spark):
        # reference P1/F1: +07:00 / +08:00 / Z all land on the UTC clock
        df = drop_invalid_datetime(parse_datetime(raw_fixture(spark)))
        got = {r.location_id: r.datetime.isoformat() for r in df.select("location_id", "datetime").distinct().collect()}
        assert got["loc1"] == "2025-12-20T03:00:00"
        assert "2025-12-20T04:00:00" in [
            r.datetime.isoformat() for r in df.filter("location_id='loc2'").collect()
        ]

    def test_invalid_datetime_dropped(self, spark):
        # reference P5: errors='coerce' + dropna
        df = drop_invalid_datetime(parse_datetime(raw_fixture(spark)))
        assert df.filter("location_id = 'loc3'").count() == 0

    def test_partition_columns_zero_padded(self, spark):
        # reference P2: lpad month/day; partition ⇔ datetime consistency
        df = with_partition_columns(
            drop_invalid_datetime(parse_datetime(raw_fixture(spark)))
        )
        row = df.filter("location_id = 'loc1'").first()
        assert (row.year, row.month, row.day) == ("2025", "12", "20")
        bad = df.filter(
            (F.year("datetime").cast("string") != F.col("year"))
            | (F.lpad(F.month("datetime").cast("string"), 2, "0") != F.col("month"))
        )
        assert bad.count() == 0


class TestDedup:
    def test_dedup_3_to_2(self, spark):
        # reference invariant: 3 rows with one exact key collision → 2
        # (tests/test_glue_complete.py:183-200), deterministic survivor
        df = parse_datetime(raw_fixture(spark)).filter("location_id = 'loc1'")
        out = dedup_first(df, keys=["location_id", "datetime", "parameter"], tiebreaker=["extracted_at", "value"])
        assert out.count() == 2
        survivor = out.filter("parameter = 'pm25'").first()
        assert survivor.extracted_at == "t0" and survivor.value == 26.0

    def test_dedup_requires_tiebreaker(self, spark):
        import pytest

        with pytest.raises(ValueError):
            dedup_first(raw_fixture(spark), keys=["location_id"], tiebreaker=[])

    def test_exact_dedup_survivor_min_id(self, spark):
        docs = spark.createDataFrame(
            [(1, "same text"), (2, "same text"), (3, "other")], ["doc_id", "text"]
        )
        out = exact_dedup(docs, "text", "doc_id").collect()
        by_hash = {r.doc_id: r.dup_count for r in out}
        assert by_hash == {1: 2, 3: 1}


class TestPivot:
    def test_pivot_explicit_values_frozen_schema(self, spark):
        # reference A1 + AQI-plan schema risk: missing parameter → null col
        df = parse_datetime(raw_fixture(spark)).filter("location_id = 'loc1'")
        out = pivot_parameters(
            df,
            group_keys=["location_id", "datetime"],
            pivot_col="parameter",
            value_col="value",
            values=["pm25", "pm10", "no2"],
        )
        assert {"pm25", "pm10", "no2"} <= set(out.columns)
        row = out.first()
        assert row.no2 is None  # declared but absent → NULL column, not missing
        assert row.pm10 == 50.0

    def test_pivot_mean_resolves_duplicates(self, spark):
        df = spark.createDataFrame(
            [("a", "t", "pm25", 10.0), ("a", "t", "pm25", 20.0)],
            ["location_id", "datetime", "parameter", "value"],
        )
        out = pivot_parameters(df, ["location_id", "datetime"], "parameter", "value", ["pm25"])
        assert out.first().pm25 == 15.0

    def test_pivot_stable_mean_equals_mean_on_grid(self, spark):
        df = spark.createDataFrame(
            [("a", "t", "pm25", 10.01), ("a", "t", "pm25", 20.02)],
            ["location_id", "datetime", "parameter", "value"],
        )
        out = pivot_parameters(
            df, ["location_id", "datetime"], "parameter", "value", ["pm25"], value_decimals=2
        )
        assert abs(out.first().pm25 - 15.015) < 1e-12


class TestEnrich:
    def test_dim_extract_and_broadcast_enrich(self, spark):
        # reference J3+J1+P6: dim from same frame, left join, fillna
        raw = parse_datetime(raw_fixture(spark))
        dim = extract_location_dim(
            raw, key="location_id", attrs={"city": "city_name"}, tiebreaker=["extracted_at"]
        )
        assert dim.count() == dim.select("location_id").distinct().count()
        fact = raw.select("location_id", "datetime", "value")
        out = enrich_metadata(fact, dim, key="location_id", fills={"city_name": "Unknown"})
        cities = {r.location_id: r.city_name for r in out.select("location_id", "city_name").distinct().collect()}
        assert cities["loc1"] == "Hanoi"
        assert cities["loc2"] == "Unknown"  # null metadata → filled

    def test_metadata_functional_dependency(self, spark):
        # reference invariant: location_id → city (test_glue_transformation.py:349-373)
        raw = parse_datetime(raw_fixture(spark))
        dim = extract_location_dim(
            raw, key="location_id", attrs={"city": "city_name"}, tiebreaker=["extracted_at"]
        )
        fact = raw.select("location_id", "datetime")
        out = enrich_metadata(fact, dim, key="location_id", fills={"city_name": "Unknown"})
        violations = (
            out.groupBy("location_id")
            .agg(F.countDistinct("city_name").alias("n"))
            .filter("n > 1")
        )
        assert violations.count() == 0


class TestFilters:
    def test_parameter_normalization(self, spark):
        # reference P8/F3: 'PM2.5' → 'pm25' (the Dec-2025 fix)
        df = spark.createDataFrame([("PM2.5",), ("pm25",), ("O3",), ("NO2 mass",)], ["p"])
        norm = df.select(normalize_parameter("p").alias("n")).collect()
        assert [r.n for r in norm] == ["pm25", "pm25", "o3", "no2 mass"]
        matched = df.filter(parameter_matches("p", ["pm25", "o3"]))
        assert matched.count() == 3  # substring match catches 'NO2 mass'? no — pm25, pm25, o3

    def test_range_qa_and_null_profile(self, spark):
        df = spark.createDataFrame(
            [(91.0, None), (45.0, 1.0), (-95.0, 2.0)], ["lat", "v"]
        )
        qa = range_qa_counts(df, {"lat": (-90, 90)}).first()
        assert qa.lat_oob == 2
        nulls = null_profile(df, ["v"]).first()
        assert nulls.v_nulls == 1


class TestAqi:
    def test_aqi_breakpoints_and_edges(self, spark):
        # reference AQI plan edge rules (:69-73)
        df = spark.createDataFrame(
            [(1, 0.0, None), (2, 12.0, None), (3, 35.5, None), (4, -5.0, None), (5, None, None), (6, 600.0, None)],
            "id int, pm25 double, pm10 double",
        )
        out = {r.id: r for r in compute_aqi(df).collect()}
        assert out[1].aqi == 0.0 and out[1].aqi_level == "Good"
        assert out[2].aqi == 50.0 and out[2].aqi_level == "Good"
        assert out[3].aqi == 101.0
        assert out[4].aqi is None and out[4].aqi_level == "Unknown"  # negative invalid
        assert out[5].aqi is None and out[5].aqi_level == "Unknown"  # all-null
        assert out[6].aqi > 500  # uncapped extrapolation
        assert out[6].aqi_level == "Hazardous"

    def test_dominant_pollutant(self, spark):
        df = spark.createDataFrame([(1, 10.0, 200.0)], ["id", "pm25", "pm10"])
        row = compute_aqi(df).first()
        assert row.dominant_pollutant == "pm10"


class TestObserve:
    def test_observe_counts_single_pass(self, spark):
        from openaq_data_pipeline_engineering_spark.operators.validate import (
            observe_counts,
        )

        df = spark.createDataFrame(
            [("a", 1.0), ("b", None), (None, 3.0)], "k string, v double"
        )
        observed, obs = observe_counts(df, "m1", null_check_cols=["k", "v"])
        assert observed.count() == 3  # the ONE action; metrics ride along
        got = obs.get
        assert got["row_count"] == 3
        assert got["k_nulls"] == 1
        assert got["v_nulls"] == 1
