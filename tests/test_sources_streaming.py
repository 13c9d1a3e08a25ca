"""Sources (NDJSON, API-record normalizer) + streaming ingest tests."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from openaq_data_pipeline_engineering_spark.sources.api_source import (
    enrich_from_locations,
    filter_active_locations,
    locations_to_df,
    normalize_measurements,
    sensor_location_dim,
)
from openaq_data_pipeline_engineering_spark.sources.json_source import (
    read_ndjson,
    write_ndjson,
    write_wrapped_archive,
)


def mock_locations(spark):
    """Shape of reference data/mock_locations_vn.json."""
    recs = [
        {
            "id": 1, "name": "Hanoi Station", "locality": "Hanoi", "timezone": "Asia/Bangkok",
            "country": {"id": 56, "code": "VN", "name": "Vietnam"},
            "coordinates": {"latitude": 21.0, "longitude": 105.8},
            "sensors": [
                {"id": 11, "name": "pm25 sensor", "parameter": {"id": 2, "name": "pm25", "units": "µg/m³", "displayName": "PM2.5"}},
                {"id": 12, "name": "o3 sensor", "parameter": {"id": 3, "name": "o3", "units": "µg/m³", "displayName": None}},
            ],
            "datetimeLast": {"utc": "2025-12-20T10:00:00Z", "local": "2025-12-20T17:00:00+07:00"},
            "isMobile": False, "isMonitor": True,
        },
        {
            "id": 2, "name": "No Locality", "locality": None, "timezone": "Asia/Bangkok",
            "country": {"id": 56, "code": "VN", "name": "Vietnam"},
            "coordinates": {"latitude": 10.8, "longitude": 106.7},
            "sensors": [
                {"id": 21, "name": "s", "parameter": {"id": 2, "name": "PM2.5", "units": "µg/m³", "displayName": "PM2.5"}},
            ],
            "datetimeLast": {"utc": "2025-12-19T10:00:00Z", "local": "x"},
            "isMobile": False, "isMonitor": True,
        },
        {
            "id": 3, "name": "Stale", "locality": "Hue", "timezone": "Asia/Bangkok",
            "country": {"id": 56, "code": "VN", "name": "Vietnam"},
            "coordinates": {"latitude": 16.4, "longitude": 107.5},
            "sensors": [
                {"id": 31, "name": "s", "parameter": {"id": 5, "name": "no2", "units": "µg/m³", "displayName": None}},
            ],
            "datetimeLast": {"utc": "2025-01-01T00:00:00Z", "local": "x"},
            "isMobile": False, "isMonitor": True,
        },
    ]
    return locations_to_df(spark, recs)


def test_activity_and_parameter_filter(spark):
    # reference P7+P8: stale location dropped; 'PM2.5' normalizes to pm25
    locs = mock_locations(spark)
    active = filter_active_locations(locs, "2025-12-15 00:00:00", ["pm25"])
    assert {r.id for r in active.select("id").collect()} == {1, 2}


def test_sensor_dim_and_enrichment(spark):
    locs = mock_locations(spark)
    dim = sensor_location_dim(locs)
    assert dim.count() == 4  # one row per sensor
    api_rows = [
        {"value": 25.5, "parameter": {"id": 2, "name": "pm25", "units": "µg/m³"},
         "period": {"datetimeFrom": {"utc": "2025-12-20T10:00:00Z", "local": "x"},
                    "datetimeTo": {"utc": "2025-12-20T11:00:00Z", "local": "x"}},
         "sensor_id": 11},
        {"value": 9.0, "parameter": {"id": 2, "name": "pm25", "units": "µg/m³"},
         "period": {"datetimeFrom": {"utc": "2025-12-20T10:00:00Z", "local": "x"},
                    "datetimeTo": {"utc": "2025-12-20T11:00:00Z", "local": "x"}},
         "sensor_id": 21},
    ]
    from openaq_data_pipeline_engineering_spark.sources.api_source import api_measurements_to_df

    meas = normalize_measurements(api_measurements_to_df(spark, api_rows))
    assert set(meas.columns) == {"sensor_id", "datetime", "parameter", "unit", "value"}
    enriched = enrich_from_locations(meas, locs, city_map={2: "Saigon"})
    got = {r.sensor_id: r.city for r in enriched.select("sensor_id", "city").collect()}
    assert got[11] == "Hanoi"     # locality wins
    assert got[21] == "Saigon"    # null locality → static map fallback


def test_enrichment_uses_shipped_default_city_map(spark):
    """Module-default LOCATION_CITY_MAP (reference extract_api.py:355-372
    shape) is exercised when no override is passed: a known station id
    with null locality resolves to its mapped city; an unknown one
    falls through to 'Unknown'."""
    from openaq_data_pipeline_engineering_spark.sources.api_source import (
        LOCATION_CITY_MAP,
        api_measurements_to_df,
    )

    assert LOCATION_CITY_MAP[2539] == "Hanoi"
    recs = [
        {
            "id": 2539, "name": "US Diplomatic Post: Hanoi", "locality": None,
            "timezone": "Asia/Bangkok",
            "country": {"id": 56, "code": "VN", "name": "Vietnam"},
            "coordinates": {"latitude": 21.0, "longitude": 105.8},
            "sensors": [{"id": 91, "name": "s", "parameter": {"id": 2, "name": "pm25", "units": "µg/m³", "displayName": "PM2.5"}}],
            "datetimeLast": {"utc": "2025-12-20T10:00:00Z", "local": "x"},
            "isMobile": False, "isMonitor": True,
        },
        {
            "id": 999999, "name": "Unmapped", "locality": None,
            "timezone": "Asia/Bangkok",
            "country": {"id": 56, "code": "VN", "name": "Vietnam"},
            "coordinates": {"latitude": 16.0, "longitude": 106.0},
            "sensors": [{"id": 92, "name": "s", "parameter": {"id": 2, "name": "pm25", "units": "µg/m³", "displayName": "PM2.5"}}],
            "datetimeLast": {"utc": "2025-12-20T10:00:00Z", "local": "x"},
            "isMobile": False, "isMonitor": True,
        },
    ]
    locs = locations_to_df(spark, recs)
    api_rows = [
        {"value": 12.0, "parameter": {"id": 2, "name": "pm25", "units": "µg/m³"},
         "period": {"datetimeFrom": {"utc": "2025-12-20T10:00:00Z", "local": "x"},
                    "datetimeTo": {"utc": "2025-12-20T11:00:00Z", "local": "x"}},
         "sensor_id": 91},
        {"value": 7.0, "parameter": {"id": 2, "name": "pm25", "units": "µg/m³"},
         "period": {"datetimeFrom": {"utc": "2025-12-20T10:00:00Z", "local": "x"},
                    "datetimeTo": {"utc": "2025-12-20T11:00:00Z", "local": "x"}},
         "sensor_id": 92},
    ]
    meas = normalize_measurements(api_measurements_to_df(spark, api_rows))
    enriched = enrich_from_locations(meas, locs)  # no override: module default
    got = {r.sensor_id: r.city for r in enriched.select("sensor_id", "city").collect()}
    assert got[91] == "Hanoi"      # shipped default map hit
    assert got[92] == "Unknown"    # unmapped id → terminal fallback


def test_ndjson_roundtrip(spark, tmp_path):
    from openaq_data_pipeline_engineering_spark.schemas import MEASUREMENT_SCHEMA

    df = spark.createDataFrame(
        [("loc1", 1, None, "2025-12-20T10:00:00+07:00", "pm25", 25.5, "µg/m³",
          "Hanoi", "VN", 21.0, 105.8, "Asia/Bangkok", "2025-12-20T11:00:00Z")],
        MEASUREMENT_SCHEMA,
    )
    p = str(tmp_path / "ndjson")
    write_ndjson(df, p)
    back = read_ndjson(spark, p)
    assert back.count() == 1
    assert back.schema == MEASUREMENT_SCHEMA
    assert back.first().city == "Hanoi"


def test_wrapped_archive(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    p = str(tmp_path / "archive")
    write_wrapped_archive(df, p, meta={"source": "unit", "found": 2})
    back = spark.read.json(p)
    assert back.count() == 2
    row = back.first()
    assert row.meta.source == "unit"
    assert len(row.results) == 1


def test_streaming_incremental_dedup(spark, tmp_path):
    """File-source stream with availableNow: re-delivered rows within the
    watermark are deduped; a second run over the same checkpoint
    processes nothing new (exactly-once per file)."""
    import json
    import os

    from openaq_data_pipeline_engineering_spark.streaming.ingest import incremental_ingest

    src = tmp_path / "raw"
    src.mkdir()
    rows = [
        {"location_id": "loc1", "datetime": "2025-12-20T10:00:00+00:00", "parameter": "pm25", "value": 1.0},
        {"location_id": "loc1", "datetime": "2025-12-20T10:00:00+00:00", "parameter": "pm25", "value": 1.0},  # dup
        {"location_id": "loc2", "datetime": "2025-12-20T10:30:00+00:00", "parameter": "pm25", "value": 2.0},
    ]
    (src / "batch1.json").write_text("\n".join(json.dumps(r) for r in rows))

    schema = T.StructType([
        T.StructField("location_id", T.StringType()),
        T.StructField("datetime", T.StringType()),
        T.StructField("parameter", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])

    def parse(stream):
        return stream.withColumn("event_time", F.col("datetime").try_cast("timestamp"))

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _, starter = incremental_ingest(
        spark, str(src), ckpt, schema,
        keys=["location_id", "event_time", "parameter"], ts_col="event_time",
        transform=parse, source_format="json",
    )
    starter.run_available_now_to_parquet(out)
    assert spark.read.parquet(out).count() == 2  # dup dropped

    # late re-delivery in a NEW file: same key arrives again within watermark
    (src / "batch2.json").write_text(json.dumps(rows[0]))
    _, starter2 = incremental_ingest(
        spark, str(src), ckpt, schema,
        keys=["location_id", "event_time", "parameter"], ts_col="event_time",
        transform=parse, source_format="json",
    )
    starter2.run_available_now_to_parquet(out)
    total = spark.read.parquet(out).count()
    assert total == 2  # stateful dedup across micro-batches via checkpoint
    assert len([f for f in os.listdir(ckpt) if f]) > 0


def test_ingest_dedup_key_is_unambiguous_in_testdata(spark):
    """Precondition of streaming_incremental_ingest's DuckDB oracle
    (plans/queries_ext.py): every (user_id, ts) dedup key maps to ONE
    event_type, so the stream's arrival-order survivor equals the
    oracle's grouped min(event_type). If the testdata ever regenerates
    with ambiguous keys this fails and the oracle must revert to
    rows-only."""
    from openaq_data_pipeline_engineering_spark.sources.star import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    ambiguous = (
        ev.groupBy("user_id", "ts")
        .agg(F.countDistinct("event_type").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert ambiguous == 0


def test_streaming_windowed_agg_with_late_data(spark, tmp_path):
    """Tumbling-window agg with watermark: a late-but-within-watermark
    event lands in its original window; an event older than the
    watermark is dropped entirely."""
    import json as _json
    import os as _os

    from pyspark.sql import types as T

    from openaq_data_pipeline_engineering_spark.streaming.ingest import windowed_counts

    src = str(tmp_path / "wsrc")
    ckpt = str(tmp_path / "wckpt")
    out_dir = str(tmp_path / "wout")
    _os.makedirs(src)
    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("value", T.DoubleType())]
    )

    def write_file(name, rows):
        with open(_os.path.join(src, name), "w") as f:
            for ts, v in rows:
                f.write(_json.dumps({"ts": ts, "value": v}) + "\n")

    def run_batch():
        stream = spark.readStream.format("json").schema(schema).load(src)
        agg = windowed_counts(stream, "ts", "1 hour", watermark="1 hour")

        def sink(bdf, bid):
            bdf.write.mode("append").parquet(out_dir)

        (
            agg.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    # batch 1: events at 09:10 and 10:10 -> watermark reaches 09:10
    write_file("b1.json", [("2026-01-01T09:10:00", 1.0), ("2026-01-01T10:10:00", 2.0)])
    run_batch()
    # batch 2: late event 09:40 (within watermark: counted in 09:00 win),
    # ancient event 07:00 (older than watermark: dropped),
    # and 12:10 (advances watermark past 10:00 and 11:00 windows)
    write_file("b2.json", [
        ("2026-01-01T09:40:00", 10.0),
        ("2026-01-01T07:00:00", 99.0),
        ("2026-01-01T12:10:00", 3.0),
    ])
    run_batch()

    rows = {
        r["window_start"].hour: r
        for r in spark.read.parquet(out_dir).collect()
    }
    # 09:00 window: original 09:10 event + late 09:40 event, no 07:00
    assert rows[9]["n"] == 2 and rows[9]["sum_value"] == 11.0
    assert rows[10]["n"] == 1
    assert 7 not in rows  # older-than-watermark event dropped


def test_streaming_session_window_builtin(spark, tmp_path):
    """Built-in session_window agg (the declarative twin of
    streaming/stateful.sessionizer_stateful): gap-merged sessions close
    when the watermark passes start+gap."""
    import json as _json
    import os as _os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    src = str(tmp_path / "ssrc")
    ckpt = str(tmp_path / "sckpt")
    out_dir = str(tmp_path / "sout")
    _os.makedirs(src)
    rows = [
        ("u1", "2026-01-01T09:00:00"), ("u1", "2026-01-01T09:10:00"),
        ("u1", "2026-01-01T11:00:00"),  # > 30min gap: second session
        ("u2", "2026-01-01T09:05:00"),
        ("u1", "2026-01-01T23:00:00"),  # advances watermark far ahead
    ]
    with open(_os.path.join(src, "b.json"), "w") as f:
        for k, ts in rows:
            f.write(_json.dumps({"k": k, "ts": ts}) + "\n")
    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("ts", T.TimestampType())]
    )
    stream = spark.readStream.format("json").schema(schema).load(src)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes"), "k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("session_window.start").alias("start"),
            F.col("k"), F.col("n"),
        )
    )

    def sink(bdf, bid):
        bdf.write.mode("append").parquet(out_dir)

    (
        agg.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {(r["k"], r["start"].hour): r["n"]
           for r in spark.read.parquet(out_dir).collect()}
    assert got[("u1", 9)] == 2   # 09:00+09:10 merged into one session
    assert got[("u1", 11)] == 1
    assert got[("u2", 9)] == 1


def test_stream_static_broadcast_enrichment(spark, tmp_path):
    """Stream-static join: a streaming fact enriched against a static
    dimension — the streaming twin of the mart's broadcast enrich."""
    import json as _json
    import os as _os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    src = str(tmp_path / "esrc")
    ckpt = str(tmp_path / "eckpt")
    out_dir = str(tmp_path / "eout")
    _os.makedirs(src)
    with open(_os.path.join(src, "b.json"), "w") as f:
        for loc, v in [("loc1", 1.0), ("loc2", 2.0), ("locX", 3.0)]:
            f.write(_json.dumps({"location_id": loc, "value": v}) + "\n")
    dim = spark.createDataFrame(
        [("loc1", "Hanoi"), ("loc2", "Hue")], "location_id string, city string"
    )
    schema = T.StructType(
        [T.StructField("location_id", T.StringType()),
         T.StructField("value", T.DoubleType())]
    )
    stream = spark.readStream.format("json").schema(schema).load(src)
    enriched = stream.join(F.broadcast(dim), "location_id", "left").withColumn(
        "city", F.coalesce("city", F.lit("Unknown"))
    )

    def sink(bdf, bid):
        bdf.write.mode("append").parquet(out_dir)

    (
        enriched.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {r["location_id"]: r["city"] for r in spark.read.parquet(out_dir).collect()}
    assert got == {"loc1": "Hanoi", "loc2": "Hue", "locX": "Unknown"}


def _write_events_parquet(path, ts_unit):
    """events-shaped parquet with ts in the given pyarrow timestamp unit."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base_us = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z in micros
    rows_us = [base_us, base_us + 3_600_000_000, base_us + 7_200_000_000]
    mult = 1000 if ts_unit == "ns" else 1
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(
                [v * mult for v in rows_us], pa.timestamp(ts_unit)
            ),
            "user_id": pa.array([10, 10, 11], pa.int64()),
            "event_type": pa.array(["click"] * 3, pa.string()),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}"] * 3, pa.string()),
        }
    )
    pq.write_table(table, path, coerce_timestamps=None)
    return rows_us


class TestEventsStreamSpec:
    """The driver has shipped events.ts as both TIMESTAMP(micros) and
    TIMESTAMP(NANOS) across testdata regenerations; a hardcoded stream
    schema silently corrupts event times by 1000x for the other type.
    events_stream_spec must adapt to whichever is on disk."""

    def _roundtrip(self, spark, tmp_path, ts_unit):
        import os

        from openaq_data_pipeline_engineering_spark.streaming.ingest import (
            events_stream_spec,
        )

        src = str(tmp_path / f"src_{ts_unit}")
        os.makedirs(src)
        rows_us = _write_events_parquet(
            os.path.join(src, "events.parquet"), ts_unit
        )
        schema, to_event_time = events_stream_spec(spark, src)
        stream = to_event_time(
            spark.readStream.format("parquet")
            .schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .load(src)
        )
        ckpt = str(tmp_path / f"ckpt_{ts_unit}")
        name = f"events_spec_{ts_unit}"
        (
            stream.select("event_id", "ts", "ts_us")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        got = {
            r["event_id"]: (r["ts"], r["ts_us"])
            for r in spark.table(name).collect()
        }
        assert sorted(got) == [1, 2, 3]
        for eid, us in zip([1, 2, 3], rows_us):
            ts, ts_us = got[eid]
            assert ts_us == us, f"{ts_unit}: exact micros preserved"
            # event-time column spans the true 2h window, not 1000x off
        span = got[3][1] - got[1][1]
        assert span == 7_200_000_000

    def test_micros_parquet(self, spark, tmp_path):
        self._roundtrip(spark, tmp_path, "us")

    def test_nanos_parquet(self, spark, tmp_path):
        self._roundtrip(spark, tmp_path, "ns")


def test_scoped_shuffle_partitions_restores(spark):
    from openaq_data_pipeline_engineering_spark.streaming.ingest import (
        scoped_shuffle_partitions,
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        with scoped_shuffle_partitions(spark, 3):
            assert spark.conf.get("spark.sql.shuffle.partitions") == "3"
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_bounded_state_partitions_scales_with_input(spark, tmp_path):
    """r13: state partitioning derives from input bytes — floor on tiny
    inputs, grows with volume, capped at 4x defaultParallelism."""
    from openaq_data_pipeline_engineering_spark.streaming.ingest import (
        bounded_state_partitions,
    )

    # single-file table layout (sf_dir + table name)
    f = tmp_path / "events.parquet"
    f.write_bytes(b"x" * 1024)  # 1 KiB -> floor
    assert bounded_state_partitions(spark, str(tmp_path), "events") == 2
    # directory layout: sums data files, skips _SUCCESS/dot files
    d = tmp_path / "drop"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"x" * (96 << 20))  # 96 MiB
    (d / "_SUCCESS").write_bytes(b"")
    assert bounded_state_partitions(spark, str(d)) == 3  # ceil(96/32)
    # cap: never exceeds 4x defaultParallelism
    cap = spark.sparkContext.defaultParallelism * 4
    (d / "part-1.parquet").write_bytes(b"x" * (64 << 20))
    big = bounded_state_partitions(
        spark, str(d), bytes_per_partition=1 << 20
    )
    assert big == min(cap, 160)
    # missing input -> floor, no crash
    assert bounded_state_partitions(spark, str(tmp_path / "nope")) == 2


class TestCsvSource:
    def test_roundtrip_types_preserved(self, spark, tmp_path):
        from pyspark.sql import types as T

        from openaq_data_pipeline_engineering_spark.sources.csv_source import (
            read_csv,
            write_csv,
        )

        df = spark.createDataFrame(
            [(1, "a,b", 1.5, None), (2, 'q"x', -2.0, "z")],
            "id BIGINT, s STRING, v DOUBLE, opt STRING",
        )
        d = str(tmp_path / "csvout")
        write_csv(df, d)
        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("s", T.StringType()),
                T.StructField("v", T.DoubleType()),
                T.StructField("opt", T.StringType()),
            ]
        )
        back = read_csv(spark, d, schema=schema)
        assert back.schema == schema
        got = sorted(back.collect(), key=lambda r: r["id"])
        assert [tuple(r) for r in got] == [
            (1, "a,b", 1.5, None),
            (2, 'q"x', -2.0, "z"),
        ]

    def test_permissive_quarantines_bad_rows(self, spark, tmp_path):
        import os

        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        from openaq_data_pipeline_engineering_spark.sources.csv_source import (
            CORRUPT_COL,
            read_csv,
        )

        d = str(tmp_path / "csvbad")
        os.makedirs(d)
        with open(os.path.join(d, "part.csv"), "w") as f:
            f.write("id,v\n1,2.5\nnot_an_int,oops\n3,4.5\n")
        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("v", T.DoubleType()),
                T.StructField(CORRUPT_COL, T.StringType()),
            ]
        )
        back = read_csv(spark, d, schema=schema, mode="PERMISSIVE").cache()
        try:
            good = back.filter(F.col(CORRUPT_COL).isNull())
            bad = back.filter(F.col(CORRUPT_COL).isNotNull())
            assert sorted(r["id"] for r in good.collect()) == [1, 3]
            assert bad.count() == 1
            assert "not_an_int" in bad.first()[CORRUPT_COL]
        finally:
            back.unpersist()


def test_metadata_columns_exposed(spark):
    """Scan provenance: the hidden _metadata struct (file_name, size,
    row_index) is selectable from the parquet source — the lineage
    hook a quarantine/debug flow uses to trace a bad row to its file."""
    from pyspark.sql import functions as F

    from openaq_data_pipeline_engineering_spark.sources.star import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    meta = ev.select(
        F.col("_metadata.file_name").alias("fname"),
        F.col("_metadata.row_index").alias("ridx"),
    )
    row = meta.first()
    assert row["fname"] == "events.parquet"
    assert meta.filter(F.col("ridx") < 0).count() == 0
    n_files = meta.select("fname").distinct().count()
    assert n_files == 1


def test_xml_source_roundtrip(spark, tmp_path):
    """Spark 4 built-in XML source: explicit schema + rowTag read, and
    writer roundtrip — the remaining interchange edge beside
    NDJSON/CSV/parquet."""
    import os

    d_in = str(tmp_path / "xml_in")
    os.makedirs(d_in)
    with open(os.path.join(d_in, "part.xml"), "w") as f:
        f.write(
            "<rows><row><id>1</id><name>a&amp;b</name></row>"
            "<row><id>2</id><name>c</name></row></rows>"
        )
    df = (
        spark.read.format("xml")
        .option("rowTag", "row")
        .schema("id BIGINT, name STRING")
        .load(d_in)
    )
    assert sorted(tuple(r) for r in df.collect()) == [(1, "a&b"), (2, "c")]

    d_out = str(tmp_path / "xml_out")
    df.write.format("xml").option("rowTag", "row").mode("overwrite").save(d_out)
    back = (
        spark.read.format("xml")
        .option("rowTag", "row")
        .schema("id BIGINT, name STRING")
        .load(d_out)
    )
    assert sorted(tuple(r) for r in back.collect()) == [(1, "a&b"), (2, "c")]


def test_orc_source_roundtrip(spark, tmp_path):
    """ORC interchange: built-in columnar alternative to parquet —
    write a star table out as ORC, read it back identically (schema
    and values), closing the last built-in columnar-format edge."""
    from openaq_data_pipeline_engineering_spark.sources.star import load_table

    nation = load_table(spark, "/root/testdata/sf0.001", "nation")
    d = str(tmp_path / "orc")
    nation.write.format("orc").mode("overwrite").save(d)
    back = spark.read.format("orc").load(d)
    assert back.schema == nation.schema
    assert back.exceptAll(nation).count() == 0
    assert back.count() == nation.count()


def test_streaming_file_sink_exactly_once(spark, tmp_path):
    """The parquet streaming sink is exactly-once: re-starting from the
    same checkpoint does not duplicate committed batches (the sink's
    _spark_metadata log defines table contents, not the raw listing)."""
    import os

    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(os.path.join(src, "a.json"), "w") as f:
        f.write('{"k": 1}\n{"k": 2}\n')
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.schema("k long")
            .json(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    assert spark.read.parquet(out).count() == 2
    # replay with NO new data: nothing must be re-committed
    run_once()
    assert spark.read.parquet(out).count() == 2
    # new data arrives -> only the delta lands
    with open(os.path.join(src, "b.json"), "w") as f:
        f.write('{"k": 3}\n')
    run_once()
    assert spark.read.parquet(out).count() == 3
    assert sorted(
        r["k"] for r in spark.read.parquet(out).collect()
    ) == [1, 2, 3]
