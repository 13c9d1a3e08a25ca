"""Spark 4 Python DataSource: parallel per-sensor-batch API extraction."""

from __future__ import annotations

import json
import os

from openaq_data_pipeline_engineering_spark.sources.api_datasource import (
    OpenAQApiDataSource,
)


def _fixture(dirpath: str, sensor_id: int, n: int) -> None:
    with open(os.path.join(dirpath, f"{sensor_id}.json"), "w") as f:
        for i in range(n):
            f.write(
                json.dumps(
                    {
                        "value": float(i),
                        "parameter": {"name": "pm25", "units": "µg/m³"},
                        "period": {
                            "datetimeFrom": {"utc": f"2026-01-01T{i:02d}:00:00Z"}
                        },
                    }
                )
                + "\n"
            )


def test_api_datasource_reads_and_partitions(spark, tmp_path):
    fixtures = str(tmp_path / "api")
    os.makedirs(fixtures)
    for sid, n in [(101, 3), (102, 2), (103, 1)]:
        _fixture(fixtures, sid, n)

    spark.dataSource.register(OpenAQApiDataSource)
    df = (
        spark.read.format("openaq_api")
        .option("fixtures_path", fixtures)
        .option("sensor_ids", "101,102,103,999")  # 999: missing -> skipped
        .option("batch_size", "2")
        .load()
    )
    assert df.count() == 6
    assert df.rdd.getNumPartitions() == 2  # 4 ids / batch_size 2
    row = df.filter("sensor_id = 101 AND value = 1.0").first()
    assert row["parameter"] == "pm25"
    assert row["datetime"] == "2026-01-01T01:00:00Z"

    # feeds the standard pipeline: parse + partition columns work on it
    from openaq_data_pipeline_engineering_spark.operators.parse import (
        parse_datetime,
        with_partition_columns,
    )

    parsed = with_partition_columns(parse_datetime(df, "datetime"), "datetime")
    assert parsed.filter("year = '2026'").count() == 6


def _page(dirpath: str, sensor_id: int, page: int, values: list[float], **extra) -> None:
    payload = {
        "status": 200,
        "results": [
            {
                "value": v,
                "parameter": {"name": "pm25", "units": "µg/m³"},
                "period": {"datetimeFrom": {"utc": "2026-01-01T00:00:00Z"}},
            }
            for v in values
        ],
        **extra,
    }
    with open(os.path.join(dirpath, f"{sensor_id}.page{page}.json"), "w") as f:
        json.dump(payload, f)


def test_api_datasource_paginates_until_empty(spark, tmp_path):
    """Reference page loop (etls/openaq_etl.py:68-105): page 1, 2, ...
    until a page comes back empty; all pages' rows land in the frame."""
    fixtures = str(tmp_path / "paged")
    os.makedirs(fixtures)
    _page(fixtures, 201, 1, [1.0, 2.0])
    _page(fixtures, 201, 2, [3.0])
    # no page3 file → empty page → pagination complete

    spark.dataSource.register(OpenAQApiDataSource)
    df = (
        spark.read.format("openaq_api")
        .option("fixtures_path", fixtures)
        .option("sensor_ids", "201")
        .load()
    )
    assert sorted(r["value"] for r in df.collect()) == [1.0, 2.0, 3.0]


def test_api_datasource_skips_failed_sensor_keeps_rest(spark, tmp_path):
    """Reference skip semantics (etls/openaq_etl.py:222-257): a sensor
    that errors (non-retryable 404 here) is dropped; the batch survives."""
    fixtures = str(tmp_path / "skip")
    os.makedirs(fixtures)
    _page(fixtures, 301, 1, [1.0])
    _page(fixtures, 302, 1, [], status=404)  # hard failure → skip sensor
    _page(fixtures, 303, 1, [3.0])

    spark.dataSource.register(OpenAQApiDataSource)
    df = (
        spark.read.format("openaq_api")
        .option("fixtures_path", fixtures)
        .option("sensor_ids", "301,302,303")
        .option("batch_size", "3")  # all in ONE partition: skip is per-sensor
        .load()
    )
    rows = df.collect()
    assert sorted(r["sensor_id"] for r in rows) == [301, 303]


def test_api_datasource_retries_transient_then_succeeds(spark, tmp_path):
    """A 503 that clears within max_retries yields the sensor's rows."""
    fixtures = str(tmp_path / "retry")
    os.makedirs(fixtures)
    _page(fixtures, 401, 1, [7.0], fail_times=2, status=503)

    spark.dataSource.register(OpenAQApiDataSource)
    df = (
        spark.read.format("openaq_api")
        .option("fixtures_path", fixtures)
        .option("sensor_ids", "401")
        .option("max_retries", "2")
        .option("backoff_seconds", "0.001")
        .load()
    )
    assert [r["value"] for r in df.collect()] == [7.0]


def test_api_datasource_exhausted_retries_skip_sensor(spark, tmp_path):
    fixtures = str(tmp_path / "exhaust")
    os.makedirs(fixtures)
    _page(fixtures, 501, 1, [9.0], fail_times=5, status=503)
    _page(fixtures, 502, 1, [2.0])

    spark.dataSource.register(OpenAQApiDataSource)
    df = (
        spark.read.format("openaq_api")
        .option("fixtures_path", fixtures)
        .option("sensor_ids", "501,502")
        .option("batch_size", "2")
        .option("max_retries", "1")
        .option("backoff_seconds", "0.001")
        .load()
    )
    assert [r["sensor_id"] for r in df.collect()] == [502]


def test_fetch_backoff_schedule_and_page_loop(tmp_path):
    """Unit-level: exponential backoff sleeps, then the page loop resumes."""
    from openaq_data_pipeline_engineering_spark.sources.api_datasource import (
        FixtureTransport,
        fetch_sensor_measurements,
    )

    fixtures = str(tmp_path)
    _page(fixtures, 601, 1, [1.0], fail_times=2, status=429)
    _page(fixtures, 601, 2, [2.0])

    sleeps: list[float] = []
    recs = list(
        fetch_sensor_measurements(
            FixtureTransport(fixtures), 601,
            max_retries=3, backoff_seconds=0.5, sleep=sleeps.append,
        )
    )
    assert [r["value"] for r in recs] == [1.0, 2.0]
    assert sleeps == [0.5, 1.0]  # 0.5 * 2**attempt, two transient failures


def test_api_datasource_streaming_pages_as_microbatches(spark, tmp_path):
    """Each micro-batch delivers one page across all sensors; the
    cursor stops advancing at the first empty page."""
    from openaq_data_pipeline_engineering_spark.sources.api_datasource import (
        OpenAQApiDataSource,
    )

    fixtures = str(tmp_path / "stream")
    os.makedirs(fixtures)
    _page(fixtures, 401, 1, [1.0, 2.0])
    _page(fixtures, 401, 2, [3.0])
    _page(fixtures, 402, 1, [10.0])

    spark.dataSource.register(OpenAQApiDataSource)
    q = (
        spark.readStream.format("openaq_api")
        .option("fixtures_path", fixtures)
        .option("sensor_ids", "401,402")
        .load()
        .writeStream.format("memory")
        .queryName("api_stream")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .start()
    )
    import time as _t

    deadline = _t.time() + 120
    while _t.time() < deadline:
        if spark.sql("SELECT count(*) FROM api_stream").collect()[0][0] >= 4:
            break
        _t.sleep(0.5)
    q.stop()
    rows = spark.sql(
        "SELECT sensor_id, value FROM api_stream ORDER BY sensor_id, value"
    ).collect()
    assert [(r["sensor_id"], r["value"]) for r in rows] == [
        (401, 1.0),
        (401, 2.0),
        (401, 3.0),
        (402, 10.0),
    ]


def test_api_stream_reader_replay_is_exact(tmp_path):
    """readBetweenOffsets re-fetches a committed range identically —
    the recovery property Structured Streaming relies on."""
    from openaq_data_pipeline_engineering_spark.sources.api_datasource import (
        OpenAQApiStreamReader,
    )

    fixtures = str(tmp_path / "replay")
    os.makedirs(fixtures)
    _page(fixtures, 501, 1, [1.0])
    _page(fixtures, 501, 2, [2.0])

    import pyarrow as pa

    def rows_of(batches) -> list[tuple]:
        # the reader hands Spark Arrow RecordBatches (columnar
        # exchange); flatten back to tuples for value assertions
        out: list[tuple] = []
        for b in batches:
            assert isinstance(b, pa.RecordBatch)
            out.extend(tuple(d.values()) for d in b.to_pylist())
        return out

    r = OpenAQApiStreamReader(
        {"fixtures_path": fixtures, "sensor_ids": "501"}
    )
    assert r.initialOffset() == {"page": 1}
    batches1, off1 = r.read({"page": 1})
    rows1 = rows_of(batches1)
    assert off1 == {"page": 2} and len(rows1) == 1
    batches2, off2 = r.read(off1)
    assert off2 == {"page": 3} and len(rows_of(batches2)) == 1
    # empty page: offset must NOT advance
    batches3, off3 = r.read(off2)
    assert off3 == {"page": 3} and list(batches3) == []
    replay = rows_of(r.readBetweenOffsets({"page": 1}, {"page": 3}))
    assert replay == rows1 + [(501, replay[1][1], "pm25", replay[1][3], 2.0)]
    assert len(replay) == 2


def test_custom_ndjson_archive_writer(spark, tmp_path):
    """Spark 4 Python DataSource WRITE path: per-partition NDJSON part
    files with tmp-then-rename commit (abort leaves nothing visible)."""
    import json
    import os

    from openaq_data_pipeline_engineering_spark.sources.api_datasource import (
        register_archive_sink,
    )
    from openaq_data_pipeline_engineering_spark.sources.star import load_table

    register_archive_sink(spark)
    out = str(tmp_path / "archive")
    nation = load_table(spark, "/root/testdata/sf0.001", "nation").select(
        "n_nationkey", "n_name"
    )
    nation.repartition(3).write.format("ndjson_archive").option(
        "path", out
    ).mode("append").save()
    files = sorted(os.listdir(out))
    assert files and all(f.endswith(".json") for f in files)
    rows = []
    for f in files:
        with open(os.path.join(out, f)) as fh:
            rows += [json.loads(line) for line in fh]
    assert sorted(r["n_nationkey"] for r in rows) == list(range(25))
