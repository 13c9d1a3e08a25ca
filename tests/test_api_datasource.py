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
