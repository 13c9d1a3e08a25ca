"""Spark 4 Python DataSource for paginated per-sensor API extraction.

The reference fetches OpenAQ v3 measurements with a sequential
driver-side loop over sensors (etls/openaq_etl.py:185-260,
lambda_functions/openaq_fetcher/extract_api.py:193-268): one process,
one sensor at a time, rate-limit sleeps — 30-40 min per backfill month
(doc/archive/historical_backfill_2025_plan.md:352-359). The scale path
is to make the *fetch itself* a Spark data source: each input partition
owns a batch of sensor ids, executors fetch in parallel, and the result
is a plain DataFrame feeding the normal pipeline.

The HTTP transport is pluggable and defaulted to a local-fixture
transport (one ``{sensor_id}.json`` NDJSON file per sensor) because
live HTTP is out of correctness scope (SURVEY §7.4) and no HTTP client
ships in this container. Swapping ``_fetch_sensor`` for a real
requests-based pager changes nothing else — partition planning,
schema, and executor-side iteration are the production shape.

Usage::

    spark.dataSource.register(OpenAQApiDataSource)
    df = (spark.read.format("openaq_api")
          .option("fixtures_path", "/path/to/dir")
          .option("sensor_ids", "101,102,103")
          .option("batch_size", "50")
          .load())
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# Long measurement shape (reference doc/GLUE_JOBS_GUIDE.md:111-132 +
# Lambda extras extract_api.py:311-318): one row per reading.
API_DS_SCHEMA = (
    "sensor_id bigint, datetime string, parameter string, "
    "unit string, value double"
)


class _SensorBatch(InputPartition):
    def __init__(self, sensor_ids: list[int]):
        self.sensor_ids = sensor_ids


def _fetch_sensor(fixtures_path: str, sensor_id: int) -> Iterator[dict]:
    """Fixture transport: NDJSON file per sensor. A live transport pages
    GET /v3/sensors/{id}/measurements here instead; failures skip the
    sensor (reference behavior, etls/openaq_etl.py:250-256)."""
    path = os.path.join(fixtures_path, f"{sensor_id}.json")
    if not os.path.exists(path):
        return
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                yield json.loads(line)


class OpenAQApiReader(DataSourceReader):
    def __init__(self, options: dict):
        self.fixtures_path = options.get("fixtures_path", "")
        ids = options.get("sensor_ids", "")
        self.sensor_ids = [int(s) for s in ids.split(",") if s.strip()]
        self.batch_size = int(options.get("batch_size", "50"))

    def partitions(self) -> list[InputPartition]:
        """One partition per sensor batch — fetch parallelism scales
        with executors, not with one driver loop."""
        b = self.batch_size
        return [
            _SensorBatch(self.sensor_ids[i : i + b])
            for i in range(0, len(self.sensor_ids), b)
        ] or [_SensorBatch([])]

    def read(self, partition: _SensorBatch) -> Iterator[tuple]:
        for sid in partition.sensor_ids:
            for rec in _fetch_sensor(self.fixtures_path, sid):
                p = rec.get("parameter") or {}
                period = rec.get("period") or {}
                dt_from = (period.get("datetimeFrom") or {}).get("utc")
                yield (
                    sid,
                    dt_from,
                    p.get("name"),
                    p.get("units"),
                    rec.get("value"),
                )


class OpenAQApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "openaq_api"

    def schema(self) -> str:
        return API_DS_SCHEMA

    def reader(self, schema) -> OpenAQApiReader:
        return OpenAQApiReader(self.options)
