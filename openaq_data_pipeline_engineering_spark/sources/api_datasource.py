"""Spark 4 Python DataSource for paginated per-sensor API extraction.

The reference fetches OpenAQ v3 measurements with a sequential
driver-side loop over sensors (etls/openaq_etl.py:185-260,
lambda_functions/openaq_fetcher/extract_api.py:193-268): one process,
one sensor at a time — 30-40 min per backfill month
(doc/archive/historical_backfill_2025_plan.md:352-359). The scale path
is to make the *fetch itself* a Spark data source: each input partition
owns a batch of sensor ids, executors fetch in parallel, and the result
is a plain DataFrame feeding the normal pipeline.

Fetch semantics ported from the reference:

- **paginate-until-empty** per sensor (etls/openaq_etl.py:68-105 does
  this for /locations; the same loop shape applied to measurements):
  request page 1, 2, ... until a page returns no results.
- **per-sensor failure skip** (etls/openaq_etl.py:222-257): a non-200
  response or any exception while fetching one sensor skips THAT sensor
  and continues with the rest — a batch never fails because one sensor
  is down.
- **bounded retry with backoff** on transient statuses (429/5xx) before
  declaring a sensor failed — an engine addition the reference's
  single-shot requests lack; sleep is injectable so tests don't wait.

The HTTP transport is pluggable and defaulted to a local-fixture
transport because live HTTP is out of correctness scope (SURVEY §7.4)
and no HTTP client ships in this container. Swapping FixtureTransport
for a requests-based one changes nothing else — partition planning,
schema, page loop, retry, and skip behavior are the production shape.

Fixture layout (per sensor id):

- ``{sid}.page{N}.json`` — API-shaped page payload:
  ``{"status": 200, "results": [...]}``. Optional ``"fail_times": K``
  makes the first K attempts return ``status`` (simulating a transient
  error) and subsequent attempts succeed with ``results``.
- ``{sid}.json`` — legacy single-page NDJSON (one measurement per line).
- no file — sensor yields no rows (reference: empty results → skip).

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
import time
from collections.abc import Callable, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

# Long measurement shape (reference doc/GLUE_JOBS_GUIDE.md:111-132 +
# Lambda extras extract_api.py:311-318): one row per reading.
API_DS_SCHEMA = (
    "sensor_id bigint, datetime string, parameter string, "
    "unit string, value double"
)

# Transient statuses worth retrying; anything else non-200 fails the
# sensor immediately (reference treats every non-200 as skip).
RETRYABLE_STATUSES = frozenset({429, 500, 502, 503, 504})

# Rows per Arrow RecordBatch on the Python→JVM exchange. The fetch
# itself is network-bound, but the HANDOFF need not be row-at-a-time:
# buffered rows flush as one columnar batch (VERDICT r8 #1).
ARROW_BATCH_ROWS = 4096


def _measurement_rows_to_batches(rows: Iterator[tuple]) -> Iterator:
    """Buffer (sensor_id, datetime, parameter, unit, value) tuples and
    yield them as ``pyarrow.RecordBatch`` chunks matching
    :data:`API_DS_SCHEMA` — one Arrow exchange per ~4k rows instead of
    one pickled tuple per measurement. Rows fetched before a sensor
    failure are already buffered, so per-sensor skip semantics are
    unchanged."""
    import pyarrow as pa

    schema = pa.schema(
        [
            ("sensor_id", pa.int64()),
            ("datetime", pa.string()),
            ("parameter", pa.string()),
            ("unit", pa.string()),
            ("value", pa.float64()),
        ]
    )

    buf: list[tuple] = []
    for row in rows:
        buf.append(row)
        if len(buf) >= ARROW_BATCH_ROWS:
            yield pa.RecordBatch.from_arrays(
                [pa.array(col, type=f.type) for col, f in zip(zip(*buf), schema)],
                schema=schema,
            )
            buf = []
    if buf:
        yield pa.RecordBatch.from_arrays(
            [pa.array(col, type=f.type) for col, f in zip(zip(*buf), schema)],
            schema=schema,
        )


class SensorFetchError(Exception):
    """A sensor's fetch failed after retries; caller skips the sensor."""


class _SensorBatch(InputPartition):
    def __init__(self, sensor_ids: list[int]):
        self.sensor_ids = sensor_ids


class FixtureTransport:
    """File-backed stand-in for ``GET /v3/sensors/{id}/measurements``.

    Stateful only for ``fail_times`` simulation: attempt counts live in
    this instance (one per executor task), mirroring how a real
    transient error clears on retry within the same request loop.
    """

    def __init__(self, root: str):
        self.root = root
        self._attempts: dict[tuple[int, int], int] = {}

    def get_measurements(self, sensor_id: int, page: int) -> tuple[int, list[dict]]:
        """Return (status_code, results) for one page of one sensor."""
        paged = os.path.join(self.root, f"{sensor_id}.page{page}.json")
        if os.path.exists(paged):
            with open(paged) as f:
                payload = json.load(f)
            fail_times = int(payload.get("fail_times", 0))
            key = (sensor_id, page)
            attempt = self._attempts.get(key, 0)
            self._attempts[key] = attempt + 1
            if attempt < fail_times:
                return int(payload.get("status", 503)), []
            if fail_times:
                return 200, payload.get("results", [])
            return int(payload.get("status", 200)), payload.get("results", [])
        if page == 1:
            legacy = os.path.join(self.root, f"{sensor_id}.json")
            if os.path.exists(legacy):
                with open(legacy) as f:
                    return 200, [
                        json.loads(line) for line in f if line.strip()
                    ]
        return 200, []  # past the last page → pagination complete


def _get_page_with_retry(
    transport: FixtureTransport,
    sensor_id: int,
    page: int,
    max_retries: int,
    backoff_seconds: float,
    sleep: Callable[[float], None],
) -> list[dict]:
    """One page fetch with bounded exponential backoff on 429/5xx."""
    for attempt in range(max_retries + 1):
        status, results = transport.get_measurements(sensor_id, page)
        if status == 200:
            return results
        if status not in RETRYABLE_STATUSES or attempt == max_retries:
            raise SensorFetchError(
                f"sensor {sensor_id} page {page}: HTTP {status}"
            )
        sleep(backoff_seconds * (2**attempt))
    raise SensorFetchError(f"sensor {sensor_id} page {page}: retries exhausted")


def fetch_sensor_measurements(
    transport: FixtureTransport,
    sensor_id: int,
    max_retries: int = 2,
    backoff_seconds: float = 0.1,
    sleep: Callable[[float], None] = time.sleep,
) -> Iterator[dict]:
    """Paginate one sensor's measurements until an empty page
    (reference etls/openaq_etl.py:68-105 loop shape). Raises
    SensorFetchError on a non-retryable/exhausted failure — the caller
    decides whether that skips the sensor."""
    page = 1
    while True:
        results = _get_page_with_retry(
            transport, sensor_id, page, max_retries, backoff_seconds, sleep
        )
        if not results:
            return
        yield from results
        page += 1


class OpenAQApiReader(DataSourceReader):
    def __init__(self, options: dict):
        self.fixtures_path = options.get("fixtures_path", "")
        ids = options.get("sensor_ids", "")
        self.sensor_ids = [int(s) for s in ids.split(",") if s.strip()]
        self.batch_size = int(options.get("batch_size", "50"))
        self.max_retries = int(options.get("max_retries", "2"))
        self.backoff_seconds = float(options.get("backoff_seconds", "0.1"))

    def partitions(self) -> list[InputPartition]:
        """One partition per sensor batch — fetch parallelism scales
        with executors, not with one driver loop."""
        b = self.batch_size
        return [
            _SensorBatch(self.sensor_ids[i : i + b])
            for i in range(0, len(self.sensor_ids), b)
        ] or [_SensorBatch([])]

    def read(self, partition: _SensorBatch) -> Iterator:
        # Arrow-batched handoff: the row generator below is consumed by
        # _measurement_rows_to_batches, so the Python→JVM exchange is
        # columnar even though the fetch itself is per-record JSON.
        return _measurement_rows_to_batches(self._fetch_rows(partition))

    def _fetch_rows(self, partition: _SensorBatch) -> Iterator[tuple]:
        transport = FixtureTransport(self.fixtures_path)
        for sid in partition.sensor_ids:
            try:
                for rec in fetch_sensor_measurements(
                    transport, sid, self.max_retries, self.backoff_seconds
                ):
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
            except Exception:
                # Per-sensor failure skip (reference etls/openaq_etl.py:
                # 255-257): one bad sensor never fails the batch. Rows
                # already yielded for this sensor stay, matching the
                # reference's per-measurement appends.
                continue


class OpenAQApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "openaq_api"

    def schema(self) -> str:
        return API_DS_SCHEMA

    def reader(self, schema) -> OpenAQApiReader:
        return OpenAQApiReader(self.options)

    def simpleStreamReader(self, schema) -> "OpenAQApiStreamReader":
        return OpenAQApiStreamReader(self.options)


class OpenAQApiStreamReader(SimpleDataSourceStreamReader):
    """Incremental page-cursor stream over the same paginated API.

    Offset model: ``{"page": N}`` — micro-batch K reads page K of EVERY
    configured sensor (the hourly-drop shape of the reference's
    incremental extract, etls/openaq_etl.py:185-260, one page per
    delivery). A page fetch is deterministic given the fixture state,
    so ``readBetweenOffsets`` replays any [start, end) range exactly —
    the property Structured Streaming needs to recover a failed batch
    without duplicating or dropping rows.

    Per-sensor failure skip matches the batch reader: one bad sensor
    never fails the micro-batch.
    """

    def __init__(self, options: dict):
        self.fixtures_path = options.get("fixtures_path", "")
        ids = options.get("sensor_ids", "")
        self.sensor_ids = [int(s) for s in ids.split(",") if s.strip()]
        self.max_retries = int(options.get("max_retries", "2"))
        self.backoff_seconds = float(options.get("backoff_seconds", "0.1"))

    def initialOffset(self) -> dict:
        return {"page": 1}

    def _read_page(self, page: int) -> Iterator[tuple]:
        transport = FixtureTransport(self.fixtures_path)
        for sid in self.sensor_ids:
            try:
                results = _get_page_with_retry(
                    transport, sid, page,
                    self.max_retries, self.backoff_seconds, time.sleep,
                )
            except Exception:
                continue  # per-sensor skip, as in the batch reader
            for rec in results:
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

    def read(self, start: dict) -> tuple[Iterator, dict]:
        page = int(start.get("page", 1))
        rows = list(self._read_page(page))
        if not rows:
            # Nothing new arrived: stay on this offset so the cursor
            # advances only past pages that actually existed.
            return iter([]), {"page": page}
        # Materialized page → Arrow batches: the prefetch cache then
        # holds a LIST iterator of RecordBatches (copyable, as the
        # engine's cache-replay requires) and the exchange is columnar.
        batches = list(_measurement_rows_to_batches(iter(rows)))
        return iter(batches), {"page": page + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator:
        def rows() -> Iterator[tuple]:
            for page in range(
                int(start.get("page", 1)), int(end.get("page", 1))
            ):
                yield from self._read_page(page)

        return _measurement_rows_to_batches(rows())

    def commit(self, end: dict) -> None:
        pass  # fixtures are immutable; nothing to release


# ---------------------------------------------------------------------------
# Custom WRITE path (Spark 4 Python DataSource writer): the archive-sink
# twin of the reader above — each partition writes one NDJSON part file
# and reports rows written back to the driver commit. Mirrors the
# reference's wrapped-JSON archive sink (reference utils/s3_uploader.py
# write path) as a pluggable `df.write.format(...)` target instead of a
# helper function; commit/abort hooks give it the all-or-nothing
# contract the helper lacked.
# ---------------------------------------------------------------------------
def register_archive_sink(spark) -> None:
    """Register the `ndjson_archive` write format on this session."""
    spark.dataSource.register(NdjsonArchiveDataSource)


class _WriteResult(WriterCommitMessage):
    def __init__(self, path: str, rows: int) -> None:
        self.path = path
        self.rows = rows


class NdjsonArchiveWriter(DataSourceWriter):
    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ndjson_archive requires a path option")

    def write(self, iterator):
        import json as _json
        import os as _os
        import uuid as _uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        _os.makedirs(self.path, exist_ok=True)
        # unique name per attempt: a retried task never half-overwrites
        part = _os.path.join(
            self.path, f"part-{pid:05d}-{_uuid.uuid4().hex}.json.tmp"
        )
        n = 0
        with open(part, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        return _WriteResult(part, n)

    def commit(self, messages):
        import os as _os

        # finalize: tmp -> visible, atomically per part
        for m in messages:
            _os.replace(m.path, m.path[: -len(".tmp")])

    def abort(self, messages):
        import os as _os

        for m in messages:
            try:
                _os.remove(m.path)
            except OSError:
                pass


class NdjsonArchiveDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ndjson_archive"

    def writer(self, schema, overwrite: bool) -> NdjsonArchiveWriter:
        return NdjsonArchiveWriter(self.options)
