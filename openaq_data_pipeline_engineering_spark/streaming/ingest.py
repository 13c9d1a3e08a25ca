"""Incremental ingest via Structured Streaming (SURVEY §2.9 / Slice 4).

The reference is batch-only; its streaming-adjacent semantics are hourly
raw drops re-delivered by overlapping 24h-lookback pulls, deduped in
batch and blind-appended (s3_uploader.py:126-131,
process_openaq_raw.py:253-255; "real-time" is an explicit future item,
doc/architecture.md:689). The Spark-native replacement:

- file-source ``readStream`` over the raw-zone directory, checkpointed —
  each file processed exactly once across runs (replaces the Airflow
  schedule + job-bookmark future item);
- ``withWatermark`` + ``dropDuplicatesWithinWatermark`` for re-delivered
  measurements (replaces the full-history window dedup, which at 100 TB
  would shuffle the world);
- ``Trigger.AvailableNow`` for catch-up batch runs on the same query.

At scale: state size is bounded by (keys within watermark), not total
history; file-source maxFilesPerTrigger throttles catch-up; the sink is
the same idempotent partitioned writer the batch path uses.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


def events_stream_spec(
    spark: SparkSession, sf_dir: str
) -> tuple[T.StructType, Callable[[DataFrame], DataFrame]]:
    """(schema, transform) for streaming over the driver's events table,
    adaptive to the parquet writer's physical ``ts`` type.

    The driver's testdata has shipped ``ts`` both as TIMESTAMP(MICROS)
    (reads natively as a timestamp) and as TIMESTAMP(NANOS) (readable
    only as int64 nanos under ``spark.sql.legacy.parquet.nanosAsLong``).
    A streaming read needs an explicit schema, so probe the batch
    footer once and mirror the file's own type; ``transform`` then
    normalizes to two columns every consumer can rely on:

    - ``ts``     TimestampType event time (session-UTC),
    - ``ts_us``  exact integer epoch microseconds (for arithmetic that
      must be bit-identical to a SQL oracle — no datediff semantics).
    """
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    schema = raw.schema
    ts_is_long = isinstance(schema["ts"].dataType, T.LongType)

    def transform(stream: DataFrame) -> DataFrame:
        if ts_is_long:
            # integer nanos → micros (floor division: DuckDB's ns→us
            # truncation semantics; double math would lose precision)
            return stream.withColumn(
                "ts_us", F.expr("ts DIV 1000")
            ).withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        return stream.withColumn(
            "ts", F.col("ts").cast(T.TimestampType())
        ).withColumn("ts_us", F.unix_micros("ts"))

    return schema, transform


def events_stream_reader(
    spark: SparkSession,
    schema: T.StructType,
    sf_dir: str,
    table: str = "events",
) -> DataFrame:
    """Layout-adaptive streaming read of a driver table.

    The file-stream source needs a DIRECTORY to monitor, so a
    single-file table (``<sf_dir>/events.parquet`` as one file — the
    driver's default layout) streams from ``sf_dir`` with a name glob.
    A directory-layout table (Spark-written: the x32 replica, the
    layout3 differential) streams from the table directory itself — a
    name glob against ``sf_dir`` would match NOTHING there (the data
    lives in ``part-*.parquet`` inside), silently reading zero rows
    (round-8 streaming probe finding).
    """
    p = os.path.join(sf_dir, f"{table}.parquet")
    reader = spark.readStream.format("parquet").schema(schema)
    if os.path.isdir(p):
        return reader.load(p)
    return reader.option("pathGlobFilter", f"{table}.parquet").load(sf_dir)


def bounded_state_partitions(
    spark: SparkSession,
    source: str,
    table: str | None = None,
    bytes_per_partition: int = 32 << 20,
    floor: int = 2,
) -> int:
    """Scale-adaptive shuffle/state partition count for a BOUNDED
    (``availableNow``) stateful run — guide §2: derive partitioning
    from input size, never a constant tuned for one scale.

    Stateful operators pay a per-partition FIXED cost per micro-batch
    (a state-store instance plus its delta/commit files): on the
    sf0.1 outer-attribution join, 8 fixed partitions measured 4.0 s
    vs 2.6 s at 4 and 2.35 s at 2, identical results — while the same
    fixed 8 would under-partition a real catch-up replay (a 1 TB drop
    squeezed through 8 stores). Size to the bytes this bounded run
    pushes through state: ``ceil(input_bytes / 32 MiB compressed)``
    (state within the watermark is a bounded multiple of a bounded
    input), floored at ``floor`` (keys hash across stores, so 2 keeps
    tiny inputs skew-tolerant), capped at 4× ``defaultParallelism`` —
    the cap, not the byte term, is what grows on a 1000-executor
    cluster. UNBOUNDED production streams should size to steady-state
    key cardinality within the watermark instead; every declared
    streaming query here is the bounded-replay shape.

    ``source``/``table`` mirror :func:`events_stream_reader`: pass the
    sf_dir + table name for driver tables, or a drop directory alone.
    """
    path = (
        source if table is None else os.path.join(source, f"{table}.parquet")
    )
    nbytes = 0
    if os.path.isdir(path):
        for dirpath, _dirs, files in os.walk(path):
            nbytes += sum(
                os.path.getsize(os.path.join(dirpath, f))
                for f in files
                if not f.startswith(("_", "."))
            )
    elif os.path.exists(path):
        nbytes = os.path.getsize(path)
    cap = max(floor, spark.sparkContext.defaultParallelism * 4)
    return int(max(floor, min(cap, -(-nbytes // bytes_per_partition))))


@contextmanager
def scoped_shuffle_partitions(spark: SparkSession, n: int):
    """Temporarily pin ``spark.sql.shuffle.partitions`` for a bounded
    streaming run, restoring the caller's setting afterwards.

    Stateful streaming operators pay a PER-PARTITION fixed cost —
    state-store instances plus checkpoint files per micro-batch — that
    batch shuffles don't: a 32-partition stream-stream join maintains
    4×32 state stores and was measured ~5× slower than 8 partitions on
    the same bounded input. Stream state partitioning is fixed by this
    conf at FIRST query start (it persists in the checkpoint), so it
    must be chosen for the stream's state size, not inherited from the
    batch shuffle sizing; on a real cluster size it to state volume
    (key cardinality within the watermark), not to scan parallelism.
    """
    old = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        if old is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old)


def write_slice_files(
    df: DataFrame, slice_col: str, drop_dir: str, pin_order: bool = True
) -> None:
    """One-pass micro-batch slice prep (optimization round 12).

    The forced-micro-batch witnesses drop N parquet files and replay
    them with ``maxFilesPerTrigger=1``. Writing each slice as its own
    filtered ``coalesce(1)`` job re-scans the source N times; this
    writes every slice in ONE scan+shuffle via ``partitionBy`` —
    ``repartition(slice_col)`` guarantees each slice value lives in
    exactly one task, so each ``<slice_col>=<v>/`` directory holds
    exactly one data file and the file count (= micro-batch count) is
    unchanged. The partition column is dropped from the data files,
    matching the previous per-slice writes. An EMPTY slice produces no
    directory (previously: one empty file) — one fewer no-op
    micro-batch, identical results.

    ``pin_order=True`` stamps ascending mtimes in slice-value order so
    the file-source replays slices in that order (the sessionization
    witness needs nondecreasing event time across batches); callers
    appending sentinel files after the slices should stamp them with
    ``slice_mtime(i)`` for later indices.
    """
    (
        df.repartition(slice_col)
        .write.mode("overwrite")
        .partitionBy(slice_col)
        .parquet(drop_dir)
    )
    if pin_order:
        vals = sorted(
            (e for e in os.listdir(drop_dir) if e.startswith(f"{slice_col}=")),
            key=lambda e: float(e.split("=", 1)[1]),
        )
        for i, ent in enumerate(vals):
            d = os.path.join(drop_dir, ent)
            for f in os.listdir(d):
                if not f.startswith("_"):
                    t = slice_mtime(i)
                    os.utime(os.path.join(d, f), (t, t))


_SLICE_MTIME_BASE: float | None = None


def slice_mtime(index: int) -> float:
    """Deterministic-within-process ascending mtime for slice ``index``
    (30 s apart, anchored an hour in the past like the prior inline
    pinning)."""
    global _SLICE_MTIME_BASE
    if _SLICE_MTIME_BASE is None:
        import time as _time

        _SLICE_MTIME_BASE = _time.time() - 3600
    return _SLICE_MTIME_BASE + index * 30


def stream_dedup(
    stream: DataFrame,
    keys: list[str],
    ts_col: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked streaming dedup: one row per ``keys`` among rows whose
    event time is within ``watermark`` of the stream's max seen time."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def incremental_ingest(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    schema: T.StructType,
    keys: list[str],
    ts_col: str,
    transform=None,
    source_format: str = "json",
    watermark: str = "2 hours",
    path_glob: str | None = None,
) -> tuple[DataFrame, "StreamingQueryStarter"]:
    """Build the incremental pipeline; returns (deduped stream, starter).

    The starter runs the stream with ``Trigger.AvailableNow`` into an
    in-memory table or a parquet sink and blocks until complete — the
    batch-catchup execution mode that replaces the reference's daily DAG.
    ``source_dir`` must be a directory; use ``path_glob`` to select files.
    """
    reader = (
        spark.readStream.format(source_format)
        .schema(schema)
        .option("maxFilesPerTrigger", 1000)
    )
    if path_glob and os.path.isdir(os.path.join(source_dir, path_glob)):
        # Layout-adaptive (see events_stream_reader): a directory-layout
        # table is the monitored directory itself; the name glob would
        # match nothing inside it.
        source_dir = os.path.join(source_dir, path_glob)
        path_glob = None
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    stream = reader.load(source_dir)
    if transform is not None:
        stream = transform(stream)
    deduped = stream_dedup(stream, keys=keys, ts_col=ts_col, watermark=watermark)
    return deduped, StreamingQueryStarter(deduped, checkpoint_dir)


class StreamingQueryStarter:
    def __init__(self, df: DataFrame, checkpoint_dir: str) -> None:
        self.df = df
        self.checkpoint_dir = checkpoint_dir

    def run_available_now_to_memory(
        self, table_name: str, output_mode: str = "append"
    ) -> StreamingQuery:
        """Memory sink — scale caveat: append mode materializes every
        output row on the driver, so it is only for small results or
        tests; pre-aggregate in-stream (``output_mode='complete'``) so
        the driver holds the aggregate, not the firehose."""
        q = (
            self.df.writeStream.format("memory")
            .queryName(table_name)
            .outputMode(output_mode)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q

    def run_available_now_to_parquet(self, path: str) -> StreamingQuery:
        q = (
            self.df.writeStream.format("parquet")
            .option("path", path)
            .option("checkpointLocation", self.checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q


def windowed_counts(
    stream: DataFrame,
    ts_col: str,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: list[str] | None = None,
    slide: str | None = None,
) -> DataFrame:
    """Watermarked tumbling-window aggregation — the late-data-correct
    rollup for event streams.

    Late events inside the watermark update their (closed-in-flight)
    window; events later than the watermark are dropped, which bounds
    state to (windows within watermark) × (group values) regardless of
    stream length. Output in append mode emits each window once, when
    the watermark passes its end.
    """
    win = (
        F.window(ts_col, window_duration, slide)
        if slide
        else F.window(ts_col, window_duration)
    )
    keys = [win.alias("win")] + [F.col(c) for c in (group_cols or [])]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *(group_cols or []),
            "n",
            "sum_value",
        )
    )
