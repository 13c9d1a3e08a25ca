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
