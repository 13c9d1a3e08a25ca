"""Partition-value spelling must survive a read→rewrite round trip.

A plain ``spark.read.parquet`` type-INFERS Hive partition values, so a
zero-padded string partition (``m=01`` — the mart's own y/m/d layout,
plans/mart.py lpad) reads back as int 1. A maintenance rewrite built on
that read then lands in ``m=1`` NEXT TO the live ``m=01``:

- the partitioned ZORDER rewrite swaps the staged ``m=1`` in as a NEW
  directory while ``m=01`` keeps its old files — every row duplicated;
- compaction's dynamic overwrite replaces only ``m=1`` — same outcome.

plans/incremental.py always guarded this with an explicit schema;
OPTIMIZE/compact now route through
operators/compact.read_preserving_partitions (partition columns pinned
to STRING so directory names round-trip verbatim for every value
spelling). These tests pin the fix for all three statement forms plus
the helper itself; canonical int spellings (``p=1``) are covered by the
pre-existing OPTIMIZE suites.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.operators.sqlutil import (
    execute_optimize,
)


def _padded_table(spark, path: str) -> None:
    df = spark.range(120).select(
        F.col("id").alias("v"),
        (F.col("id") % 89).alias("a"),
        F.lpad((F.col("id") % 3 + 1).cast("string"), 2, "0").alias("m"),
    )
    df.repartition(6).write.partitionBy("m").parquet(path)


def _dirs(path: str) -> set[str]:
    return {d for d in os.listdir(path) if d.startswith("m=")}


def _content(spark, path: str) -> set[tuple]:
    # read the partition column as string so the assertion itself is
    # spelling-sensitive ("01" != "1")
    df = spark.read.parquet(path)
    return {
        tuple(r)
        for r in df.select("v", "a", df["m"].cast("string")).collect()
    }


class TestPaddedPartitionRewrites:
    def test_zorder_rewrite_preserves_padded_partition_dirs(
        self, spark, tmp_path
    ):
        out = str(tmp_path / "t1")
        _padded_table(spark, out)
        before_dirs, n = _dirs(out), spark.read.parquet(out).count()
        assert before_dirs == {"m=01", "m=02", "m=03"}
        execute_optimize(spark, f"OPTIMIZE '{out}' ZORDER BY (v, a)")
        assert _dirs(out) == before_dirs  # no m=1 twins
        assert spark.read.parquet(out).count() == n  # no duplication

    def test_compaction_preserves_padded_partition_dirs(
        self, spark, tmp_path
    ):
        out = str(tmp_path / "t2")
        _padded_table(spark, out)
        before_dirs, before = _dirs(out), _content(spark, out)
        execute_optimize(spark, f"OPTIMIZE '{out}'")
        assert _dirs(out) == before_dirs
        assert _content(spark, out) == before

    def test_where_selected_partition_rewrites_in_place(
        self, spark, tmp_path
    ):
        out = str(tmp_path / "t3")
        _padded_table(spark, out)
        before_dirs, before = _dirs(out), _content(spark, out)
        execute_optimize(
            spark, f"OPTIMIZE '{out}' WHERE m = '02' ZORDER BY (v)"
        )
        assert _dirs(out) == before_dirs
        assert _content(spark, out) == before

    def test_helper_reads_raw_directory_values(self, spark, tmp_path):
        from openaq_data_pipeline_engineering_spark.operators.compact import (
            read_preserving_partitions,
        )

        out = str(tmp_path / "t4")
        _padded_table(spark, out)
        df = read_preserving_partitions(spark, out, ["m"])
        assert dict(df.dtypes)["m"] == "string"
        assert {r.m for r in df.select("m").distinct().collect()} == {
            "01",
            "02",
            "03",
        }
        # data columns keep their footer types
        assert dict(df.dtypes)["v"] == "bigint"

    def test_canonical_int_partitions_unchanged(self, spark, tmp_path):
        """The string pin is spelling-neutral: canonical int dirs
        (p=0..2) round-trip to the same names and the same content."""
        out = str(tmp_path / "t5")
        df = spark.range(90).select(
            F.col("id").alias("v"), (F.col("id") % 3).alias("p")
        )
        df.repartition(4).write.partitionBy("p").parquet(out)
        before = {d for d in os.listdir(out) if d.startswith("p=")}
        n = spark.read.parquet(out).count()
        execute_optimize(spark, f"OPTIMIZE '{out}' ZORDER BY (v)")
        assert {d for d in os.listdir(out) if d.startswith("p=")} == before
        assert spark.read.parquet(out).count() == n
