"""Analyzed-read memo for plain version directories
(filesets.read_version_dir — round-12 optimization).

The memo reuses the analyzed DataFrame of an IMMUTABLE version
directory within one process (one DML statement resolves the same dir
4-5 times). These tests pin the two properties that make it safe:
same-content reads hit the memo, and ANY content mutation (new file,
rewrite, deletion) produces a fresh read with the new data.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.operators import filesets
from openaq_data_pipeline_engineering_spark.operators.filesets import (
    read_version_dir,
)


def _write_dir(spark, path: str, values) -> None:
    spark.createDataFrame(
        [(int(v),) for v in values], "k int"
    ).coalesce(1).write.mode("overwrite").parquet(path)


class TestReadVersionDirMemo:
    def test_same_content_hits_memo(self, spark, tmp_path):
        d = str(tmp_path / "v=0")
        _write_dir(spark, d, [1, 2, 3])
        df1 = read_version_dir(spark, d)
        df2 = read_version_dir(spark, d)
        assert df1 is df2  # identical analyzed frame, no re-inference
        assert df2.count() == 3

    def test_file_col_variant_is_a_distinct_entry(self, spark, tmp_path):
        d = str(tmp_path / "v=0")
        _write_dir(spark, d, [1, 2])
        plain = read_version_dir(spark, d)
        with_col = read_version_dir(spark, d, file_col="__f")
        assert plain is not with_col
        assert "__f" in with_col.columns and "__f" not in plain.columns
        assert with_col.filter(F.col("__f").isNotNull()).count() == 2

    def test_content_change_invalidates(self, spark, tmp_path):
        d = str(tmp_path / "v=0")
        _write_dir(spark, d, [1, 2, 3])
        df1 = read_version_dir(spark, d)
        assert df1.count() == 3
        # Overwrite with different content (new files, new sizes).
        _write_dir(spark, d, [10, 20, 30, 40])
        df2 = read_version_dir(spark, d)
        assert df2 is not df1
        assert df2.count() == 4
        assert {r["k"] for r in df2.collect()} == {10, 20, 30, 40}

    def test_same_size_touch_invalidates(self, spark, tmp_path):
        # mtime_ns participates in the fingerprint: even a byte-equal
        # rewrite (size unchanged) must not serve the stale frame.
        d = str(tmp_path / "v=0")
        _write_dir(spark, d, [5])
        df1 = read_version_dir(spark, d)
        assert df1.count() == 1
        data_file = next(
            os.path.join(d, f)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )
        t = time.time() + 10
        os.utime(data_file, (t, t))
        df2 = read_version_dir(spark, d)
        assert df2 is not df1

    def test_memo_is_lru_capped(self, spark, tmp_path):
        cap = filesets._DIR_READ_MEMO_CAP
        base = str(tmp_path / "many")
        for i in range(3):
            _write_dir(spark, os.path.join(base, f"v={i}"), [i])
            read_version_dir(spark, os.path.join(base, f"v={i}"))
        assert len(filesets._DIR_READ_MEMO) <= cap
