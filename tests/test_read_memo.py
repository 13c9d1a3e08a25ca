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


class TestFilesetReadMemo:
    """r13: the memo extends to FILESET version directories (after a
    table's first COW commit every later statement resolves fileset
    versions 4x per statement)."""

    def _fileset_version(self, spark, tmp_path):
        """A v=2 fileset version referencing v=1's single data file."""
        from openaq_data_pipeline_engineering_spark.operators.filesets import (
            version_files_with_rels,
            write_fileset,
        )

        root = str(tmp_path / "t")
        v1 = os.path.join(root, "v=1")
        _write_dir(spark, v1, [1, 2, 3])
        v2 = os.path.join(root, "v=2")
        os.makedirs(v2)
        entries = [
            {"v": 1, "rel": rel, "size": os.path.getsize(p)}
            for p, rel in version_files_with_rels(v1)
        ]
        schema = spark.read.parquet(v1).schema.jsonValue()
        write_fileset(v2, [], schema, entries)
        return v2

    def test_same_content_hits_memo(self, spark, tmp_path):
        v2 = self._fileset_version(spark, tmp_path)
        df1 = read_version_dir(spark, v2)
        df2 = read_version_dir(spark, v2)
        assert df1 is df2
        assert df2.count() == 3
        # file_col variant is its own entry (grouped builds need it
        # materialized per owner group) but also memoizes
        fc1 = read_version_dir(spark, v2, file_col="__f")
        fc2 = read_version_dir(spark, v2, file_col="__f")
        assert fc1 is fc2 and fc1 is not df1
        assert fc1.filter(F.col("__f").isNotNull()).count() == 3

    def test_sidecar_rewrite_invalidates(self, spark, tmp_path):
        from openaq_data_pipeline_engineering_spark.operators.filesets import (
            FILESET_SIDECAR,
        )

        v2 = self._fileset_version(spark, tmp_path)
        df1 = read_version_dir(spark, v2)
        assert df1.count() == 3
        # rewrite the sidecar (same path, new mtime/content) -> miss
        sc = os.path.join(v2, FILESET_SIDECAR)
        body = open(sc).read()
        time.sleep(0.01)
        open(sc, "w").write(body)
        df2 = read_version_dir(spark, v2)
        assert df1 is not df2
        assert df2.count() == 3

    def test_referenced_owner_file_mutation_invalidates(
        self, spark, tmp_path
    ):
        v2 = self._fileset_version(spark, tmp_path)
        df1 = read_version_dir(spark, v2)
        assert df1.count() == 3
        # touch the REFERENCED owner file (vacuum/purge shape): the
        # fingerprint covers resolved entries, so the memo must miss
        v1 = os.path.join(os.path.dirname(v2), "v=1")
        f = next(
            os.path.join(v1, n)
            for n in os.listdir(v1)
            if n.endswith(".parquet")
        )
        os.utime(f, ns=(time.time_ns(), time.time_ns()))
        df2 = read_version_dir(spark, v2)
        assert df1 is not df2
