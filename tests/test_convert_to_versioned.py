"""CONVERT '<plain parquet dir>' TO VERSIONED — zero-copy adoption of
an existing table into the versioned protocol (Delta's CONVERT TO
DELTA shape: every top-level entry moves into ``v=1`` by one atomic
rename; the manifest then commits). Crash anywhere → rerunning the
conversion resumes it."""

from __future__ import annotations

import os

import pytest

from openaq_data_pipeline_engineering_spark.engine import Engine
from openaq_data_pipeline_engineering_spark.operators.versioned import (
    read_snapshot,
    snapshot_versions,
    versionize_table,
    write_snapshot,
)


def _rows(df):
    return {tuple(r) for r in df.collect()}


class TestConvertToVersioned:
    def test_flat_table_adopts_without_data_moves(self, spark, tmp_path):
        root = str(tmp_path / "flat")
        df = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
        )
        df.repartition(3).write.parquet(root)
        before = _rows(spark.read.parquet(root))
        inodes_before = {
            os.stat(os.path.join(root, f)).st_ino
            for f in os.listdir(root)
            if f.endswith(".parquet")
        }
        m = Engine(spark).sql(f"CONVERT '{root}' TO VERSIONED").first()
        assert m["version"] == 1 and m["n_rows"] == 3
        assert snapshot_versions(root) == [1]
        assert _rows(read_snapshot(spark, root)) == before
        # zero-copy: the same inodes now live under v=1
        v1 = os.path.join(root, "v=1")
        inodes_after = {
            os.stat(os.path.join(v1, f)).st_ino
            for f in os.listdir(v1)
            if f.endswith(".parquet")
        }
        assert inodes_after == inodes_before
        # no stray data left at the root: plain reads can't double-read
        assert not any(
            f.endswith(".parquet") for f in os.listdir(root)
        )
        # the adopted table is a first-class versioned root
        write_snapshot(
            spark.createDataFrame([(9, "z")], "k int, v string"), root
        )
        assert snapshot_versions(root) == [1, 2]
        assert _rows(read_snapshot(spark, root, version=1)) == before

    def test_partitioned_layout_is_preserved(self, spark, tmp_path):
        from pyspark.sql import functions as F

        root = str(tmp_path / "part")
        df = spark.range(60).select(
            F.col("id").alias("k"),
            F.lpad((F.col("id") % 3).cast("string"), 2, "0").alias("m"),
        )
        df.write.partitionBy("m").parquet(root)
        before = _rows(
            spark.read.parquet(root).select("k", F.col("m").cast("string"))
        )
        versionize_table(root)
        got = read_snapshot(spark, root)
        assert _rows(got.select("k", F.col("m").cast("string"))) == before
        # partition directory spellings survive under v=1
        assert sorted(
            d
            for d in os.listdir(os.path.join(root, "v=1"))
            if d.startswith("m=")
        ) == ["m=00", "m=01", "m=02"]

    def test_already_versioned_refuses(self, spark, tmp_path):
        root = str(tmp_path / "v")
        write_snapshot(
            spark.createDataFrame([(1, "a")], "k int, v string"), root
        )
        with pytest.raises(FileExistsError, match="already a versioned"):
            versionize_table(root)

    def test_empty_dir_refuses(self, spark, tmp_path):
        root = str(tmp_path / "empty")
        os.makedirs(root)
        with pytest.raises(FileNotFoundError, match="no parquet data"):
            versionize_table(root)

    def test_crashed_conversion_resumes(self, spark, tmp_path, monkeypatch):
        from openaq_data_pipeline_engineering_spark.operators import versioned

        root = str(tmp_path / "crash")
        df = spark.createDataFrame(
            [(1, "a"), (2, "b")], "k int, v string"
        )
        df.repartition(2).write.parquet(root)
        before = _rows(spark.read.parquet(root))

        # crash after the FIRST entry rename
        real_rename = os.rename
        calls = {"n": 0}

        def crashing(src, dst):
            real_rename(src, dst)
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected crash mid-move")

        monkeypatch.setattr(versioned.os, "rename", crashing)
        with pytest.raises(RuntimeError, match="injected crash"):
            versionize_table(root)
        monkeypatch.undo()
        assert snapshot_versions(root) == []  # nothing committed yet
        # rerun resumes: remaining entries move, the commit lands
        assert versionize_table(root) == 1
        assert _rows(read_snapshot(spark, root)) == before
        assert not os.path.exists(os.path.join(root, "v=1", "_CONVERTING"))

    def test_crash_after_commit_is_idempotently_healed(
        self, spark, tmp_path
    ):
        root = str(tmp_path / "crash2")
        spark.createDataFrame(
            [(1, "a")], "k int, v string"
        ).write.parquet(root)
        versionize_table(root)
        # simulate a crash that committed but left the marker behind
        marker = os.path.join(root, "v=1", "_CONVERTING")
        with open(marker, "w") as f:
            f.write("stale")
        assert versionize_table(root) == 1  # heals, reports success
        assert not os.path.exists(marker)
        with pytest.raises(FileExistsError):
            versionize_table(root)  # now a plain already-versioned error


class TestConversionSurvivesMaintenance:
    """A mid-conversion v=1 holds the adopted table's ONLY copy
    (entries were MOVED in, manifest not yet committed) — vacuum and
    purge must never treat it as a reclaimable crashed-writer orphan."""

    def _half_converted(self, spark, tmp_path, monkeypatch):
        from openaq_data_pipeline_engineering_spark.operators import versioned

        root = str(tmp_path / "half")
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "k int, v string"
        ).repartition(2).write.parquet(root)
        real_rename = os.rename
        calls = {"n": 0}

        def crashing(src, dst):
            real_rename(src, dst)
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected crash mid-move")

        monkeypatch.setattr(versioned.os, "rename", crashing)
        with pytest.raises(RuntimeError, match="injected crash"):
            versionize_table(root)
        monkeypatch.undo()
        return root

    def test_vacuum_never_reclaims_a_converting_dir(
        self, spark, tmp_path, monkeypatch
    ):
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            vacuum_snapshots,
        )

        root = self._half_converted(spark, tmp_path, monkeypatch)
        # even with zero grace (the aggressive maintenance setting),
        # the _CONVERTING dir survives
        vacuum_snapshots(root, keep_last=1, orphan_min_age_seconds=0.0)
        assert os.path.isdir(os.path.join(root, "v=1"))
        assert versionize_table(root) == 1  # conversion still resumable
        assert _rows(read_snapshot(spark, root)) == {(1, "a"), (2, "b")}

    def test_purge_refuses_on_a_converting_dir(
        self, spark, tmp_path, monkeypatch
    ):
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            purge_rows,
            write_snapshot,
        )

        root = self._half_converted(spark, tmp_path, monkeypatch)
        # commit an unrelated version so the root is purgeable at all
        write_snapshot(
            spark.createDataFrame([(9, "z")], "k int, v string"), root
        )
        with pytest.raises(RuntimeError, match="mid-conversion"):
            purge_rows(spark, root, "k = 1", orphan_min_age_seconds=0)
        # bounded-progress mode defers it with an explicit report
        res = purge_rows(
            spark,
            root,
            "k = 1",
            orphan_min_age_seconds=0,
            defer_young_orphans=True,
        )
        assert (-1, -1, -1) in res
        assert os.path.isdir(os.path.join(root, "v=1"))


class TestConversionConcurrency:
    def test_conversion_vs_first_writer_race_is_loud_or_serial(
        self, spark, tmp_path, monkeypatch
    ):
        """A writer committing its own first snapshot while a conversion
        is mid-move: the claim protocol forces the writer ABOVE v=1, so
        the adopted data lands at v1 (history) and the racer's snapshot
        is a later version — a serial order, never corruption. A writer
        that claimed v=1 FIRST makes the conversion refuse loudly."""
        from openaq_data_pipeline_engineering_spark.operators import versioned

        root = str(tmp_path / "c")
        spark.createDataFrame(
            [(1, "adopted")], "k int, v string"
        ).write.parquet(root)
        racer_df = spark.createDataFrame(
            [(9, "racer")], "k int, v string"
        )
        fired = {"done": False}
        real_commit = versioned._commit_version

        def racing_commit(r, version, *a, **kw):
            # inject the racer's full write between the conversion's
            # moves and its manifest commit
            if not fired["done"] and version == 1:
                fired["done"] = True
                versioned.write_snapshot(racer_df, r)
            return real_commit(r, version, *a, **kw)

        monkeypatch.setattr(versioned, "_commit_version", racing_commit)
        assert versionize_table(root) == 1
        monkeypatch.undo()
        assert fired["done"]
        versions = snapshot_versions(root)
        assert 1 in versions and len(versions) == 2
        # serial order: the racer committed latest; the adopted table
        # is pinned history at v1
        assert {
            tuple(r) for r in read_snapshot(spark, root, version=1).collect()
        } == {(1, "adopted")}
        assert {
            tuple(r) for r in read_snapshot(spark, root).collect()
        } == {(9, "racer")}

    def test_writer_claiming_v1_first_makes_conversion_refuse(
        self, spark, tmp_path
    ):
        from openaq_data_pipeline_engineering_spark.operators import versioned

        root = str(tmp_path / "c2")
        spark.createDataFrame(
            [(1, "plain")], "k int, v string"
        ).write.parquet(root)
        # another writer's in-flight claim (no _CONVERTING marker)
        os.mkdir(os.path.join(root, "v=1"))
        with pytest.raises(
            versioned.ConcurrentWriteError, match="already claimed"
        ):
            versionize_table(root)
