"""Round-9 self-review findings, pinned.

1. CLONE/VACUUM RACE: clone_snapshot published the clone's manifest and
   only THEN recorded the back-reference in the source — a vacuum whose
   clone check ran inside that window could reclaim versions the clone
   references, silently birthing a broken clone the guard never saw.
   The clone now re-verifies its referenced versions against the
   post-record source manifest and, on loss, undoes itself (manifest
   delete + back-reference removal) and raises ConcurrentWriteError.
2. FOOTER METRICS vs CDF SIDEcars: _footer_row_count / file stats
   walked EVERY subdirectory, so a CDF-enabled version directory's
   ``_changes`` files double-counted into n_rows / n_files / bytes —
   paths a Spark read of the same directory ignores. All footer-level
   statistics now iterate data files only
   (operators/compact.iter_data_parquet_files).
3. PURGE single-pass metrics: each version's match count and row total
   come from ONE aggregate (a separate .count() re-scanned every
   retained version for the metrics row).
"""

from __future__ import annotations

import os

import pytest

from openaq_data_pipeline_engineering_spark.operators import versioned
from openaq_data_pipeline_engineering_spark.operators.versioned import (
    ConcurrentWriteError,
    clone_snapshot,
    enable_change_feed,
    read_snapshot,
    snapshot_versions,
    vacuum_snapshots,
    write_snapshot,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def _rows(df):
    return {tuple(r) for r in df.collect()}


class TestCloneVacuumRace:
    def test_vacuum_winning_the_unprotected_window_aborts_the_clone(
        self, spark, tmp_path, monkeypatch
    ):
        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        write_snapshot(_df(spark, [(1, "a")]), src)  # v1
        write_snapshot(_df(spark, [(2, "b")]), src)  # v2

        orig_txn = versioned._manifest_txn
        fired = {"done": False}

        def racing_txn(root, decide, max_retries=64):
            # Inject a vacuum between the clone-manifest publish and
            # the back-reference record — the exact window the guard
            # cannot cover.
            if not fired["done"] and decide.__name__ == "record":
                fired["done"] = True
                dropped = vacuum_snapshots(src, keep_last=1)
                assert dropped == [1]
            return orig_txn(root, decide, max_retries)

        monkeypatch.setattr(versioned, "_manifest_txn", racing_txn)
        with pytest.raises(ConcurrentWriteError, match="vacuum"):
            clone_snapshot(src, dst, version=1)
        monkeypatch.undo()
        assert fired["done"]
        # the half-born clone undid itself: no manifest, no back-ref
        assert snapshot_versions(dst) == []
        assert versioned._read_manifest_doc(src)["clones"] == []
        # a retry at the surviving version succeeds and is protected
        assert clone_snapshot(src, dst, version=2) == 2
        assert _rows(read_snapshot(spark, dst)) == {(2, "b")}
        write_snapshot(_df(spark, [(3, "c")]), src)
        with pytest.raises(versioned.VacuumBlockedByCloneError):
            vacuum_snapshots(src, keep_last=1)

    def test_clean_clone_passes_the_post_record_verification(
        self, spark, tmp_path
    ):
        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        write_snapshot(_df(spark, [(1, "a")]), src)
        assert clone_snapshot(src, dst) == 1
        assert _rows(read_snapshot(spark, dst)) == {(1, "a")}


class TestFooterMetricsExcludeCdfSidecars:
    def _cdf_table(self, spark, tmp_path) -> str:
        root = str(tmp_path / "cdf")
        enable_change_feed(spark, root, keys=["k"])
        write_snapshot(_df(spark, [(1, "a"), (2, "b")]), root)  # v1
        # v2 rewrites one row -> _changes holds pre+post images
        write_snapshot(_df(spark, [(1, "a"), (2, "B")]), root)
        return root

    def test_footer_row_count_matches_the_spark_read(
        self, spark, tmp_path
    ):
        from openaq_data_pipeline_engineering_spark.operators.sqlutil import (
            _footer_row_count,
        )

        root = self._cdf_table(spark, tmp_path)
        v2 = os.path.join(root, "v=2")
        assert os.path.isdir(os.path.join(v2, "_changes"))
        assert _footer_row_count(v2) == 2  # data rows, not data+changes
        assert _footer_row_count(v2) == spark.read.parquet(v2).count()

    def test_iter_data_parquet_files_skips_underscore_paths(
        self, spark, tmp_path
    ):
        from openaq_data_pipeline_engineering_spark.operators.compact import (
            iter_data_parquet_files,
        )

        root = self._cdf_table(spark, tmp_path)
        v2 = os.path.join(root, "v=2")
        files = list(iter_data_parquet_files(v2))
        assert files, "data files must be found"
        assert all("_changes" not in f for f in files)

    def test_describe_detail_reports_data_footprint_only(
        self, spark, tmp_path
    ):
        from openaq_data_pipeline_engineering_spark.operators.sqlutil import (
            execute_describe_detail,
        )

        root = self._cdf_table(spark, tmp_path)
        row = execute_describe_detail(
            spark, f"DESCRIBE DETAIL '{root}'"
        ).first()
        assert row["n_rows"] == 2
        # latest resolves to one full version directory; its file count
        # must exclude the _changes sidecar files
        from openaq_data_pipeline_engineering_spark.operators.compact import (
            iter_data_parquet_files,
        )

        assert row["n_data_files"] == sum(
            1 for _ in iter_data_parquet_files(os.path.join(root, "v=2"))
        )

    def test_insert_metrics_on_a_cdf_table_count_inserted_rows_only(
        self, spark, tmp_path
    ):
        from openaq_data_pipeline_engineering_spark.operators.sqlutil import (
            execute_insert,
        )

        root = str(tmp_path / "cdf2")
        enable_change_feed(spark, root, keys=["k"])
        write_snapshot(_df(spark, [(1, "a")]), root)
        m = execute_insert(
            spark,
            f"INSERT OVERWRITE '{root}' "
            "SELECT * FROM VALUES (1, 'a'), (2, 'b'), (3, 'c')",
        ).first()
        assert m["n_rows_inserted"] == 3  # not 3 + the change rows


class TestPurgeSinglePassMetrics:
    def test_purge_counts_are_exact(self, spark, tmp_path):
        root = str(tmp_path / "p")
        write_snapshot(
            _df(spark, [(1, "a"), (2, "b"), (3, "c")]), root
        )
        write_snapshot(_df(spark, [(2, "b"), (3, "c")]), root)
        res = versioned.purge_rows(
            spark, root, "k = 2", orphan_min_age_seconds=0
        )
        assert res == [(1, 1, 2), (2, 1, 1)]
        assert _rows(read_snapshot(spark, root, version=1)) == {
            (1, "a"),
            (3, "c"),
        }
        assert _rows(read_snapshot(spark, root)) == {(3, "c")}


class TestPurgeZeroCopyCarry:
    """A version whose DATA has no matches but whose _changes sidecar
    does (the deleted-row pre-image case) must carry its data by
    hardlink, not a full Spark rewrite — zero data-plane I/O when only
    metadata changes."""

    def test_untouched_data_is_hardlinked_not_rewritten(
        self, spark, tmp_path
    ):
        root = str(tmp_path / "zc")
        enable_change_feed(spark, root, keys=["k"])
        write_snapshot(_df(spark, [(1, "gone"), (2, "b")]), root)  # v1
        write_snapshot(_df(spark, [(2, "b")]), root)  # v2: deletes k=1
        v2 = os.path.join(root, "v=2")
        from openaq_data_pipeline_engineering_spark.operators.compact import (
            iter_data_parquet_files,
        )

        inodes_before = {
            f: os.stat(f).st_ino for f in iter_data_parquet_files(v2)
        }
        # v2's data holds no k=1, but its change set carries the
        # delete PRE-image (k=1, 'gone') — erasure must reach it
        res = versioned.purge_rows(
            spark, root, "k = 1", orphan_min_age_seconds=0
        )
        assert res == [(1, 1, 1), (2, 0, 1)]
        # the pre-image is gone from the feed ...
        ch = versioned.table_changes(spark, root, v_from=1, v_to=2)
        assert [r["k"] for r in ch.collect()] == []
        # ... and v2's data files were carried by hardlink (same
        # inodes), not rewritten
        inodes_after = {
            f: os.stat(f).st_ino for f in iter_data_parquet_files(v2)
        }
        assert inodes_after == inodes_before
        assert _rows(read_snapshot(spark, root, version=2)) == {(2, "b")}
        assert _rows(read_snapshot(spark, root, version=1)) == {(2, "b")}


class TestPathDmlMetricsOnCdfTables:
    def test_update_n_rows_excludes_change_sidecar(self, spark, tmp_path):
        from openaq_data_pipeline_engineering_spark.operators.sqldml import (
            execute_update_statement,
        )

        root = str(tmp_path / "dmlcdf")
        enable_change_feed(spark, root, keys=["k"])
        write_snapshot(_df(spark, [(1, "a"), (2, "b")]), root)
        m = execute_update_statement(
            spark, f"UPDATE '{root}' SET v = 'X' WHERE k = 2"
        ).first()
        # the new version carries 2 data rows; its _changes sidecar
        # (update pre+post images) must not inflate the count
        assert m["n_rows"] == 2
