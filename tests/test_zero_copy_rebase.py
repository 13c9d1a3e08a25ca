"""Zero-copy append-chain rebase: checkpoint_appends publishes the
chain's resolved content as one FULL version whose ``_fileset.json``
entries reference every chain file at its original owner (r12) — zero
data bytes written, on every store (Delta's checkpoint cost model: a
checkpoint compacts the log; data files are shared by reference).
Schema-evolved chains fall back to the Spark rewrite; ``compact=True``
forces the rewrite."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.operators.versioned import (
    append_rows,
    checkpoint_appends,
    enable_change_feed,
    read_snapshot,
    snapshot_modes,
    snapshot_versions,
    table_changes,
    vacuum_snapshots,
    write_snapshot,
)


def _df(spark, rows, schema="k long, v string"):
    return spark.createDataFrame(rows, schema)


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _inodes(root: str, version: int) -> set[int]:
    return {
        os.stat(p).st_ino
        for p in glob.glob(os.path.join(root, f"v={version}", "*.parquet"))
        if not os.path.basename(p).startswith(("_", "."))
    }


class TestZeroCopyRebase:
    def test_rebase_references_instead_of_rewriting(self, spark, tmp_path):
        from openaq_data_pipeline_engineering_spark.operators.filesets import (
            is_fileset_dir,
            read_fileset,
            version_data_files,
        )

        root = str(tmp_path / "t")
        write_snapshot(_df(spark, [(1, "a")]), root)
        append_rows(_df(spark, [(2, "b")]), root)
        append_rows(_df(spark, [(3, "c")]), root)
        chain_files = {
            p
            for v in (1, 2, 3)
            for p in version_data_files(os.path.join(root, f"v={v}"))
        }
        v = checkpoint_appends(spark, root)
        assert snapshot_modes(root).get(v, "full") == "full"
        vdir = os.path.join(root, f"v={v}")
        # the rebase writes NO data files of its own — one sidecar
        # whose entries reference every chain file at its owner
        assert is_fileset_dir(vdir)
        assert _inodes(root, v) == set()
        owners = {int(e["v"]) for e in read_fileset(vdir)["entries"]}
        assert owners == {1, 2, 3}
        assert set(version_data_files(vdir)) == chain_files
        assert _rows(read_snapshot(spark, root)) == {
            (1, "a"),
            (2, "b"),
            (3, "c"),
        }

    def test_vacuum_after_zero_copy_rebase_is_safe(self, spark, tmp_path):
        root = str(tmp_path / "t")
        write_snapshot(_df(spark, [(1, "a")]), root)
        append_rows(_df(spark, [(2, "b")]), root)
        v = checkpoint_appends(spark, root)
        dropped = vacuum_snapshots(root, keep_last=1)
        assert dropped == [1, 2]
        # dropping the chain dirs only drops link NAMES; the rebased
        # version still reads every row
        assert _rows(read_snapshot(spark, root, version=v)) == {
            (1, "a"),
            (2, "b"),
        }

    def test_evolved_chain_falls_back_to_rewrite(self, spark, tmp_path):
        root = str(tmp_path / "t")
        write_snapshot(_df(spark, [(1, "a")]), root)
        append_rows(
            spark.createDataFrame(
                [(2, "b", 7.5)], "k long, v string, score double"
            ),
            root,
        )
        chain_inodes = _inodes(root, 1) | _inodes(root, 2)
        v = checkpoint_appends(spark, root)
        assert _inodes(root, v).isdisjoint(chain_inodes)  # rewritten
        got = {
            (r["k"], r["v"], r["score"])
            for r in read_snapshot(spark, root, version=v).collect()
        }
        assert got == {(1, "a", None), (2, "b", 7.5)}

    def test_compact_true_forces_rewrite(self, spark, tmp_path):
        root = str(tmp_path / "t")
        write_snapshot(_df(spark, [(1, "a")]), root)
        append_rows(_df(spark, [(2, "b")]), root)
        chain_inodes = _inodes(root, 1) | _inodes(root, 2)
        v = checkpoint_appends(spark, root, compact=True)
        assert _inodes(root, v).isdisjoint(chain_inodes)
        assert read_snapshot(spark, root, version=v).count() == 2

    def test_txn_dedupe_on_zero_copy_path(self, spark, tmp_path):
        root = str(tmp_path / "t")
        write_snapshot(_df(spark, [(1, "a")]), root)
        append_rows(_df(spark, [(2, "b")]), root)
        v = checkpoint_appends(spark, root, txn_id="ckpt-0")
        replay = checkpoint_appends(spark, root, txn_id="ckpt-0")
        assert replay == v
        assert snapshot_versions(root)[-1] == v

    def test_cdf_table_rebase_has_empty_change_set(self, spark, tmp_path):
        """A rebase is content-preserving: its change files must exist
        (table_changes over the range stays servable) and be EMPTY —
        and no full-table diff is needed to produce them."""
        root = str(tmp_path / "t")
        enable_change_feed(spark, root, ["k"])
        write_snapshot(_df(spark, [(1, "a"), (2, "b")]), root)  # v1
        append_rows(_df(spark, [(3, "c")]), root)  # v2 delta
        v = checkpoint_appends(spark, root)  # v3 zero-copy
        ch = table_changes(spark, root, v_from=0, v_to=v)
        by_version = {
            r["_commit_version"]: r["_change_type"]
            for r in ch.collect()
            if r["_commit_version"] == v
        }
        assert by_version == {}  # the rebase contributed zero change rows
        # the rest of the range still serves
        assert ch.filter(F.col("_commit_version") == 1).count() == 2
        assert ch.filter(F.col("_commit_version") == 2).count() == 1
        assert _rows(
            read_snapshot(spark, root, version=v).select("k", "v")
        ) == {(1, "a"), (2, "b"), (3, "c")}

    def test_auto_rebase_policy_uses_zero_copy(self, spark, tmp_path):
        root = str(tmp_path / "t")
        write_snapshot(_df(spark, [(0, "base")]), root)
        pre_inodes: set[int] = set()
        for i in range(3):
            append_rows(
                _df(spark, [(i + 1, "d")]), root, max_chain_deltas=2
            )
        # the policy checkpointed; the rebase version is a fileset
        # reference (no data files of its own)
        from openaq_data_pipeline_engineering_spark.operators.filesets import (
            is_fileset_dir,
        )

        versions = snapshot_versions(root)
        modes = snapshot_modes(root)
        fulls = [v for v in versions[1:] if v not in modes]
        assert fulls, (versions, modes)
        assert is_fileset_dir(os.path.join(root, f"v={fulls[-1]}"))
        assert _inodes(root, fulls[-1]) == set()
        assert read_snapshot(spark, root).count() == 4

    def test_conflict_retries_against_racer(self, spark, tmp_path):
        """A commit landing between the rebase's read and publish makes
        the conditional commit conflict; checkpoint retries and the
        final content includes the racer's rows."""
        from openaq_data_pipeline_engineering_spark.operators import (
            versioned as V,
        )

        root = str(tmp_path / "t")
        write_snapshot(_df(spark, [(1, "a")]), root)
        append_rows(_df(spark, [(2, "b")]), root)
        real = V._commit_version
        fired = {"n": 0}

        def racing_commit(r, version, *a, **kw):
            if fired["n"] == 0 and kw.get("expected_latest") is not None:
                fired["n"] = 1
                append_rows(_df(spark, [(9, "racer")]), root)
            return real(r, version, *a, **kw)

        try:
            V._commit_version = racing_commit
            v = checkpoint_appends(spark, root)
        finally:
            V._commit_version = real
        assert fired["n"] == 1
        assert (9, "racer") in _rows(read_snapshot(spark, root))
        assert read_snapshot(spark, root).count() == 3


class TestAdoptedPartitionedChains:
    def test_layoutless_append_rejected_at_commit_time(self, spark, tmp_path):
        """VERDICT r10 #2: an append whose batch CANNOT match the
        adopted Hive-partitioned layout (partition column absent) is
        rejected AT COMMIT TIME with a pointed layout error — not
        committed as a chain that fails on every subsequent read.
        Nothing is published: the table stays at v1, intact and
        readable."""
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            PartitionedAppendError,
            versionize_table,
        )

        root = str(tmp_path / "t")
        spark.createDataFrame(
            [(1, "01"), (2, "02")], "k long, month string"
        ).write.partitionBy("month").parquet(root)
        versionize_table(root)
        with pytest.raises(
            PartitionedAppendError, match="CONFLICTING_DIRECTORY"
        ):
            append_rows(spark.createDataFrame([(3,)], "k long"), root)
        assert snapshot_versions(root) == [1]
        assert read_snapshot(spark, root).count() == 2
        # the named remedy works: OPTIMIZE/checkpoint flattens the
        # layout (the partition column becomes a data column of its
        # INFERRED type — "01" reads as int 1), after which appends
        # matching that schema commit normally
        checkpoint_appends(spark, root, compact=True)
        append_rows(
            spark.createDataFrame([(3, 3)], "k long, month int"), root
        )
        assert _rows(read_snapshot(spark, root)) == {(1, 1), (2, 2), (3, 3)}

    def test_append_with_partition_columns_auto_partitions(
        self, spark, tmp_path
    ):
        """A batch that CONTAINS the base's partition columns
        auto-publishes its delta PARTITIONED by the base layout; the
        chain read unions per-directory with partition values intact,
        and the zero-copy rebase merges the chain at relative
        subpaths."""
        import os

        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            snapshot_modes,
            versionize_table,
        )

        root = str(tmp_path / "t")
        spark.createDataFrame(
            [(1, 1), (2, 2)], "k long, month int"
        ).write.partitionBy("month").parquet(root)
        versionize_table(root)
        append_rows(
            spark.createDataFrame([(3, 3), (4, 1)], "k long, month int"),
            root,
        )
        assert snapshot_modes(root).get(2) == "delta"
        # the delta directory itself is partitioned
        assert os.path.isdir(os.path.join(root, "v=2", "month=3"))
        got = _rows(read_snapshot(spark, root))
        assert got == {(1, 1), (2, 2), (3, 3), (4, 1)}
        # zero-copy rebase references the same-layout chain's files at
        # their key=value subpaths — partition values preserved
        from openaq_data_pipeline_engineering_spark.operators.filesets import (
            is_fileset_dir,
            read_fileset,
        )

        v = checkpoint_appends(spark, root)
        assert _rows(read_snapshot(spark, root, version=v)) == got
        vdir = os.path.join(root, f"v={v}")
        assert is_fileset_dir(vdir)
        assert any(
            e["rel"].startswith("month=3/")
            for e in read_fileset(vdir)["entries"]
        )

    def test_rebase_never_flattens_partitioned_chain(self, spark, tmp_path):
        """An adopted Hive-partitioned v1 keeps partition VALUES in
        directory names. A flat link-merge would silently drop that
        column, so _checkpoint_zero_copy must refuse (return None) and
        the checkpoint fall back to the rewrite path — where Spark's
        own CONFLICTING_DIRECTORY_STRUCTURES error on the mixed
        flat/partitioned chain read surfaces LOUDLY. Such a chain can
        no longer be CREATED through append_rows (the commit-time guard
        above); this pins the read/rebase behavior for legacy roots
        committed before the guard, built here through the internal
        commit functions the guard fronts."""
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            _allocate_and_write,
            _checkpoint_zero_copy,
            _commit_version,
            versionize_table,
        )

        root = str(tmp_path / "t")
        spark.createDataFrame(
            [(1, "01"), (2, "02")], "k long, month string"
        ).write.partitionBy("month").parquet(root)
        versionize_table(root)
        # legacy-shape flat delta, committed below the guard
        v = _allocate_and_write(
            spark.createDataFrame([(3, "03")], "k long, month string"),
            root,
        )
        _commit_version(root, v, mode="delta")
        # the zero-copy path refuses the non-flat chain...
        assert _checkpoint_zero_copy(spark, root, 2, None) is None
        # ...and the rewrite path surfaces Spark's loud mixed-layout
        # error instead of producing a column-dropping merge
        with pytest.raises(Exception, match="CONFLICTING_DIRECTORY"):
            checkpoint_appends(spark, root)
        # the adopted version itself stays intact and readable
        assert read_snapshot(spark, root, version=1).count() == 2
