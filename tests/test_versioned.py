"""Versioned snapshots: commit protocol, time travel, crash safety."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.operators.versioned import (
    read_snapshot,
    snapshot_versions,
    write_snapshot,
)
from openaq_data_pipeline_engineering_spark.sources.star import load_table

SF_DIR = "/root/testdata/sf0.001"


class TestVersionedSnapshots:
    def test_time_travel_and_latest(self, spark, tmp_path):
        root = str(tmp_path / "mart")
        nation = load_table(spark, SF_DIR, "nation")
        v1 = write_snapshot(nation, root)
        v2 = write_snapshot(
            nation.withColumn("n_name", F.upper("n_name")), root
        )
        assert (v1, v2) == (1, 2)
        assert snapshot_versions(root) == [1, 2]
        latest = read_snapshot(spark, root)
        pinned = read_snapshot(spark, root, version=1)
        assert latest.filter(F.col("n_name") != F.upper("n_name")).count() == 0
        # time travel sees the pre-uppercase names
        assert pinned.exceptAll(nation).count() == 0
        assert pinned.count() == nation.count()

    def test_uncommitted_directory_is_invisible(self, spark, tmp_path):
        root = str(tmp_path / "mart")
        nation = load_table(spark, SF_DIR, "nation")
        write_snapshot(nation, root)
        # Simulate a crashed writer: data directory exists, manifest
        # never updated -> readers must not see it.
        nation.limit(1).write.parquet(os.path.join(root, "v=99"))
        assert snapshot_versions(root) == [1]
        assert read_snapshot(spark, root).count() == nation.count()
        with pytest.raises(ValueError):
            read_snapshot(spark, root, version=99)

    def test_writer_skips_orphaned_uncommitted_version(self, spark, tmp_path):
        """A crashed writer leaves an uncommitted v=N dir; the next
        write_snapshot must skip past it (max of manifest and on-disk
        dirs), not wedge on errorifexists forever."""
        root = str(tmp_path / "mart")
        nation = load_table(spark, SF_DIR, "nation")
        write_snapshot(nation, root)  # v1 committed
        # crash: v2 data written, manifest never updated
        nation.limit(1).write.parquet(os.path.join(root, "v=2"))
        assert snapshot_versions(root) == [1]
        v = write_snapshot(nation.limit(3), root)  # must not collide
        assert v == 3
        assert snapshot_versions(root) == [1, 3]
        assert read_snapshot(spark, root).count() == 3

    def test_vacuum_reclaims_orphans_and_honors_grace(self, spark, tmp_path):
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            vacuum_snapshots,
        )

        root = str(tmp_path / "mart")
        nation = load_table(spark, SF_DIR, "nation")
        for i in range(3):
            write_snapshot(nation.limit(2 + i), root)
        nation.limit(1).write.parquet(os.path.join(root, "v=9"))  # orphan
        # everything is seconds old: a 1-hour grace keeps all versions
        assert vacuum_snapshots(root, keep_last=1, min_age_seconds=3600) == []
        assert snapshot_versions(root) == [1, 2, 3]
        assert os.path.isdir(os.path.join(root, "v=9"))
        # default vacuum: old committed versions drop, but the orphan
        # SURVIVES its 24h grace (it could be a live writer's dir)
        assert vacuum_snapshots(root, keep_last=1) == [1, 2]
        assert snapshot_versions(root) == [3]
        assert os.path.isdir(os.path.join(root, "v=9"))
        # backdate the orphan past the grace: now it is reclaimed
        old = os.path.getmtime(os.path.join(root, "v=9")) - 48 * 3600
        os.utime(os.path.join(root, "v=9"), (old, old))
        assert vacuum_snapshots(root, keep_last=1) == []
        assert not os.path.isdir(os.path.join(root, "v=9"))

    def test_vacuum_never_reclaims_fresh_uncommitted_dir(
        self, spark, tmp_path
    ):
        """The data-dir race (round-5 advice): a concurrent
        write_snapshot has CLAIMED v=N and is writing data outside the
        manifest lock; to a racing vacuum the dir looks orphaned. The
        default orphan grace must keep it — deleting it would corrupt
        the in-flight write."""
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            _allocate_and_write,
            _commit_version,
            vacuum_snapshots,
        )

        root = str(tmp_path / "mart")
        nation = load_table(spark, SF_DIR, "nation")
        for i in range(2):
            write_snapshot(nation.limit(i + 1), root)
        # concurrent writer mid-flight: claimed + data written, commit
        # not yet published
        v3 = _allocate_and_write(nation.limit(3), root)
        dropped = vacuum_snapshots(root, keep_last=1)  # racing vacuum
        assert dropped == [1]
        assert os.path.isdir(os.path.join(root, f"v={v3}"))
        _commit_version(root, v3)  # the writer's commit still lands
        assert snapshot_versions(root) == [2, v3]
        assert read_snapshot(spark, root, version=v3).count() == 3
        # explicit zero grace restores immediate reclamation for
        # maintenance windows with no live writers
        nation.limit(1).write.parquet(os.path.join(root, "v=50"))
        vacuum_snapshots(root, keep_last=2, orphan_min_age_seconds=0)
        assert not os.path.isdir(os.path.join(root, "v=50"))


class TestConcurrentWriters:
    def test_interleaved_writers_commit_linear_history(self, spark, tmp_path):
        """The lost-update interleaving: A allocates, B allocates+commits,
        then A commits. A's commit must RE-READ the manifest (it holds a
        stale snapshot from before B's commit) — publishing
        stale + [vA] would silently drop B's version."""
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            _allocate_and_write,
            _commit_version,
        )

        root = str(tmp_path / "mart")
        nation = load_table(spark, SF_DIR, "nation")
        write_snapshot(nation.limit(1), root)  # v1: base history
        # crashed writer's leftover, never committed
        nation.limit(1).write.parquet(os.path.join(root, "v=2"))

        va = _allocate_and_write(nation.limit(3), root)  # A: claims v3
        vb = _allocate_and_write(nation.limit(4), root)  # B: sees v3 -> v4
        assert (va, vb) == (3, 4)
        _commit_version(root, vb)  # B commits first
        _commit_version(root, va)  # A commits from a pre-B manifest view
        # Linear history: both commits present, orphan still invisible
        assert snapshot_versions(root) == [1, 3, 4]
        assert read_snapshot(spark, root).count() == 4
        assert read_snapshot(spark, root, version=va).count() == 3
        with pytest.raises(ValueError):
            read_snapshot(spark, root, version=2)

    def test_parallel_writers_threads(self, spark, tmp_path):
        """Four fully-concurrent write_snapshot calls on one root: all
        must land on distinct versions and ALL must survive in the
        manifest (no lost update), with readable data per version."""
        import threading

        root = str(tmp_path / "mart")
        nation = load_table(spark, SF_DIR, "nation")
        got: dict[int, int] = {}
        errs: list[Exception] = []

        def writer(i: int) -> None:
            try:
                got[i] = write_snapshot(nation.limit(i + 1), root)
            except Exception as e:  # pragma: no cover - surfaced below
                errs.append(e)

        threads = [
            threading.Thread(target=writer, args=(i,)) for i in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs, errs
        versions = sorted(got.values())
        assert len(set(versions)) == 4  # distinct allocations
        assert snapshot_versions(root) == versions  # nothing lost
        for i, v in got.items():
            assert read_snapshot(spark, root, version=v).count() == i + 1

    def test_vacuum_racing_writer_keeps_fresh_commit(self, spark, tmp_path):
        """vacuum's manifest rewrite holds the same lock as commits, so
        a version committed between vacuum's read and write can't be
        dropped. Simulated at the protocol level: commit lands first,
        vacuum (keep_last=1) then must keep it."""
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            _allocate_and_write,
            _commit_version,
            vacuum_snapshots,
        )

        root = str(tmp_path / "mart")
        nation = load_table(spark, SF_DIR, "nation")
        for i in range(2):
            write_snapshot(nation.limit(i + 1), root)
        v3 = _allocate_and_write(nation.limit(3), root)
        _commit_version(root, v3)
        dropped = vacuum_snapshots(root, keep_last=1)
        assert dropped == [1, 2]
        assert snapshot_versions(root) == [v3]
        assert read_snapshot(spark, root).count() == 3


class TestStreamingSnapshotSink:
    def test_foreach_batch_commits_versions(self, spark, tmp_path):
        """Streaming sink integration: each micro-batch commits one
        immutable snapshot version via operators/versioned — readers
        always see a complete batch, and history stays queryable."""
        import os

        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            write_snapshot,
        )

        src = str(tmp_path / "src")
        os.makedirs(src)
        with open(os.path.join(src, "a.json"), "w") as f:
            f.write('{"k": 1}\n{"k": 2}\n')
        root = str(tmp_path / "snap")
        ckpt = str(tmp_path / "ckpt")

        def sink(batch_df, batch_id: int) -> None:
            if batch_df.count() > 0:
                write_snapshot(batch_df, root)

        stream = spark.readStream.schema("k long").json(src)
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert snapshot_versions(root) == [1]
        assert read_snapshot(spark, root).count() == 2

        # second incremental drop -> second version; v1 unchanged
        with open(os.path.join(src, "b.json"), "w") as f:
            f.write('{"k": 3}\n')
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert snapshot_versions(root) == [1, 2]
        assert read_snapshot(spark, root, version=1).count() == 2
        assert read_snapshot(spark, root, version=2).count() == 1


class TestVacuum:
    def test_retention_drops_old_versions_manifest_first(self, spark, tmp_path):
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            vacuum_snapshots,
        )

        root = str(tmp_path / "mart")
        nation = load_table(spark, SF_DIR, "nation")
        for i in range(4):
            write_snapshot(nation.limit(5 + i), root)
        assert snapshot_versions(root) == [1, 2, 3, 4]
        dropped = vacuum_snapshots(root, keep_last=2)
        assert dropped == [1, 2]
        assert snapshot_versions(root) == [3, 4]
        assert read_snapshot(spark, root).count() == 8  # v4 = limit(8)
        with pytest.raises(ValueError):
            read_snapshot(spark, root, version=1)
        assert vacuum_snapshots(root, keep_last=2) == []


class TestIncrementalMV:
    def test_partial_refresh_equals_full_recompute(self, spark, tmp_path):
        """Materialized-view maintenance composition: daily partial
        aggregates snapshot-committed per batch; the monthly view
        refreshes from PARTIALS ONLY (algebraic merge) and must equal
        a full recompute over all raw data."""
        from pyspark.sql import functions as F

        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            write_snapshot,
        )

        ev = load_table(spark, SF_DIR, "events")
        day = F.col("ts").cast("date")
        first = ev.filter(day <= "2024-01-15")
        second = ev.filter(day > "2024-01-15")
        root = str(tmp_path / "partials")

        def partials(df):
            return df.groupBy(
                "event_type", F.col("ts").cast("date").alias("d")
            ).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.expr("CAST(floor(value * 1000) AS BIGINT)")).alias(
                    "milli"
                ),
            )

        write_snapshot(partials(first), root)
        write_snapshot(partials(second), root)
        # refresh: union ALL snapshot versions of partials, merge up
        merged = (
            read_snapshot(spark, root, version=1)
            .unionByName(read_snapshot(spark, root, version=2))
            .groupBy("event_type")
            .agg(F.sum("n").alias("n"), F.sum("milli").alias("milli"))
        )
        full = ev.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(floor(value * 1000) AS BIGINT)")).alias(
                "milli"
            ),
        )
        got = {tuple(r) for r in merged.collect()}
        want = {tuple(r) for r in full.collect()}
        assert got == want and len(got) == 5


class TestSnapshotChanges:
    """Change data feed (snapshot_changes): Delta CDF semantics."""

    def _mk(self, spark, tmp_path):
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            snapshot_changes,
        )

        root = str(tmp_path / "cdf")
        v1 = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
            "k int, seg string, val int",
        )
        v2 = spark.createDataFrame(
            # k=1 unchanged, k=2 updated, k=3 deleted, k=4 inserted
            [(1, "a", 10), (2, "B", 21), (4, "d", 40)],
            "k int, seg string, val int",
        )
        write_snapshot(v1, root)
        write_snapshot(v2, root)
        return snapshot_changes, root

    def test_all_change_types(self, spark, tmp_path):
        snapshot_changes, root = self._mk(spark, tmp_path)
        feed = snapshot_changes(spark, root, keys=["k"], v_from=1, v_to=2)
        rows = {tuple(r) for r in feed.collect()}
        assert rows == {
            (2, "b", 20, "update_preimage"),
            (2, "B", 21, "update_postimage"),
            (3, "c", 30, "delete"),
            (4, "d", 40, "insert"),
        }
        assert feed.columns == ["k", "seg", "val", "_change_type"]

    def test_include_unchanged(self, spark, tmp_path):
        snapshot_changes, root = self._mk(spark, tmp_path)
        feed = snapshot_changes(
            spark, root, keys=["k"], v_from=1, v_to=2,
            include_unchanged=True,
        )
        assert feed.filter(
            F.col("_change_type") == "unchanged"
        ).collect()[0][0] == 1
        assert feed.count() == 5

    def test_identical_versions_empty_feed(self, spark, tmp_path):
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            snapshot_changes,
        )

        root = str(tmp_path / "cdf2")
        df = load_table(spark, SF_DIR, "nation")
        write_snapshot(df, root)
        write_snapshot(df, root)
        feed = snapshot_changes(
            spark, root, keys=["n_nationkey"], v_from=1, v_to=2
        )
        assert feed.count() == 0

    def test_schema_drift_is_evolution_not_error(self, spark, tmp_path):
        """Round-7 contract change: added columns are schema EVOLUTION
        (aligned as NULL on the side missing them), no longer an error;
        only a same-name type change is rejected
        (TestCdfSchemaEvolution pins both behaviors in detail)."""
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            snapshot_changes,
        )

        root = str(tmp_path / "cdf3")
        write_snapshot(
            spark.createDataFrame([(1, "a")], "k int, x string"), root
        )
        write_snapshot(
            spark.createDataFrame([(1, "a", 2)], "k int, x string, y int"),
            root,
        )
        feed = snapshot_changes(spark, root, keys=["k"], v_from=1, v_to=2)
        got = {(r["k"], r["y"], r["_change_type"]) for r in feed.collect()}
        assert got == {
            (1, None, "update_preimage"),
            (1, 2, "update_postimage"),
        }

    def test_single_join_no_python_plan(self, spark, tmp_path):
        snapshot_changes, root = self._mk(spark, tmp_path)
        feed = snapshot_changes(spark, root, keys=["k"], v_from=1, v_to=2)
        plan = feed._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan
        assert plan.count("Join") <= 2  # one logical full-outer join

    def test_feed_replay_reproduces_v2(self, spark, tmp_path):
        """Algebraic inverse: applying the change feed as a CDC stream
        onto v1 reproduces v2 exactly — ties snapshot_changes,
        cdc_apply, and the snapshot layer together."""
        from openaq_data_pipeline_engineering_spark.operators.merge import (
            cdc_apply,
        )

        snapshot_changes, root = self._mk(spark, tmp_path)
        feed = snapshot_changes(spark, root, keys=["k"], v_from=1, v_to=2)
        changes = (
            feed.filter(F.col("_change_type") != "update_preimage")
            .withColumn(
                "op",
                F.when(F.col("_change_type") == "delete", "D").otherwise("U"),
            )
            .withColumn("seq", F.lit(1))
            .drop("_change_type")
        )
        replayed = cdc_apply(
            read_snapshot(spark, root, version=1), changes, keys=["k"]
        )
        v2 = read_snapshot(spark, root, version=2)
        assert {tuple(r) for r in replayed.collect()} == {
            tuple(r) for r in v2.collect()
        }


class TestIdempotentTxn:
    """write_snapshot(txn_id=...): Delta-style at-least-once dedupe."""

    def test_replay_returns_same_version_without_write(self, spark, tmp_path):
        root = str(tmp_path / "txn")
        df = spark.createDataFrame([(1, "a")], "k int, v string")
        v1 = write_snapshot(df, root, txn_id="batch-0")
        v_replay = write_snapshot(
            spark.createDataFrame([(9, "Z")], "k int, v string"),
            root,
            txn_id="batch-0",  # replayed batch: payload ignored
        )
        assert (v1, v_replay) == (1, 1)
        assert snapshot_versions(root) == [1]
        assert read_snapshot(spark, root).collect()[0]["v"] == "a"

    def test_distinct_txns_advance(self, spark, tmp_path):
        root = str(tmp_path / "txn2")
        df = spark.createDataFrame([(1, "a")], "k int, v string")
        assert write_snapshot(df, root, txn_id="b0") == 1
        assert write_snapshot(df, root, txn_id="b1") == 2
        assert write_snapshot(df, root) == 3  # untagged never dedupes
        assert write_snapshot(df, root, txn_id="b1") == 2  # still pinned

    def test_vacuum_keeps_txn_entries_past_data_retention(
        self, spark, tmp_path
    ):
        """The dedupe window outlives the data window by default: a
        replay later than keep_last versions must still be a no-op
        (re-merging stale data is the failure txn_id prevents)."""
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            _read_manifest_full,
            vacuum_snapshots,
        )

        root = str(tmp_path / "txn3")
        df = spark.createDataFrame([(1, "a")], "k int, v string")
        for i in range(4):
            write_snapshot(df, root, txn_id=f"b{i}")
        vacuum_snapshots(root, keep_last=2)
        versions, txns = _read_manifest_full(root)
        assert versions == [3, 4]
        assert set(txns) == {"b0", "b1", "b2", "b3"}
        # a VERY late replay of a vacuumed batch still dedupes — no new
        # version, and the returned version is the original commit
        # (possibly no longer readable; callers use it only as
        # "already committed").
        assert write_snapshot(df, root, txn_id="b0") == 1
        assert _read_manifest_full(root)[0] == [3, 4]

    def test_vacuum_explicit_txn_retention(self, spark, tmp_path):
        """txn_keep_last retires only entries trailing the newest commit
        by more than that many versions, and must be >= keep_last."""
        import pytest

        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            _read_manifest_full,
            vacuum_snapshots,
        )

        root = str(tmp_path / "txn4")
        df = spark.createDataFrame([(1, "a")], "k int, v string")
        for i in range(5):
            write_snapshot(df, root, txn_id=f"b{i}")
        with pytest.raises(ValueError):
            vacuum_snapshots(root, keep_last=2, txn_keep_last=1)
        vacuum_snapshots(root, keep_last=2, txn_keep_last=3)
        versions, txns = _read_manifest_full(root)
        assert versions == [4, 5]
        assert set(txns) == {"b2", "b3", "b4"}  # floor = 5 - 3 = 2
        # a replay of a retired txn writes a fresh version (outside the
        # EXPLICIT dedupe window, same as Delta's txn retention)
        assert write_snapshot(df, root, txn_id="b0") == 6


class TestAsOfTimestamp:
    """TIMESTAMP AS OF time travel: newest commit at-or-before ts."""

    def test_resolution_between_and_at_commits(self, spark, tmp_path):
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            snapshot_commit_times,
        )

        root = str(tmp_path / "asof")
        for k in (1, 2, 3):
            write_snapshot(
                spark.createDataFrame([(k,)], "v int"), root
            )
        ts = snapshot_commit_times(root)
        assert sorted(ts) == [1, 2, 3]
        assert ts[1] < ts[2] < ts[3]  # strictly increasing
        mid = (ts[1] + ts[2]) / 2
        assert read_snapshot(spark, root, as_of_ts=mid).first()["v"] == 1
        assert read_snapshot(spark, root, as_of_ts=ts[2]).first()["v"] == 2
        assert (
            read_snapshot(spark, root, as_of_ts=ts[3] + 10).first()["v"] == 3
        )

    def test_before_first_commit_raises(self, spark, tmp_path):
        import pytest

        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            snapshot_commit_times,
        )

        root = str(tmp_path / "asof2")
        write_snapshot(spark.createDataFrame([(1,)], "v int"), root)
        ts = snapshot_commit_times(root)
        with pytest.raises(ValueError, match="no version committed"):
            read_snapshot(spark, root, as_of_ts=ts[1] - 1)
        with pytest.raises(ValueError, match="not both"):
            read_snapshot(spark, root, version=1, as_of_ts=ts[1])

    def test_vacuum_retires_commit_times(self, spark, tmp_path):
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            snapshot_commit_times,
            vacuum_snapshots,
        )

        root = str(tmp_path / "asof3")
        df = spark.createDataFrame([(1,)], "v int")
        for _ in range(4):
            write_snapshot(df, root)
        vacuum_snapshots(root, keep_last=2)
        assert sorted(snapshot_commit_times(root)) == [3, 4]


class TestCdfSchemaEvolution:
    def test_added_column_emits_null_preimage_updates(self, spark, tmp_path):
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            snapshot_changes,
        )

        root = str(tmp_path / "cdf_evo")
        v1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
        write_snapshot(v1, root)
        v2 = spark.createDataFrame(
            [(1, "a", 10), (3, "c", 30)], "k int, v string, w int"
        )
        write_snapshot(v2, root)
        feed = snapshot_changes(spark, root, keys=["k"], v_from=1, v_to=2)
        got = {
            (r["k"], r["v"], r["w"], r["_change_type"])
            for r in feed.collect()
        }
        assert got == {
            (2, "b", None, "delete"),
            (3, "c", 30, "insert"),
            (1, "a", None, "update_preimage"),  # w added: pre is NULL
            (1, "a", 10, "update_postimage"),
        }

    def test_type_change_still_rejected(self, spark, tmp_path):
        import pytest

        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            snapshot_changes,
        )

        root = str(tmp_path / "cdf_evo2")
        write_snapshot(
            spark.createDataFrame([(1, 1)], "k int, v int"), root
        )
        write_snapshot(
            spark.createDataFrame([(1, "x")], "k int, v string"), root
        )
        with pytest.raises(ValueError, match="types differ"):
            snapshot_changes(spark, root, keys=["k"], v_from=1, v_to=2)
