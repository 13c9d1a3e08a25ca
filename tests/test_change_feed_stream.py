"""Streaming change data feed (Delta readChangeFeed parity).

Write side: a table with enable_change_feed materializes each full
commit's row-level diff into v=<N>/_changes at write time (one
distributed join per commit — the scale-correct design; the stream
then reads change FILES, never recomputes diffs). Read side: the
versioned_feed source's readChangeFeed option streams those files plus
append deltas (as inserts), each row tagged _change_type and
_commit_version.
"""

from __future__ import annotations

import os

import pytest

from openaq_data_pipeline_engineering_spark.operators.versioned import (
    append_rows,
    change_feed_keys,
    enable_change_feed,
    purge_rows,
    read_snapshot,
    snapshot_versions,
    vacuum_snapshots,
    write_snapshot,
)
from openaq_data_pipeline_engineering_spark.sources.versioned_stream import (
    register_versioned_feed,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def _changes_of(spark, root, version):
    return spark.read.parquet(os.path.join(root, f"v={version}", "_changes"))


def _drain_cdf(spark, root, out, ckpt, starting=0, **opts):
    stream = (
        spark.readStream.format("versioned_feed")
        .option("root", root)
        .option("startingVersion", str(starting))
        .option("readChangeFeed", "true")
    )
    for k, v in opts.items():
        stream = stream.option(k, v)
    q = (
        stream.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out)


class TestChangeMaterialization:
    def test_full_commits_write_change_files(self, spark, tmp_path):
        root = str(tmp_path / "t")
        enable_change_feed(spark, root, ["k"])
        assert change_feed_keys(root) == ["k"]
        v1 = write_snapshot(_df(spark, [(1, "a"), (2, "b")]), root)
        # first commit: everything is an insert
        ch1 = {
            (r["k"], r["_change_type"])
            for r in _changes_of(spark, root, v1).collect()
        }
        assert ch1 == {(1, "insert"), (2, "insert")}
        # update k=1, delete k=2, insert k=3
        v2 = write_snapshot(_df(spark, [(1, "A"), (3, "c")]), root)
        ch2 = {
            (r["k"], r["v"], r["_change_type"])
            for r in _changes_of(spark, root, v2).collect()
        }
        assert ch2 == {
            (1, "a", "update_preimage"),
            (1, "A", "update_postimage"),
            (2, "b", "delete"),
            (3, "c", "insert"),
        }

    def test_enable_requires_existing_key_column(self, spark, tmp_path):
        root = str(tmp_path / "t")
        write_snapshot(_df(spark, [(1, "a")]), root)
        with pytest.raises(ValueError, match="not in table columns"):
            enable_change_feed(spark, root, ["nope"])
        enable_change_feed(spark, root, ["k"])
        with pytest.raises(ValueError, match="already enabled"):
            enable_change_feed(spark, root, ["k"])

    def test_cdf_write_retries_over_concurrent_append(
        self, spark, tmp_path, monkeypatch
    ):
        """The diff base must be the version the commit supersedes: a
        racer landing mid-write forces a diff recompute against the
        new latest, not a stale change set."""
        from openaq_data_pipeline_engineering_spark.operators import (
            versioned,
        )

        root = str(tmp_path / "t")
        enable_change_feed(spark, root, ["k"])
        write_snapshot(_df(spark, [(1, "a")]), root)  # v1
        real = versioned._materialize_changes
        state = {"fired": False}

        def racing(spark_, root_, version_, expected):
            base = real(spark_, root_, version_, expected)
            if not state["fired"]:
                state["fired"] = True
                # racer appends AFTER the diff was computed vs v1
                append_rows(_df(spark_, [(9, "racer")]), root_)
            return base

        monkeypatch.setattr(versioned, "_materialize_changes", racing)
        v = write_snapshot(_df(spark, [(1, "A")]), root)
        monkeypatch.undo()
        # the committed change set accounts for the racer's row: the
        # diff base was recomputed against latest (v1 + racer append)
        ch = {
            (r["k"], r["_change_type"])
            for r in _changes_of(spark, root, v).collect()
        }
        assert ch == {
            (1, "update_preimage"),
            (1, "update_postimage"),
            (9, "delete"),  # racer's row absent from the new full state
        }
        assert {tuple(r) for r in read_snapshot(spark, root).collect()} == {
            (1, "A")
        }


class TestChangeFeedStream:
    def test_stream_emits_typed_changes_exactly_once(self, spark, tmp_path):
        root = str(tmp_path / "t")
        enable_change_feed(spark, root, ["k"])
        write_snapshot(_df(spark, [(1, "a"), (2, "b")]), root)  # v1
        write_snapshot(_df(spark, [(1, "A"), (3, "c")]), root)  # v2
        register_versioned_feed(spark)
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        got = _drain_cdf(spark, root, out, ckpt)
        rows = {
            (r["k"], r["v"], r["_change_type"], r["_commit_version"])
            for r in got.collect()
        }
        assert rows == {
            (1, "a", "insert", 1),
            (2, "b", "insert", 1),
            (1, "a", "update_preimage", 2),
            (1, "A", "update_postimage", 2),
            (2, "b", "delete", 2),
            (3, "c", "insert", 2),
        }
        # exactly once: a second drain adds nothing
        got = _drain_cdf(spark, root, out, ckpt)
        assert got.count() == 6
        # appends stream as inserts with their commit version
        append_rows(_df(spark, [(4, "d")]), root)  # v3 delta
        got = _drain_cdf(spark, root, out, ckpt)
        after = {
            (r["k"], r["v"], r["_change_type"], r["_commit_version"])
            for r in got.collect()
        }
        assert after - rows == {(4, "d", "insert", 3)}
        assert got.count() == 7

    def test_pre_enablement_full_commit_fails_or_skips(self, spark, tmp_path):
        root = str(tmp_path / "t")
        write_snapshot(_df(spark, [(1, "a")]), root)  # v1: NO change files
        enable_change_feed(spark, root, ["k"])
        write_snapshot(_df(spark, [(1, "A")]), root)  # v2: has changes
        register_versioned_feed(spark)
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        from pyspark.errors.exceptions.captured import (
            StreamingQueryException,
        )

        with pytest.raises(StreamingQueryException, match="no change data"):
            _drain_cdf(spark, root, out, ckpt)
        got = _drain_cdf(
            spark,
            root,
            str(tmp_path / "out2"),
            str(tmp_path / "ckpt2"),
            ignoreChanges="true",
        )
        # v1 skipped; v2's diff (computed against v1) still streams
        assert {
            (r["k"], r["_change_type"]) for r in got.collect()
        } == {(1, "update_preimage"), (1, "update_postimage")}

    def test_admission_cap_composes_with_cdf(self, spark, tmp_path):
        root = str(tmp_path / "t")
        enable_change_feed(spark, root, ["k"])
        write_snapshot(_df(spark, [(1, "a")]), root)
        write_snapshot(_df(spark, [(2, "b")]), root)
        register_versioned_feed(spark)
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        got = _drain_cdf(
            spark, root, out, ckpt, maxVersionsPerBatch="1"
        )
        assert {r["_commit_version"] for r in got.collect()} == {1}
        got = _drain_cdf(
            spark, root, out, ckpt, maxVersionsPerBatch="1"
        )
        assert {r["_commit_version"] for r in got.collect()} == {1, 2}


class TestChangeFeedLifecycle:
    def test_purge_erases_preimages_in_change_files(self, spark, tmp_path):
        """GDPR reach: a row deleted in v2 no longer exists in any
        version's DATA, but its pre-image lives in v2/_changes — purge
        must rewrite the change files too (including versions whose
        data has zero matches)."""
        root = str(tmp_path / "t")
        enable_change_feed(spark, root, ["k"])
        write_snapshot(_df(spark, [(1, "secret"), (2, "keep")]), root)
        write_snapshot(_df(spark, [(2, "keep")]), root)  # v2 deletes k=1
        rows = purge_rows(spark, root, "v = 'secret'")
        assert (1, 1, 1) in rows  # v1 data purged
        # v2's data had no matches, but its change files did
        ch2 = {
            (r["k"], r["_change_type"])
            for r in _changes_of(spark, root, 2).collect()
        }
        assert ch2 == set()  # the delete image of the secret row is gone
        ch1 = {
            (r["k"], r["_change_type"])
            for r in _changes_of(spark, root, 1).collect()
        }
        assert ch1 == {(2, "insert")}

    def test_vacuum_reclaims_change_files_with_version(self, spark, tmp_path):
        root = str(tmp_path / "t")
        enable_change_feed(spark, root, ["k"])
        write_snapshot(_df(spark, [(1, "a")]), root)
        write_snapshot(_df(spark, [(1, "b")]), root)
        write_snapshot(_df(spark, [(1, "c")]), root)
        vacuum_snapshots(root, keep_last=1)
        assert snapshot_versions(root) == [3]
        assert not os.path.isdir(os.path.join(root, "v=1"))
        assert os.path.isdir(os.path.join(root, "v=3", "_changes"))

    def test_optimize_on_cdf_table_emits_empty_change_set(
        self, spark, tmp_path
    ):
        from openaq_data_pipeline_engineering_spark.engine import Engine

        root = str(tmp_path / "t")
        enable_change_feed(spark, root, ["k"])
        write_snapshot(_df(spark, [(1, "a"), (2, "b")]), root)
        Engine(spark).sql(f"OPTIMIZE '{root}'")
        v = snapshot_versions(root)[-1]
        # a content-identical rewrite is a non-event for consumers
        assert _changes_of(spark, root, v).count() == 0


class TestBatchTableChanges:
    def test_table_changes_matches_join_based_diff(self, spark, tmp_path):
        """The materialized fast path and the join-based diff must
        agree on a full-commit transition (consistency witness)."""
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            snapshot_changes,
            table_changes,
        )

        root = str(tmp_path / "t")
        enable_change_feed(spark, root, ["k"])
        write_snapshot(_df(spark, [(1, "a"), (2, "b")]), root)
        write_snapshot(_df(spark, [(1, "A"), (3, "c")]), root)
        fast = {
            (r["k"], r["v"], r["_change_type"])
            for r in table_changes(spark, root, v_from=1, v_to=2).collect()
        }
        joined = {
            (r["k"], r["v"], r["_change_type"])
            for r in snapshot_changes(
                spark, root, ["k"], v_from=1, v_to=2
            ).collect()
        }
        assert fast == joined
        # range including v1 adds the initial inserts with versions
        full = table_changes(spark, root, v_from=0).collect()
        assert {r["_commit_version"] for r in full} == {1, 2}

    def test_table_changes_spans_deltas_and_rejects_gaps(
        self, spark, tmp_path
    ):
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            restore_snapshot,
            table_changes,
        )

        root = str(tmp_path / "t")
        write_snapshot(_df(spark, [(1, "a")]), root)  # v1: pre-CDF
        enable_change_feed(spark, root, ["k"])
        append_rows(_df(spark, [(2, "b")]), root)  # v2 delta
        got = {
            (r["k"], r["_change_type"], r["_commit_version"])
            for r in table_changes(spark, root, v_from=1).collect()
        }
        assert got == {(2, "insert", 2)}
        with pytest.raises(ValueError, match="no materialized change"):
            table_changes(spark, root, v_from=0)  # v1 predates CDF
        restore_snapshot(root, version=1)  # v3
        with pytest.raises(ValueError, match="restore"):
            table_changes(spark, root, v_from=2)
        # empty range: typed empty result, not an error
        assert table_changes(spark, root, v_from=99).count() == 0


class TestChangeFeedSqlSurface:
    """Statement forms of the change feed: ALTER TABLE ... ENABLE
    CHANGE FEED (keys) and the table_changes('<target>', a[, b]) TVF
    in queries (Delta's table_changes parity)."""

    def _seed(self, spark, tmp_path):
        from openaq_data_pipeline_engineering_spark.engine import Engine

        eng = Engine(spark)
        root = str(tmp_path / "t")
        eng.sql(
            f"ALTER TABLE '{root}' ENABLE CHANGE FEED (k)"
        )
        write_snapshot(_df(spark, [(1, "a"), (2, "b")]), root)
        write_snapshot(_df(spark, [(2, "B"), (3, "c")]), root)
        return eng, root

    def test_alter_enable_change_feed_records_keys(self, spark, tmp_path):
        eng, root = self._seed(spark, tmp_path)
        assert change_feed_keys(root) == ["k"]
        row = eng.sql(
            f"ALTER TABLE '{root}' DROP CONSTRAINT IF EXISTS nope"
        ).first()
        assert row["action"] == "absent"  # routing still sound

    def test_alter_enable_twice_fails_loudly(self, spark, tmp_path):
        eng, root = self._seed(spark, tmp_path)
        with pytest.raises(ValueError, match="already enabled"):
            eng.sql(f"ALTER TABLE '{root}' ENABLE CHANGE FEED (k, v)")

    def test_table_changes_tvf_in_a_query(self, spark, tmp_path):
        eng, root = self._seed(spark, tmp_path)
        got = {
            (r["k"], r["v"], r["_change_type"], r["_commit_version"])
            for r in eng.sql(
                f"SELECT * FROM table_changes('{root}', 2, 2)"
            ).collect()
        }
        assert got == {
            (1, "a", "delete", 2),
            (2, "b", "update_preimage", 2),
            (2, "B", "update_postimage", 2),
            (3, "c", "insert", 2),
        }

    def test_table_changes_tvf_start_is_inclusive_like_delta(
        self, spark, tmp_path
    ):
        """ADVICE r9 #1: the SQL TVF follows DELTA's range contract —
        table_changes(t, 1, 2) includes version 1's OWN change rows
        (here the first commit's inserts), not just (1, 2]."""
        eng, root = self._seed(spark, tmp_path)
        got = {
            (r["k"], r["v"], r["_change_type"], r["_commit_version"])
            for r in eng.sql(
                f"SELECT * FROM table_changes('{root}', 1, 2)"
            ).collect()
        }
        assert got == {
            (1, "a", "insert", 1),
            (2, "b", "insert", 1),
            (1, "a", "delete", 2),
            (2, "b", "update_preimage", 2),
            (2, "B", "update_postimage", 2),
            (3, "c", "insert", 2),
        }

    def test_table_changes_tvf_composes_with_aggregation(
        self, spark, tmp_path
    ):
        eng, root = self._seed(spark, tmp_path)
        row = eng.sql(
            "SELECT _change_type, COUNT(*) AS n FROM "
            f"table_changes('{root}', 2) "
            "GROUP BY _change_type ORDER BY _change_type"
        ).collect()
        assert [(r["_change_type"], r["n"]) for r in row] == [
            ("delete", 1),
            ("insert", 1),
            ("update_postimage", 1),
            ("update_preimage", 1),
        ]

    def test_table_changes_tvf_over_registered_name(self, spark, tmp_path):
        eng, root = self._seed(spark, tmp_path)
        eng.register_versioned("cdf_tbl", root)
        got = {
            r["_change_type"]
            for r in eng.sql(
                "SELECT _change_type FROM table_changes('cdf_tbl', 2, 2)"
            ).collect()
        }
        assert got == {
            "delete",
            "insert",
            "update_preimage",
            "update_postimage",
        }

    def test_tvf_inside_a_string_literal_is_not_rewritten(
        self, spark, tmp_path
    ):
        eng, _root = self._seed(spark, tmp_path)
        row = eng.sql(
            "SELECT \"call table_changes('x', 1)\" AS note"
        ).first()
        assert row["note"] == "call table_changes('x', 1)"


class TestRewritesComposeWithStatements:
    """AS-OF and table_changes() splices run before statement routing,
    so they compose with INSERT bodies and MERGE sources."""

    def test_insert_from_a_time_travel_read(self, spark, tmp_path):
        from openaq_data_pipeline_engineering_spark.engine import Engine

        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        write_snapshot(_df(spark, [(1, "a"), (2, "b")]), src)  # v1
        write_snapshot(_df(spark, [(9, "z")]), src)  # v2
        eng = Engine(spark)
        eng.sql(
            f"INSERT OVERWRITE '{dst}' "
            f"SELECT * FROM '{src}' VERSION AS OF 1"
        )
        assert {
            tuple(r) for r in read_snapshot(spark, dst).collect()
        } == {(1, "a"), (2, "b")}

    def test_merge_using_a_table_changes_source(self, spark, tmp_path):
        from openaq_data_pipeline_engineering_spark.engine import Engine

        cdc = str(tmp_path / "cdc")
        tgt = str(tmp_path / "tgt")
        enable_change_feed(spark, cdc, keys=["k"])
        write_snapshot(_df(spark, [(1, "a"), (2, "b")]), cdc)  # v1
        write_snapshot(_df(spark, [(1, "a"), (2, "B"), (3, "c")]), cdc)
        write_snapshot(_df(spark, [(1, "a"), (2, "b")]), tgt)
        eng = Engine(spark)
        # replicate commit 2's changes into the target: post-images and
        # inserts upsert, deletes would be handled by a DELETE clause
        m = eng.sql(
            f"MERGE INTO '{tgt}' AS t USING ("
            f"  SELECT k, v FROM table_changes('{cdc}', 2, 2)"
            "   WHERE _change_type IN ('insert', 'update_postimage')"
            ") AS s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = s.v "
            "WHEN NOT MATCHED THEN INSERT *"
        ).first()
        assert m["version"] == 2
        assert {
            tuple(r) for r in read_snapshot(spark, tgt).collect()
        } == {(1, "a"), (2, "B"), (3, "c")}


class TestConcurrentSpliceIsolation:
    def test_threaded_engine_sql_splices_never_clobber(self, spark, tmp_path):
        """Concurrent Engine.sql calls each pin their own temp views
        (process-wide counter): AS-OF and TVF reads running in 8
        threads over distinct roots must each see their own table."""
        import threading

        from openaq_data_pipeline_engineering_spark.engine import Engine

        eng = Engine(spark)
        roots = []
        for i in range(4):
            root = str(tmp_path / f"t{i}")
            enable_change_feed(spark, root, keys=["k"])
            write_snapshot(_df(spark, [(i, "x")]), root)
            write_snapshot(_df(spark, [(i, "y")]), root)
            roots.append(root)
        results: dict[str, object] = {}
        barrier = threading.Barrier(8)

        def tt(i: int) -> None:
            barrier.wait()
            rows = eng.sql(
                f"SELECT k, v FROM '{roots[i]}' VERSION AS OF 1"
            ).collect()
            results[f"tt{i}"] = {tuple(r) for r in rows}

        def tvf(i: int) -> None:
            barrier.wait()
            rows = eng.sql(
                "SELECT k, v, _change_type "
                f"FROM table_changes('{roots[i]}', 2, 2)"
            ).collect()
            results[f"tvf{i}"] = {tuple(r) for r in rows}

        ts = [threading.Thread(target=tt, args=(i,)) for i in range(4)] + [
            threading.Thread(target=tvf, args=(i,)) for i in range(4)
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        for i in range(4):
            assert results[f"tt{i}"] == {(i, "x")}, results
            assert results[f"tvf{i}"] == {
                (i, "x", "update_preimage"),
                (i, "y", "update_postimage"),
            }, results
