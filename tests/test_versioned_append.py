"""Append (delta) versions: chain reads, retention, idempotence.

ADVICE r7 follow-up: the streaming dead-letter sink must append
O(batch) per commit, not rewrite O(history) — operators/versioned.py
``append_rows`` gives the commit protocol a delta mode, and these
tests pin the chain-resolution semantics it rides on.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.operators.versioned import (
    _read_manifest_doc,
    _write_manifest,
    append_rows,
    checkpoint_appends,
    read_snapshot,
    snapshot_modes,
    snapshot_versions,
    vacuum_snapshots,
    write_snapshot,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def _rows(df):
    return {tuple(r) for r in df.collect()}


class TestAppendRows:
    def test_chain_read_is_base_plus_deltas(self, spark, tmp_path):
        root = str(tmp_path / "t")
        write_snapshot(_df(spark, [(1, "a")]), root)
        v2 = append_rows(_df(spark, [(2, "b")]), root)
        v3 = append_rows(_df(spark, [(3, "c")]), root)
        assert snapshot_versions(root) == [1, 2, 3]
        assert snapshot_modes(root) == {2: "delta", 3: "delta"}
        assert _rows(read_snapshot(spark, root)) == {
            (1, "a"), (2, "b"), (3, "c"),
        }
        # time travel onto a mid-chain delta sees base + that delta only
        assert _rows(read_snapshot(spark, root, version=v2)) == {
            (1, "a"), (2, "b"),
        }
        assert v3 == 3

    def test_append_only_table_without_full_base(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_rows(_df(spark, [(1, "a")]), root)
        append_rows(_df(spark, [(2, "b")]), root)
        assert _rows(read_snapshot(spark, root)) == {(1, "a"), (2, "b")}
        assert _rows(read_snapshot(spark, root, version=1)) == {(1, "a")}

    def test_full_write_rebases_the_chain(self, spark, tmp_path):
        root = str(tmp_path / "t")
        write_snapshot(_df(spark, [(1, "a")]), root)
        append_rows(_df(spark, [(2, "b")]), root)
        write_snapshot(_df(spark, [(9, "z")]), root)  # v3: full, re-base
        append_rows(_df(spark, [(10, "y")]), root)
        assert _rows(read_snapshot(spark, root)) == {(9, "z"), (10, "y")}
        # old chain still resolvable until vacuumed
        assert _rows(read_snapshot(spark, root, version=2)) == {
            (1, "a"), (2, "b"),
        }

    def test_append_txn_idempotent(self, spark, tmp_path):
        root = str(tmp_path / "t")
        write_snapshot(_df(spark, [(1, "a")]), root)
        v = append_rows(_df(spark, [(2, "b")]), root, txn_id="b-1")
        v2 = append_rows(_df(spark, [(2, "b")]), root, txn_id="b-1")
        assert v == v2
        assert snapshot_versions(root) == [1, 2]
        assert read_snapshot(spark, root).count() == 2

    def test_schema_evolving_append_null_backfills(self, spark, tmp_path):
        root = str(tmp_path / "t")
        write_snapshot(_df(spark, [(1, "a")]), root)
        append_rows(
            spark.createDataFrame(
                [(2, "b", 7.5)], "k int, v string, score double"
            ),
            root,
        )
        out = read_snapshot(spark, root)
        assert set(out.columns) == {"k", "v", "score"}
        got = {r["k"]: r["score"] for r in out.collect()}
        assert got == {1: None, 2: 7.5}


class TestChainAwareVacuum:
    def test_vacuum_keeps_chain_base_of_kept_delta(self, spark, tmp_path):
        root = str(tmp_path / "t")
        write_snapshot(_df(spark, [(1, "a")]), root)  # v1 full
        append_rows(_df(spark, [(2, "b")]), root)  # v2
        append_rows(_df(spark, [(3, "c")]), root)  # v3
        # keep_last=1 would drop v1+v2 — but v3 still reads them
        assert vacuum_snapshots(root, keep_last=1) == []
        assert snapshot_versions(root) == [1, 2, 3]
        assert read_snapshot(spark, root).count() == 3

    def test_checkpoint_unlocks_vacuum(self, spark, tmp_path):
        root = str(tmp_path / "t")
        write_snapshot(_df(spark, [(1, "a")]), root)
        append_rows(_df(spark, [(2, "b")]), root)
        v = checkpoint_appends(spark, root)  # v3 = full union
        assert snapshot_modes(root).get(v, "full") == "full"
        dropped = vacuum_snapshots(root, keep_last=1)
        assert dropped == [1, 2]
        assert _rows(read_snapshot(spark, root)) == {(1, "a"), (2, "b")}

    def test_vacuum_drops_prior_chain_behind_new_full(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_rows(_df(spark, [(1, "a")]), root)  # v1 (delta, no base)
        append_rows(_df(spark, [(2, "b")]), root)  # v2
        write_snapshot(_df(spark, [(9, "z")]), root)  # v3 full
        append_rows(_df(spark, [(10, "y")]), root)  # v4
        dropped = vacuum_snapshots(root, keep_last=2)
        # kept = v3, v4; chain base of v3 (oldest kept) is v3 itself
        assert dropped == [1, 2]
        assert _rows(read_snapshot(spark, root)) == {(9, "z"), (10, "y")}


class TestCommitTimeSemantics:
    def test_as_of_resolution_is_reader_view_under_out_of_order_commits(
        self, spark, tmp_path
    ):
        # ADVICE r7: two concurrent writers can commit out of version
        # order (v6 allocated+committed before v5). TIMESTAMP AS OF
        # must return what read_snapshot() (latest) returned to a
        # reader at that instant: the max COMMITTED version, not the
        # max-timestamp one. Craft the manifest directly to simulate.
        root = str(tmp_path / "t")
        write_snapshot(_df(spark, [(1, "a")]), root)  # v1
        write_snapshot(_df(spark, [(2, "b")]), root)  # v2
        doc = _read_manifest_doc(root)
        # rewrite history: v2 committed FIRST (ts=100), v1 second (200)
        _write_manifest(
            root, doc["versions"], doc["txns"], {1: 200.0, 2: 100.0}
        )
        # at ts=150 only v2 was committed -> reader saw v2
        assert _rows(read_snapshot(spark, root, as_of_ts=150.0)) == {
            (2, "b")
        }
        # at ts=250 both committed -> reader saw latest = max version
        assert _rows(read_snapshot(spark, root, as_of_ts=250.0)) == {
            (2, "b")
        }
        # pinned reads unaffected
        assert _rows(read_snapshot(spark, root, version=1)) == {(1, "a")}

    def test_commit_times_strictly_increase_in_commit_order(
        self, spark, tmp_path
    ):
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            snapshot_commit_times,
        )

        root = str(tmp_path / "t")
        for i in range(3):
            write_snapshot(_df(spark, [(i, "x")]), root)
        ts = snapshot_commit_times(root)
        ordered = [ts[v] for v in sorted(ts)]
        assert ordered == sorted(ordered)
        assert len(set(ordered)) == 3


class TestAppendedCdf:
    def test_change_feed_across_delta_versions(self, spark, tmp_path):
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            snapshot_changes,
        )

        root = str(tmp_path / "t")
        write_snapshot(_df(spark, [(1, "a")]), root)
        append_rows(_df(spark, [(2, "b")]), root)
        append_rows(_df(spark, [(3, "c")]), root)
        feed = snapshot_changes(spark, root, ["k"], v_from=2, v_to=3)
        assert {(r["k"], r["_change_type"]) for r in feed.collect()} == {
            (3, "insert")
        }


class TestStreamingDeadLetterIsAppendOnly:
    def test_quality_split_appends_o_batch_versions(self, spark, tmp_path):
        # The dead-letter table must accumulate one DELTA version per
        # micro-batch whose directory holds only that batch's rows —
        # the O(history) rewrite was the r7 advice finding.
        import os

        from openaq_data_pipeline_engineering_spark.streaming.quality import (
            quality_split_batch,
        )

        valid_dir = str(tmp_path / "valid")
        dead_dir = str(tmp_path / "dead")
        rules = {"v_ok": "v = 'a'"}
        b0 = spark.createDataFrame(
            [(1, "a", 10.0), (2, "x", 20.0)], "k int, v string, ts double"
        )
        b1 = spark.createDataFrame(
            [(3, "y", 30.0)], "k int, v string, ts double"
        )
        quality_split_batch(
            b0, 0, rules, valid_dir, dead_dir, ["k"], "ts"
        )
        quality_split_batch(
            b1, 1, rules, valid_dir, dead_dir, ["k"], "ts"
        )
        assert snapshot_modes(dead_dir) == {1: "delta", 2: "delta"}
        # each version dir holds only its batch's dead rows
        v1 = spark.read.parquet(os.path.join(dead_dir, "v=1"))
        v2 = spark.read.parquet(os.path.join(dead_dir, "v=2"))
        assert [r["k"] for r in v1.collect()] == [2]
        assert [r["k"] for r in v2.collect()] == [3]
        dead = read_snapshot(spark, dead_dir)
        assert {r["k"] for r in dead.collect()} == {2, 3}
        assert {r["batch_id"] for r in dead.collect()} == {0, 1}
        # replay of batch 1 is a no-op on both tables
        quality_split_batch(
            b1, 1, rules, valid_dir, dead_dir, ["k"], "ts"
        )
        assert read_snapshot(spark, dead_dir).count() == 2
        assert {r["k"] for r in read_snapshot(spark, valid_dir).collect()} == {
            1
        }


class TestAutoRebase:
    def test_chain_length_is_bounded_over_long_append_run(
        self, spark, tmp_path
    ):
        """VERDICT r8 #3: nothing used to bound an append chain — a
        long-running dead-letter stream accumulated one directory per
        batch forever. With max_chain_deltas=K every read resolves at
        most K deltas + 1 base, while content stays exact."""
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            _chain_versions,
            _read_manifest_doc,
        )

        root = str(tmp_path / "t")
        K = 3
        max_seen = 0
        for i in range(12):
            append_rows(_df(spark, [(i, f"r{i}")]), root, max_chain_deltas=K)
            doc = _read_manifest_doc(root)
            latest = doc["versions"][-1]
            chain = _chain_versions(doc["versions"], doc["modes"], latest)
            n_deltas = sum(
                1 for v in chain if doc["modes"].get(v) == "delta"
            )
            max_seen = max(max_seen, n_deltas)
            assert n_deltas <= K, (i, chain, doc["modes"])
        # the policy actually fired (at least one full rebase exists)
        modes = snapshot_modes(root)
        assert any(m == "full" for m in modes.values()) or (
            len(_read_manifest_doc(root)["versions"])
            > len([m for m in modes.values() if m == "delta"])
        )
        assert _rows(read_snapshot(spark, root)) == {
            (i, f"r{i}") for i in range(12)
        }
        # old chain versions stay time-travelable until vacuum, and
        # vacuum can now reclaim everything behind the newest rebase
        dropped = vacuum_snapshots(root, keep_last=1)
        assert dropped, "rebase should unlock retention"
        assert _rows(read_snapshot(spark, root)) == {
            (i, f"r{i}") for i in range(12)
        }

    def test_rebase_skips_quietly_when_racer_advances_table(
        self, spark, tmp_path, monkeypatch
    ):
        """The policy must never fail the append it rides on: a racer
        committing mid-checkpoint turns the rebase into a no-op (the
        next append re-fires it)."""
        from openaq_data_pipeline_engineering_spark.operators import (
            versioned,
        )

        root = str(tmp_path / "t")
        for i in range(3):
            append_rows(_df(spark, [(i, "x")]), root)

        def always_conflict(*a, **k):
            raise versioned.ConcurrentWriteError("simulated racer")

        monkeypatch.setattr(versioned, "checkpoint_appends", always_conflict)
        v = append_rows(
            _df(spark, [(9, "y")]), root, max_chain_deltas=1
        )
        monkeypatch.undo()
        assert v in snapshot_versions(root)
        assert (9, "y") in _rows(read_snapshot(spark, root))
