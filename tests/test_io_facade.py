"""save_versioned / load_versioned — the DataFrameWriter-parity facade
(VERDICT r9 #8). Thin forwarding plus Spark save-mode vocabulary mapped
onto the immutable-version protocol."""

from __future__ import annotations

import pytest

from openaq_data_pipeline_engineering_spark import load_versioned, save_versioned
from openaq_data_pipeline_engineering_spark.operators.versioned import (
    snapshot_modes,
    snapshot_versions,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def _rows(df):
    return {tuple(r) for r in df.collect()}


class TestSaveModes:
    def test_overwrite_append_load(self, spark, tmp_path):
        root = str(tmp_path / "t")
        assert save_versioned(_df(spark, [(1, "a")]), root) == 1
        assert save_versioned(
            _df(spark, [(2, "b")]), root, mode="append"
        ) == 2
        assert snapshot_modes(root) == {2: "delta"}
        assert _rows(load_versioned(spark, root)) == {(1, "a"), (2, "b")}
        assert _rows(load_versioned(spark, root, version=1)) == {(1, "a")}

    def test_errorifexists_and_ignore(self, spark, tmp_path):
        root = str(tmp_path / "t")
        assert save_versioned(
            _df(spark, [(1, "a")]), root, mode="error"
        ) == 1
        with pytest.raises(FileExistsError):
            save_versioned(_df(spark, [(9, "z")]), root, mode="errorifexists")
        assert save_versioned(
            _df(spark, [(9, "z")]), root, mode="ignore"
        ) == 1  # no-op: returns current latest
        assert snapshot_versions(root) == [1]
        assert _rows(load_versioned(spark, root)) == {(1, "a")}

    def test_bad_mode_rejected(self, spark, tmp_path):
        with pytest.raises(ValueError, match="mode"):
            save_versioned(
                _df(spark, [(1, "a")]), str(tmp_path / "t"), mode="upsert"
            )

    def test_txn_and_expected_latest_forward(self, spark, tmp_path):
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            ConcurrentWriteError,
        )

        root = str(tmp_path / "t")
        v = save_versioned(_df(spark, [(1, "a")]), root, txn_id="b0")
        assert save_versioned(
            _df(spark, [(2, "X")]), root, txn_id="b0"
        ) == v  # idempotent replay
        save_versioned(_df(spark, [(3, "c")]), root)  # table advances
        with pytest.raises(ConcurrentWriteError):
            save_versioned(
                _df(spark, [(4, "d")]), root, expected_latest=v
            )

    def test_auto_rebase_forwards(self, spark, tmp_path):
        root = str(tmp_path / "t")
        save_versioned(_df(spark, [(0, "base")]), root)
        for i in range(4):
            save_versioned(
                _df(spark, [(i + 1, "d")]),
                root,
                mode="append",
                max_chain_deltas=2,
            )
        modes = snapshot_modes(root)
        # the policy checkpointed at least once: some later version is
        # a full re-base, and the latest chain reads correctly
        assert any(
            v not in modes for v in snapshot_versions(root)[1:]
        )
        assert load_versioned(spark, root).count() == 5
