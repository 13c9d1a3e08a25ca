"""Round-10 ADVICE fixes (ADVICE.md r9).

#1 table_changes TVF follows Delta's INCLUSIVE range contract (pinned
   in tests/test_change_feed_stream.py —
   test_table_changes_tvf_start_is_inclusive_like_delta).
#2 versionize_table's claim-to-marker crash window: a root-level
   _CONVERTING marker written BEFORE the v=1 claim lets a retry adopt
   its own crashed, unmarked, empty claim instead of wedging on
   ConcurrentWriteError until the orphan grace.
#3 compact/OPTIMIZE partition_filter string-compare semantics
   (documented; behavior pinned here).
#4 ENABLE CHANGE FEED on an empty root validates identifiers at the
   statement and the first commit validates the keys against the real
   schema with an error pointing back at the enablement.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.engine import Engine
from openaq_data_pipeline_engineering_spark.operators.versioned import (
    ConcurrentWriteError,
    enable_change_feed,
    read_snapshot,
    snapshot_versions,
    versionize_table,
    write_snapshot,
)


class TestVersionizeCrashWindow:
    def _plain(self, spark, tmp_path, name="p"):
        root = str(tmp_path / name)
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "k long, v string"
        ).write.parquet(root)
        return root

    def test_crash_between_claim_and_marker_is_adopted(
        self, spark, tmp_path
    ):
        """Simulate the exact crash: root marker written, v=1 claimed,
        in-directory marker NOT yet written. The retry must adopt the
        claim and finish the conversion (previously: wedged forever on
        ConcurrentWriteError)."""
        root = self._plain(spark, tmp_path)
        with open(os.path.join(root, "_CONVERTING"), "w") as f:
            f.write("versionize_table in progress")
        os.mkdir(os.path.join(root, "v=1"))  # the crashed claim
        assert versionize_table(root) == 1
        assert snapshot_versions(root) == [1]
        assert read_snapshot(spark, root).count() == 2
        assert not os.path.exists(os.path.join(root, "_CONVERTING"))
        assert not os.path.exists(os.path.join(root, "v=1", "_CONVERTING"))

    def test_foreign_claim_without_root_marker_still_refuses(
        self, spark, tmp_path
    ):
        """An empty v=1 claim with NO root marker belongs to a
        concurrent ordinary writer — the conversion must refuse, and
        must not leave its own fresh root marker behind."""
        root = self._plain(spark, tmp_path)
        os.mkdir(os.path.join(root, "v=1"))
        with pytest.raises(ConcurrentWriteError, match="already claimed"):
            versionize_table(root)
        assert not os.path.exists(os.path.join(root, "_CONVERTING"))

    def test_foreign_claim_with_data_refuses_even_with_marker(
        self, spark, tmp_path
    ):
        """Root marker present but the claim already holds entries —
        that is someone's data write, not our crashed empty claim."""
        root = self._plain(spark, tmp_path)
        with open(os.path.join(root, "_CONVERTING"), "w") as f:
            f.write("x")
        os.mkdir(os.path.join(root, "v=1"))
        with open(os.path.join(root, "v=1", "part-0.parquet"), "wb") as f:
            f.write(b"stub")
        with pytest.raises(ConcurrentWriteError, match="already claimed"):
            versionize_table(root)

    def test_clean_conversion_leaves_no_markers(self, spark, tmp_path):
        root = self._plain(spark, tmp_path, "clean")
        assert versionize_table(root) == 1
        assert not os.path.exists(os.path.join(root, "_CONVERTING"))
        assert read_snapshot(spark, root).count() == 2


class TestEnableChangeFeedValidation:
    def test_bad_identifier_rejected_at_the_statement(self, spark, tmp_path):
        from openaq_data_pipeline_engineering_spark.operators.sqlutil import (
            UtilStatementError,
        )

        root = str(tmp_path / "cdfbad")
        with pytest.raises(UtilStatementError, match="invalid"):
            Engine(spark).sql(
                f"ALTER TABLE '{root}' ENABLE CHANGE FEED (k, )"
            )
        with pytest.raises(UtilStatementError, match="invalid"):
            Engine(spark).sql(
                f"ALTER TABLE '{root}' ENABLE CHANGE FEED (k v)"
            )

    def test_typod_key_fails_at_first_commit_with_pointer(
        self, spark, tmp_path
    ):
        """A well-formed but nonexistent key recorded on an EMPTY root
        must fail the FIRST commit with an error naming ENABLE CHANGE
        FEED — not a confusing diff failure at the second commit."""
        root = str(tmp_path / "cdftypo")
        enable_change_feed(spark, root, ["kay"])  # typo for "k"
        with pytest.raises(ValueError, match="ENABLE CHANGE FEED"):
            write_snapshot(
                spark.createDataFrame([(1, "a")], "k long, v string"), root
            )
        assert snapshot_versions(root) == []  # nothing committed

    def test_valid_key_on_empty_root_commits_fine(self, spark, tmp_path):
        root = str(tmp_path / "cdfok")
        Engine(spark).sql(f"ALTER TABLE '{root}' ENABLE CHANGE FEED (k)")
        write_snapshot(
            spark.createDataFrame([(1, "a")], "k long, v string"), root
        )
        assert snapshot_versions(root) == [1]


class TestCompactPartitionFilterSpelling:
    def test_quoted_literal_matches_raw_spelling_only(self, spark, tmp_path):
        """Pin the documented contract: partition columns are STRING
        holding the raw directory spelling, so month = '1' does not
        select month=01, while the unquoted month = 1 implicit-casts
        and matches it."""
        from openaq_data_pipeline_engineering_spark.operators.compact import (
            read_preserving_partitions,
        )

        path = str(tmp_path / "padded")
        spark.createDataFrame(
            [(1, "01"), (2, "01"), (3, "12")], "k long, month string"
        ).write.partitionBy("month").parquet(path)
        df = read_preserving_partitions(spark, path, ["month"])
        assert df.filter("month = '1'").count() == 0
        assert df.filter("month = '01'").count() == 2
        assert df.filter("month = 1").count() == 2  # implicit cast
