"""File-granular conflict RESOLUTION on the fileset commit protocol
(round 12): a DML statement that loses the manifest CAS race no longer
always re-executes — when the winner's commit is provably disjoint
(none of this statement's rewritten files were touched, none of the
winner's added rows match this statement's read predicate), the
already-materialized rewrite LOGICALLY REBASES onto the new head and
commits with both writers' changes. Delta's conflict-resolution rules
(ConcurrentAppendException / ConcurrentDeleteReadException), done
exactly rather than at partition granularity — see
operators/cow.py::_try_conflict_merge for the safety argument.

The deterministic race uses InMemoryMetadataStore's ``before_write``
hook: the competing statement commits between the loser's read and its
conditional PUT, exactly the object-store interleaving."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.engine import Engine
from openaq_data_pipeline_engineering_spark.operators.cow import (
    COW_STATS_SIDECAR,
    last_cow_stats,
)
from openaq_data_pipeline_engineering_spark.operators.filesets import (
    is_fileset_dir,
    read_fileset,
)
from openaq_data_pipeline_engineering_spark.operators.metastore import (
    InMemoryMetadataStore,
    set_metadata_store,
)
from openaq_data_pipeline_engineering_spark.operators.versioned import (
    read_snapshot,
    snapshot_versions,
    write_snapshot,
)


@pytest.fixture()
def mem_store():
    s = InMemoryMetadataStore()
    prev = set_metadata_store(s)
    try:
        yield s
    finally:
        set_metadata_store(prev)


def _seed_ranged(spark, tmp_path, n=400, files=4, name="t"):
    """Range-partitioned files: tight per-file k ranges, so updates on
    far-apart keys deterministically touch DIFFERENT files."""
    root = str(tmp_path / name)
    df = spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("double").alias("score"),
    )
    write_snapshot(df.repartitionByRange(files, "k"), root)
    return root


def _stats_sidecar(root: str, version: int) -> dict:
    with open(
        os.path.join(root, f"v={version}", COW_STATS_SIDECAR)
    ) as f:
        return json.load(f)


class TestDisjointMerge:
    def test_lost_race_merges_disjoint_update_without_rerun(
        self, spark, tmp_path, mem_store
    ):
        """Loser's UPDATE (k=5, file 0) races winner's UPDATE (k=350,
        file 3): the loser merges — one rewrite each, both changes in
        the final version, the loser's commit re-numbered ABOVE the
        winner's."""
        root = _seed_ranged(spark, tmp_path)
        eng = Engine(spark)

        def compete(_root, _data):
            eng.sql(f"UPDATE '{root}' SET score = 222.0 WHERE k = 350")

        mem_store.before_write = compete
        eng.sql(f"UPDATE '{root}' SET score = 111.0 WHERE k = 5").first()

        versions = snapshot_versions(root)
        # v1 seed, v3 winner (the loser's abandoned claim was v2),
        # loser re-claimed above the head
        assert versions[0] == 1 and len(versions) == 3
        assert versions[-1] > versions[-2] >= 3
        out = read_snapshot(spark, root)
        assert out.count() == 400
        assert out.filter("k = 5").first()["score"] == 111.0
        assert out.filter("k = 350").first()["score"] == 222.0

        stats = last_cow_stats(root)
        assert stats["conflict_merges"] == 1
        assert stats["copy_syscalls"] == 0
        assert stats["base_version"] == versions[-2]  # rebased on head
        assert stats["files_rewritten"] == 1
        sidecar = _stats_sidecar(root, versions[-1])
        assert sidecar["conflict_merges"] == 1
        # the merged fileset preserves the WINNER's rewrite (owner =
        # winner's version) and references untouched files at v1
        latest_dir = os.path.join(root, f"v={versions[-1]}")
        assert is_fileset_dir(latest_dir)
        owners = {
            int(e["v"]) for e in read_fileset(latest_dir)["entries"]
        }
        assert versions[-2] in owners and 1 in owners

    def test_merged_version_time_travels_and_vacuums(
        self, spark, tmp_path, mem_store
    ):
        """The merged commit is an ordinary fileset version: time
        travel to every version stays green and VACUUM keeps every
        referenced owner alive."""
        root = _seed_ranged(spark, tmp_path)
        eng = Engine(spark)

        def compete(_root, _data):
            eng.sql(f"UPDATE '{root}' SET score = 9.0 WHERE k = 399")

        mem_store.before_write = compete
        eng.sql(f"DELETE FROM '{root}' WHERE k = 0").first()
        versions = snapshot_versions(root)
        assert read_snapshot(spark, root, version=1).count() == 400
        mid = read_snapshot(spark, root, version=versions[-2])
        assert mid.filter("k = 399").first()["score"] == 9.0
        assert mid.count() == 400
        head = read_snapshot(spark, root)
        assert head.count() == 399
        assert head.filter("k = 399").first()["score"] == 9.0
        eng.sql(f"VACUUM '{root}' RETAIN 1 VERSIONS").collect()
        assert read_snapshot(spark, root).count() == 399


class TestConflictDeclines:
    def test_same_file_conflict_re_executes_statement(
        self, spark, tmp_path, mem_store
    ):
        """Winner rewrote the very file the loser touched (k=5 and k=7
        share file 0): the merge declines and the statement-level
        retry re-executes against the head — both updates land, the
        loser's final commit is NOT a merge."""
        root = _seed_ranged(spark, tmp_path)
        eng = Engine(spark)

        def compete(_root, _data):
            eng.sql(f"UPDATE '{root}' SET score = 7.7 WHERE k = 7")

        mem_store.before_write = compete
        eng.sql(f"UPDATE '{root}' SET score = 5.5 WHERE k = 5").first()
        out = read_snapshot(spark, root)
        assert out.filter("k = 5").first()["score"] == 5.5
        assert out.filter("k = 7").first()["score"] == 7.7
        stats = last_cow_stats(root)
        assert stats["conflict_merges"] == 0  # re-ran, didn't merge
        assert stats["base_version"] == snapshot_versions(root)[-2]

    def test_winner_added_matching_rows_decline_merge(
        self, spark, tmp_path, mem_store
    ):
        """SERIALIZABILITY pin: the winner's rewrite ADDS a row that
        matches the loser's predicate (score=333 appears in file 3
        while the loser updates WHERE score = 333 discovered in file
        0). A blind merge would leave the winner's new row
        un-updated; the rescan catches it and the statement
        re-executes, updating BOTH rows."""
        root = str(tmp_path / "t")
        df = spark.range(0, 400).select(
            F.col("id").alias("k"),
            F.when(F.col("id") == 5, 333.0)
            .otherwise((F.col("id") % 7).cast("double"))
            .alias("score"),
        )
        write_snapshot(df.repartitionByRange(4, "k"), root)
        eng = Engine(spark)

        def compete(_root, _data):
            eng.sql(f"UPDATE '{root}' SET score = 333.0 WHERE k = 350")

        mem_store.before_write = compete
        eng.sql(
            f"UPDATE '{root}' SET score = -1.0 WHERE score = 333.0"
        ).first()
        out = read_snapshot(spark, root)
        # re-execution saw the winner's new 333-row and updated it too
        assert out.filter("score = 333.0").count() == 0
        assert out.filter("k = 5").first()["score"] == -1.0
        assert out.filter("k = 350").first()["score"] == -1.0
        assert last_cow_stats(root)["conflict_merges"] == 0


class TestPartitionedAndCompaction:
    def test_partitioned_disjoint_updates_merge(
        self, spark, tmp_path, mem_store
    ):
        """Two updates on DIFFERENT partitions of a Hive-partitioned
        base merge: partition layout preserved, both rewrites in the
        final version."""
        root = str(tmp_path / "tp")
        df = spark.createDataFrame(
            [(i, (i % 5), float(i)) for i in range(200)],
            "k long, g int, score double",
        )
        write_snapshot(
            df.repartition(2, "k"), root, partition_by=["g"]
        )
        eng = Engine(spark)

        def compete(_root, _data):
            eng.sql(f"UPDATE '{root}' SET score = -2.0 WHERE g = 2")

        mem_store.before_write = compete
        eng.sql(f"UPDATE '{root}' SET score = -3.0 WHERE g = 3").first()
        out = read_snapshot(spark, root)
        assert out.count() == 200
        assert (
            out.filter("g = 2").agg(F.max("score")).first()[0] == -2.0
        )
        assert (
            out.filter("g = 3").agg(F.max("score")).first()[0] == -3.0
        )
        assert out.filter("g = 1").count() == 40  # untouched carried
        stats = last_cow_stats(root)
        assert stats["conflict_merges"] == 1
        assert stats["copy_syscalls"] == 0

    def test_optimize_incremental_merges_over_concurrent_update(
        self, spark, tmp_path, mem_store
    ):
        """Compaction races an UPDATE that rewrote a file compaction
        does NOT pack (a fat file): content-preserving, so the pack
        merges — the winner's rewrite carries into the compacted
        version untouched and both results land."""
        root = str(tmp_path / "tc")
        # fat files in g=0 (incompressible md5 padding), small files
        # in every other partition — same shape as the
        # test_optimize_incremental seeding
        df = spark.range(0, 25).select(
            F.col("id").alias("k"),
            (F.col("id") % 5).cast("int").alias("g"),
            F.when(
                F.col("id") % 5 == 0,
                F.concat_ws(
                    "",
                    *[
                        F.md5(
                            F.concat(
                                F.col("id").cast("string"), F.lit(i)
                            )
                        )
                        for i in range(100)
                    ],
                ),
            )
            .otherwise(F.lit("s"))
            .alias("pad"),
        )
        write_snapshot(df.repartition(2, "k"), root, partition_by=["g"])
        eng = Engine(spark)

        def compete(_root, _data):
            # k=10 is a fat g=0 row: the winner rewrites a BIG file,
            # which compaction (TARGET 4000) never packs
            eng.sql(f"UPDATE '{root}' SET pad = 'XL' WHERE k = 10")

        mem_store.before_write = compete
        res = eng.sql(
            f"OPTIMIZE '{root}' INCREMENTAL TARGET 4000 BYTES"
        ).first()
        assert res["n_files_after"] < res["n_files_before"]
        out = read_snapshot(spark, root)
        assert out.count() == 25
        assert out.filter("k = 10").first()["pad"] == "XL"
        versions = snapshot_versions(root)
        sidecar = _stats_sidecar(root, versions[-1])
        assert sidecar["conflict_merges"] >= 1
        assert sidecar["base_version"] == versions[-2]
        assert sidecar["copy_syscalls"] == 0


class TestMergeStatementRaces:
    def test_merge_update_race_merges_when_disjoint(
        self, spark, tmp_path, mem_store
    ):
        """A MERGE whose matched-update touches file 0 races an UPDATE
        that rewrote file 3: the ON-join rescan finds no winner-added
        row matching the source, so the MERGE merges — one rewrite
        each."""
        root = _seed_ranged(spark, tmp_path)
        spark.createDataFrame(
            [(5, 555.0)], "k long, s_score double"
        ).createOrReplaceTempView("cm_src_a")
        eng = Engine(spark)

        def compete(_root, _data):
            eng.sql(f"UPDATE '{root}' SET score = 222.0 WHERE k = 350")

        mem_store.before_write = compete
        eng.sql(
            f"MERGE INTO '{root}' AS t USING cm_src_a AS s "
            "ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET score = s.s_score"
        ).first()
        out = read_snapshot(spark, root)
        assert out.count() == 400
        assert out.filter("k = 5").first()["score"] == 555.0
        assert out.filter("k = 350").first()["score"] == 222.0
        stats = last_cow_stats(root)
        assert stats["conflict_merges"] == 1
        assert stats["copy_syscalls"] == 0

    def test_merge_declines_when_winner_moves_row_into_source_keys(
        self, spark, tmp_path, mem_store
    ):
        """SERIALIZABILITY pin for MERGE: the winner's UPDATE moves a
        key INTO the source's key set (k=5 -> k=351, rewritten into a
        file the MERGE did not touch). The ON-join rescan sees the
        added row match the source and declines; re-execution updates
        BOTH k=351 rows."""
        root = _seed_ranged(spark, tmp_path)
        spark.createDataFrame(
            [(351, 1000.0)], "k long, s_score double"
        ).createOrReplaceTempView("cm_src_b")
        eng = Engine(spark)

        def compete(_root, _data):
            eng.sql(f"UPDATE '{root}' SET k = 351 WHERE k = 5")

        mem_store.before_write = compete
        eng.sql(
            f"MERGE INTO '{root}' AS t USING cm_src_b AS s "
            "ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET score = s.s_score"
        ).first()
        out = read_snapshot(spark, root)
        assert out.count() == 400
        rows = out.filter("k = 351").collect()
        assert len(rows) == 2
        assert {r["score"] for r in rows} == {1000.0}
        assert last_cow_stats(root)["conflict_merges"] == 0

    def test_insert_only_merge_race_merges(
        self, spark, tmp_path, mem_store
    ):
        """An insert-only MERGE (touched = no files) races an UPDATE:
        the winner's rewrite holds no source key, so the inserts
        commit by logical rebase on top of the winner's file set."""
        root = _seed_ranged(spark, tmp_path)
        spark.createDataFrame(
            [(1000, -1.0), (1001, -2.0)], "k long, s_score double"
        ).createOrReplaceTempView("cm_src_c")
        eng = Engine(spark)

        def compete(_root, _data):
            eng.sql(f"UPDATE '{root}' SET score = 222.0 WHERE k = 350")

        mem_store.before_write = compete
        eng.sql(
            f"MERGE INTO '{root}' AS t USING cm_src_c AS s "
            "ON t.k = s.k "
            "WHEN NOT MATCHED THEN INSERT (k, score) "
            "VALUES (s.k, s.s_score)"
        ).first()
        out = read_snapshot(spark, root)
        assert out.count() == 402
        assert out.filter("k = 1000").first()["score"] == -1.0
        assert out.filter("k = 350").first()["score"] == 222.0
        stats = last_cow_stats(root)
        assert stats["conflict_merges"] == 1
