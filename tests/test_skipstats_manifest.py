"""Persisted skipstats manifest + manifest-backed COW discovery
(VERDICT r10 #4).

The `_skipstats/` sidecar inside a version directory lets touched-file
discovery prune candidate files from one tiny manifest read instead of
opening every data file's footer. The restricted scan still evaluates
the exact predicate, so the touched set must be IDENTICAL to the
footer-scan route for every predicate shape — and any staleness or
unsupported predicate must fall back to the scan, never to a wrong
answer.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.engine import Engine
from openaq_data_pipeline_engineering_spark.operators.cow import (
    _manifest_candidates,
    _simple_conjuncts,
    last_cow_stats,
    touched_files_by_predicate,
)
from openaq_data_pipeline_engineering_spark.operators.skipstats import (
    SKIPSTATS_DIR,
    write_manifest,
)
from openaq_data_pipeline_engineering_spark.operators.versioned import (
    read_snapshot,
    write_snapshot,
)


def _seed(spark, tmp_path, files=10):
    root = str(tmp_path / "t")
    df = spark.range(0, 500).select(
        F.col("id").alias("k"),
        (F.col("id") % 9).cast("double").alias("score"),
        F.concat(F.lit("u"), (F.col("id") % 4).cast("string")).alias("tag"),
    )
    # range partitioning -> tight per-file [min, max] on k
    write_snapshot(df.repartitionByRange(files, "k"), root)
    return root, os.path.join(root, "v=1")


class TestSimpleConjuncts:
    def test_shapes(self):
        assert _simple_conjuncts("k = 5") == [("k", "=", 5)]
        assert _simple_conjuncts("x.k >= 10 AND k < 20") == [
            ("k", ">=", 10),
            ("k", "<", 20),
        ]
        assert _simple_conjuncts("5 > k") == [("k", "<", 5)]
        assert _simple_conjuncts("tag = 'u2'") == [("tag", "=", "u2")]
        assert _simple_conjuncts("score = 2.5") == [("score", "=", 2.5)]
        # unsupported conjuncts are dropped, supported ones kept
        assert _simple_conjuncts("k % 2 = 0 AND k > 7") == [("k", ">", 7)]
        assert _simple_conjuncts("k IN (1, 2)") == [("k", "in", [1, 2])]
        assert _simple_conjuncts("t.tag IN ('a', 'b')") == [
            ("tag", "in", ["a", "b"])
        ]
        assert _simple_conjuncts("k BETWEEN 3 AND 9") == [
            ("k", "between", (3, 9))
        ]
        # BETWEEN's inner AND must not break the top-level split
        assert _simple_conjuncts("k BETWEEN 3 AND 9 AND tag = 'x'") == [
            ("k", "between", (3, 9)),
            ("tag", "=", "x"),
        ]
        assert _simple_conjuncts("k IN (SELECT x FROM t)") == []


class TestManifestDiscovery:
    def test_manifest_and_scan_agree(self, spark, tmp_path):
        root, vdir = _seed(spark, tmp_path)
        scan = {
            pred: touched_files_by_predicate(spark, vdir, pred)
            for pred in (
                "k = 77",
                "k >= 100 AND k < 150",
                "k = -5",
                "tag = 'u2' AND k < 50",
                "k % 7 = 0",  # no prunable conjunct -> scan either way
            )
        }
        n = write_manifest(spark, vdir, ["k"])
        assert n == 10
        for pred, expect in scan.items():
            assert touched_files_by_predicate(spark, vdir, pred) == expect

    def test_candidates_prune(self, spark, tmp_path):
        root, vdir = _seed(spark, tmp_path)
        write_manifest(spark, vdir, ["k"])
        cands = _manifest_candidates(spark, vdir, "k = 77")
        assert cands is not None and len(cands) == 1
        assert _manifest_candidates(spark, vdir, "k = -5") == []
        # unsupported predicate: no manifest route
        assert _manifest_candidates(spark, vdir, "k % 7 = 0") is None
        # IN: union of point candidates (two keys, far apart -> 2 files)
        in_c = _manifest_candidates(spark, vdir, "k IN (5, 450)")
        assert in_c is not None and len(in_c) == 2
        # BETWEEN: one contiguous range (50 rows over 10 range files)
        bt_c = _manifest_candidates(spark, vdir, "k BETWEEN 100 AND 149")
        assert bt_c is not None and 1 <= len(bt_c) <= 2
        for pred in ("k IN (5, 450)", "k BETWEEN 100 AND 149"):
            assert touched_files_by_predicate(
                spark, vdir, pred
            ) == sorted(
                set(touched_files_by_predicate(spark, vdir, pred))
            )

    def test_upsert_box_candidates(self, spark, tmp_path):
        """Keyed-upsert discovery restricts its semi-join scan to the
        manifest's key-box candidates — same touched set as the full
        scan; null keys or uncovered columns fall back."""
        from openaq_data_pipeline_engineering_spark.operators.cow import (
            _manifest_box_candidates,
            touched_files_by_keys,
        )

        root, vdir = _seed(spark, tmp_path)
        delta = spark.createDataFrame(
            [(77, 0.0, "zz"), (81, 1.0, "yy")],
            "k long, score double, tag string",
        )
        before = touched_files_by_keys(spark, vdir, delta, ["k"])
        write_manifest(spark, vdir, ["k"])
        cands = _manifest_box_candidates(spark, vdir, delta, ["k"])
        assert cands is not None and len(cands) <= 2  # tight range files
        assert touched_files_by_keys(spark, vdir, delta, ["k"]) == before
        # uncovered key column: no box route (falls back, still exact)
        assert (
            _manifest_box_candidates(spark, vdir, delta, ["k", "tag"])
            is None
        )
        assert (
            touched_files_by_keys(spark, vdir, delta, ["k", "tag"])
            == touched_files_by_keys(spark, vdir, delta, ["k", "tag"])
        )
        # a NULL key cannot be bounded by min/max: fall back
        nulld = spark.createDataFrame(
            [(None, 0.0, "n")], "k long, score double, tag string"
        )
        assert _manifest_box_candidates(spark, vdir, nulld, ["k"]) is None

    def test_stale_manifest_falls_back(self, spark, tmp_path):
        """A manifest whose rel-path set no longer equals the on-disk
        files must be IGNORED (completeness check), not trusted."""
        root, vdir = _seed(spark, tmp_path)
        write_manifest(spark, vdir, ["k"])
        expect = touched_files_by_predicate(spark, vdir, "k = 77")
        # splice in an extra data file the manifest doesn't know about
        extra = spark.createDataFrame([(77, 0.0, "zz")],
                                      "k long, score double, tag string")
        tmp = str(tmp_path / "extra")
        extra.coalesce(1).write.parquet(tmp)
        src = glob.glob(os.path.join(tmp, "*.parquet"))[0]
        os.link(src, os.path.join(vdir, "zz-" + os.path.basename(src)))
        assert _manifest_candidates(spark, vdir, "k = 77") is None
        touched = touched_files_by_predicate(spark, vdir, "k = 77")
        assert len(touched) == len(expect) + 1  # scan sees the new file

    def test_cow_commit_carries_manifest_forward(self, spark, tmp_path):
        root, vdir = _seed(spark, tmp_path)
        write_manifest(spark, vdir, ["k"])
        Engine(spark).sql(
            f"UPDATE '{root}' SET score = 0.0 WHERE k = 77"
        ).first()
        stats = last_cow_stats(root)
        assert stats is not None and stats["files_rewritten"] == 1
        v2dir = os.path.join(root, f"v={stats['version']}")
        assert os.path.isdir(os.path.join(v2dir, SKIPSTATS_DIR))
        # the carried manifest is complete and still prunes exactly
        cands = _manifest_candidates(spark, v2dir, "k = 77")
        assert cands is not None and len(cands) == 1
        assert touched_files_by_predicate(spark, v2dir, "k = 77") == cands
        # and a second UPDATE through it stays correct
        Engine(spark).sql(
            f"UPDATE '{root}' SET score = 1.5 WHERE k = 78"
        ).first()
        out = read_snapshot(spark, root)
        assert out.filter("k = 77").first()["score"] == 0.0
        assert out.filter("k = 78").first()["score"] == 1.5
        assert out.count() == 500

    def test_partitioned_cow_carries_manifest(self, spark, tmp_path):
        """The O(touched) manifest carry-forward composes with the
        partitioned COW commit: carried rows keep their key=value rel
        paths, rewritten files get fresh stats, and the new version's
        manifest still prunes exactly."""
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            versionize_table,
        )

        root = str(tmp_path / "pc")
        spark.createDataFrame(
            [(i, (i % 3) + 1, float(i)) for i in range(60)],
            "k long, m int, score double",
        ).repartition(2, "k").write.partitionBy("m").parquet(root)
        versionize_table(root)
        vdir = os.path.join(root, "v=1")
        write_manifest(spark, vdir, ["k"])
        Engine(spark).sql(
            f"UPDATE '{root}' SET score = 0.0 WHERE k = 7"
        ).first()
        stats = last_cow_stats(root)
        assert stats is not None
        v2dir = os.path.join(root, f"v={stats['version']}")
        assert os.path.isdir(os.path.join(v2dir, SKIPSTATS_DIR))
        cands = _manifest_candidates(spark, v2dir, "k = 7")
        assert cands is not None
        assert touched_files_by_predicate(spark, v2dir, "k = 7") == sorted(
            set(cands)
            & set(touched_files_by_predicate(spark, v2dir, "k = 7"))
        )
        out = read_snapshot(spark, root)
        assert out.filter("k = 7").first()["score"] == 0.0
        assert out.count() == 60

    def test_partitioned_manifest_roundtrip(self, spark, tmp_path):
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            versionize_table,
        )

        root = str(tmp_path / "p")
        spark.createDataFrame(
            [(i, (i % 3) + 1, float(i)) for i in range(60)],
            "k long, m int, score double",
        ).repartition(2, "k").write.partitionBy("m").parquet(root)
        versionize_table(root)
        vdir = os.path.join(root, "v=1")
        write_manifest(spark, vdir, ["k", "m"])
        expect = touched_files_by_predicate(spark, vdir, "m = 2 AND k < 10")
        # manifest prunes on both the data column and the partition col
        cands = _manifest_candidates(spark, vdir, "m = 2 AND k < 10")
        assert cands is not None and set(expect) <= set(cands)
        assert (
            touched_files_by_predicate(spark, vdir, "m = 2 AND k < 10")
            == expect
        )
