"""Round-8 surfaces: partitioned/N-column z-order, append-log reads,
SQL time travel, merge schema evolution."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.engine import Engine
from openaq_data_pipeline_engineering_spark.scratch import fresh_scratch_dir
from openaq_data_pipeline_engineering_spark.sources.star import load_table

SF_DIR = "/root/testdata/sf0.001"


class TestMortonN:
    def test_pairwise_layout_unchanged(self, spark):
        from openaq_data_pipeline_engineering_spark.functions.zorder import (
            morton_code,
            morton_code_n,
        )

        df = spark.createDataFrame(
            [(x, y) for x in range(8) for y in range(8)], "x int, y int"
        )
        two = df.select(
            morton_code("x", "y", bits=8).alias("a"),
            morton_code_n(["x", "y"], bits=8).alias("b"),
        )
        assert two.filter("a <> b").count() == 0

    def test_three_way_interleave_positions(self, spark):
        from openaq_data_pipeline_engineering_spark.functions.zorder import (
            morton_code_n,
        )

        # bit i of col j lands at i*3 + j: (1,0,0)->1, (0,1,0)->2,
        # (0,0,1)->4, (2,0,0)->8, (0,2,0)->16, (0,0,2)->32, (3,3,3)->63
        rows = [
            (1, 0, 0, 1), (0, 1, 0, 2), (0, 0, 1, 4),
            (2, 0, 0, 8), (0, 2, 0, 16), (0, 0, 2, 32),
            (3, 3, 3, 63), (0, 0, 0, 0),
        ]
        df = spark.createDataFrame(rows, "x int, y int, z int, want int")
        got = df.select(
            "want", morton_code_n(["x", "y", "z"], bits=2).alias("code")
        )
        assert got.filter("want <> code").count() == 0

    def test_sql_twin_matches(self, spark):
        import duckdb

        from openaq_data_pipeline_engineering_spark.functions.zorder import (
            morton_code_n,
            morton_code_n_sql,
        )

        rows = [(x, y, z) for x in range(4) for y in range(4)
                for z in range(4)]
        df = spark.createDataFrame(rows, "x int, y int, z int")
        got = {
            (r["x"], r["y"], r["z"]): r["code"]
            for r in df.select(
                "x", "y", "z",
                morton_code_n(["x", "y", "z"], bits=4).alias("code"),
            ).collect()
        }
        con = duckdb.connect()
        expr = morton_code_n_sql(["x", "y", "z"], bits=4)
        for (x, y, z), code in got.items():
            sql_code = con.execute(
                f"SELECT {expr} FROM (SELECT {x} x, {y} y, {z} z)"
            ).fetchone()[0]
            assert sql_code == code

    def test_bit_budget_enforced(self):
        from openaq_data_pipeline_engineering_spark.functions.zorder import (
            morton_code_n,
        )

        with pytest.raises(ValueError):
            morton_code_n(["a", "b", "c", "d"], bits=16)  # 64 > 63
        with pytest.raises(ValueError):
            morton_code_n([], bits=8)


class TestZorderPartitioned:
    def _table(self, spark):
        ev = load_table(spark, SF_DIR, "events").select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.floor("value").cast("bigint").alias("val_floor"),
        )
        out = fresh_scratch_dir("t_zpart")
        (
            ev.repartitionByRange(4, "user_id")
            .write.mode("overwrite")
            .partitionBy("event_type")
            .parquet(out)
        )
        return ev, out

    def test_partition_pruning_ratio_on_second_dimension(self, spark):
        """VERDICT r7 #3 'done' bar: after the partitioned ZORDER
        rewrite, more than half of a touched partition's files are
        pruned by a second-dimension (val_floor) box."""
        from openaq_data_pipeline_engineering_spark.operators.skipstats import (
            candidate_files_box,
            file_stats,
        )

        ev, out = self._table(spark)
        n_rows = ev.count()
        m = Engine(spark).sql(
            f"OPTIMIZE '{out}' ZORDER BY (user_id, val_floor)"
        ).first()
        assert m["n_rows"] == n_rows
        table = spark.read.parquet(out)
        # content preserved
        assert table.agg(
            F.sum("value"), F.count(F.lit(1))
        ).first()[1] == n_rows
        # per-partition manifest: val_floor must prune >half the files
        # of each partition (boxes are disjoint within a partition)
        one_part = table.filter(F.col("event_type") == "view")
        stats = file_stats(one_part, ["val_floor"], use_path=True)
        n_files = stats.count()
        assert n_files >= 4  # the rewrite kept multiple files/partition
        n_cand = candidate_files_box(
            stats, {"val_floor": (64, 127)}
        ).count()
        assert n_cand < n_files / 2

    def test_where_rewrites_selected_partitions_only(self, spark):
        ev, out = self._table(spark)

        def files_of(part):
            d = os.path.join(out, f"event_type={part}")
            return sorted(
                f for f in os.listdir(d) if f.endswith(".parquet")
            )

        before_view, before_click = files_of("view"), files_of("click")
        Engine(spark).sql(
            f"OPTIMIZE '{out}' WHERE event_type = 'click' "
            "ZORDER BY (user_id, val_floor)"
        )
        assert files_of("view") == before_view  # untouched
        assert files_of("click") != before_click  # rewritten
        # content preserved across the selective rewrite
        back = spark.read.parquet(out)
        assert back.count() == ev.count()

    def test_zorder_on_partition_column_rejected(self, spark):
        from openaq_data_pipeline_engineering_spark.operators.sqlutil import (
            UtilStatementError,
        )

        _, out = self._table(spark)
        with pytest.raises(UtilStatementError, match="partition columns"):
            Engine(spark).sql(
                f"OPTIMIZE '{out}' ZORDER BY (event_type, user_id)"
            )

    def test_third_dimension_prunes_alone(self, spark):
        """VERDICT r7 #4 'done' bar: a 3-column z-order leaves the
        THIRD dimension prunable on its own."""
        from openaq_data_pipeline_engineering_spark.operators.skipstats import (
            candidate_files_box,
            file_stats,
        )

        ev = load_table(spark, SF_DIR, "events").select(
            "event_id",
            "user_id",
            F.floor("value").cast("bigint").alias("val_floor"),
            F.dayofmonth("ts").cast("bigint").alias("day"),
        )
        out = fresh_scratch_dir("t_z3")
        ev.repartitionByRange(16, "event_id").write.mode(
            "overwrite"
        ).parquet(out)
        Engine(spark).sql(
            f"OPTIMIZE '{out}' ZORDER BY (user_id, val_floor, day)"
        )
        table = spark.read.parquet(out)
        stats = file_stats(table, ["day"])
        n_files = stats.count()
        n_cand = candidate_files_box(stats, {"day": (1, 4)}).count()
        assert n_files >= 8
        assert n_cand < n_files  # third dimension alone skips files


class TestSqlTimeTravel:
    def _root(self, spark, tmp_path):
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            write_snapshot,
        )

        root = str(tmp_path / "tt")
        write_snapshot(
            spark.createDataFrame([(1, "a")], "k int, v string"), root
        )
        write_snapshot(
            spark.createDataFrame(
                [(1, "a"), (2, "b")], "k int, v string"
            ),
            root,
        )
        return root

    def test_version_as_of_and_join(self, spark, tmp_path):
        root = self._root(spark, tmp_path)
        eng = Engine(spark)
        assert eng.sql(
            f"SELECT count(*) AS n FROM '{root}' VERSION AS OF 1"
        ).first()["n"] == 1
        row = eng.sql(
            f"SELECT count(*) AS n FROM '{root}' VERSION AS OF 1 a "
            f"JOIN '{root}' VERSION AS OF 2 b ON a.k = b.k"
        ).first()
        assert row["n"] == 1

    def test_timestamp_as_of_numeric_and_iso(self, spark, tmp_path):
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            _read_manifest_doc,
            _write_manifest,
        )

        root = self._root(spark, tmp_path)
        # pin commit times so the ISO literal is exact (fromtimestamp
        # of a live commit time rounds to microseconds and can land
        # BEFORE the commit)
        doc = _read_manifest_doc(root)
        _write_manifest(
            root, doc["versions"], doc["txns"], {1: 100.0, 2: 200.0}
        )
        eng = Engine(spark)
        assert eng.sql(
            f"SELECT count(*) AS n FROM '{root}' TIMESTAMP AS OF 150.0"
        ).first()["n"] == 1
        # 1970-01-01T00:02:30 UTC = epoch 150; naive ISO parses as UTC
        assert eng.sql(
            f"SELECT count(*) AS n FROM '{root}' "
            "TIMESTAMP AS OF '1970-01-01T00:02:30'"
        ).first()["n"] == 1
        assert eng.sql(
            f"SELECT count(*) AS n FROM '{root}' TIMESTAMP AS OF 250.0"
        ).first()["n"] == 2

    def test_commented_clause_not_resolved(self, spark, tmp_path):
        root = self._root(spark, tmp_path)
        out = Engine(spark).sql(
            f"SELECT 7 AS n -- FROM '{root}' VERSION AS OF 99\n"
        )
        assert out.first()["n"] == 7

    def test_version_as_of_string_rejected(self, spark, tmp_path):
        root = self._root(spark, tmp_path)
        with pytest.raises(ValueError, match="integer version"):
            Engine(spark).sql(
                f"SELECT * FROM '{root}' VERSION AS OF 'one'"
            )


class TestMergeSchemaEvolution:
    def _frames(self, spark):
        tgt = spark.createDataFrame(
            [(1, "a"), (2, "b")], "k int, v string"
        )
        src = spark.createDataFrame(
            [(2, "B", 20.0), (3, "C", 30.0)], "k int, v string, score double"
        )
        return tgt, src

    def test_evolving_merge_adds_column(self, spark):
        from openaq_data_pipeline_engineering_spark.operators.sqlmerge import (
            execute_merge,
        )

        tgt, src = self._frames(spark)
        out = execute_merge(
            spark,
            "MERGE INTO t USING s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *",
            target_df=tgt,
            source_df=src,
            evolve_schema=True,
        )
        assert out.columns == ["k", "v", "score"]
        got = {r["k"]: (r["v"], r["score"]) for r in out.collect()}
        assert got == {1: ("a", None), 2: ("B", 20.0), 3: ("C", 30.0)}

    def test_explicit_assignment_to_new_column(self, spark):
        from openaq_data_pipeline_engineering_spark.operators.sqlmerge import (
            execute_merge,
        )

        tgt, src = self._frames(spark)
        out = execute_merge(
            spark,
            "MERGE INTO t USING s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET score = s.score * 2",
            target_df=tgt,
            source_df=src,
            evolve_schema=True,
        )
        got = {r["k"]: r["score"] for r in out.collect()}
        assert got == {1: None, 2: 40.0}

    def test_without_flag_unknown_column_still_rejected(self, spark):
        from openaq_data_pipeline_engineering_spark.operators.sqlmerge import (
            MergeError,
            execute_merge,
        )

        tgt, src = self._frames(spark)
        with pytest.raises(MergeError, match="not in the target schema"):
            execute_merge(
                spark,
                "MERGE INTO t USING s ON t.k = s.k "
                "WHEN MATCHED THEN UPDATE SET score = s.score",
                target_df=tgt,
                source_df=src,
            )

    def test_statement_form_via_conf(self, spark):
        tgt, src = self._frames(spark)
        eng = Engine(spark)
        eng.register("evo_t", tgt)
        eng.register("evo_s", src)
        stmt = (
            "MERGE INTO evo_t t USING evo_s s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
        spark.conf.set("spark.openaq.merge.schemaEvolution", "true")
        try:
            out = eng.sql(stmt)
            assert out.columns == ["k", "v", "score"]
        finally:
            spark.conf.set("spark.openaq.merge.schemaEvolution", "false")
        # conf off: the same statement rejects... nothing here — SET */
        # INSERT * with extra source columns is an aligned-schema
        # contract; the explicit-assignment form stays rejected
        from openaq_data_pipeline_engineering_spark.operators.sqlmerge import (
            MergeError,
        )

        with pytest.raises(MergeError, match="not in the target schema"):
            eng.sql(
                "MERGE INTO evo_t t USING evo_s s ON t.k = s.k "
                "WHEN MATCHED THEN UPDATE SET score = s.score"
            )


class TestVersionedOptimizeRouting:
    def test_versioned_root_routes_to_snapshot_protocol(
        self, spark, tmp_path
    ):
        """A versioned root must NEVER take the plain-table OPTIMIZE
        path: raw-reading the root unions every v=<N> dir (duplicating
        rows) with v= masquerading as a partition column. The routed
        form commits ONE new full version with the latest chain's
        content."""
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            append_rows,
            read_snapshot,
            snapshot_modes,
            snapshot_versions,
            write_snapshot,
        )

        root = str(tmp_path / "v")
        write_snapshot(
            spark.createDataFrame([(1, "a")], "k int, v string"), root
        )
        append_rows(
            spark.createDataFrame([(2, "b")], "k int, v string"), root
        )
        m = Engine(spark).sql(f"OPTIMIZE '{root}'").first()
        assert snapshot_versions(root) == [1, 2, 3]
        assert snapshot_modes(root).get(3, "full") == "full"
        out = read_snapshot(spark, root)
        assert {tuple(r) for r in out.collect()} == {(1, "a"), (2, "b")}
        assert m["n_rows"] == 2
        # old versions still time-travelable until vacuum
        assert read_snapshot(spark, root, version=1).count() == 1

    def test_versioned_zorder_clusters_new_version(self, spark, tmp_path):
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            read_snapshot,
            write_snapshot,
        )

        root = str(tmp_path / "v")
        df = spark.range(0, 1000).select(
            F.col("id").alias("a"), (F.col("id") % 37).alias("b")
        )
        write_snapshot(df, root)
        Engine(spark).sql(f"OPTIMIZE '{root}' ZORDER BY (a, b)")
        back = read_snapshot(spark, root)
        assert back.count() == 1000
        assert back.agg(F.sum("a")).first()[0] == 499500

    def test_versioned_where_rejected(self, spark, tmp_path):
        from openaq_data_pipeline_engineering_spark.operators.sqlutil import (
            UtilStatementError,
        )
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            write_snapshot,
        )

        root = str(tmp_path / "v")
        write_snapshot(spark.createDataFrame([(1,)], "k int"), root)
        with pytest.raises(UtilStatementError, match="versioned root"):
            Engine(spark).sql(f"OPTIMIZE '{root}' WHERE k = 1")


class TestDescribeHistory:
    def test_history_rows(self, spark, tmp_path):
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            append_rows,
            write_snapshot,
        )

        root = str(tmp_path / "v")
        write_snapshot(spark.createDataFrame([(1,)], "k int"), root)
        append_rows(
            spark.createDataFrame([(2,)], "k int"), root, txn_id="b-7"
        )
        rows = {
            r["version"]: (r["mode"], r["txn_id"], r["is_latest"])
            for r in Engine(spark).sql(
                f"DESCRIBE HISTORY '{root}'"
            ).collect()
        }
        assert rows == {
            1: ("full", None, False),
            2: ("delta", "b-7", True),
        }
        ts = [
            r["commit_ts"]
            for r in Engine(spark)
            .sql(f"DESCRIBE HISTORY '{root}'")
            .orderBy("version")
            .collect()
        ]
        assert ts[0] < ts[1]  # serial writers: commit order == version

    def test_history_rejects_non_versioned(self, spark, tmp_path):
        from openaq_data_pipeline_engineering_spark.operators.sqlutil import (
            UtilStatementError,
        )

        with pytest.raises(UtilStatementError, match="no committed"):
            Engine(spark).sql(f"DESCRIBE HISTORY '{tmp_path}'")
