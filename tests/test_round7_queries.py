"""Round-7 surfaces: expectations operator, bucketed co-located join
plan shape, incremental mart merge idempotency."""

from __future__ import annotations

from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.operators.expectations import (
    expectation_report,
    split_expectations,
)
from openaq_data_pipeline_engineering_spark.plans.queries_round7 import (
    bucketed_join_colocated,
    incremental_mart_merge,
)

SF_DIR = "/root/testdata/sf0.001"


class TestExpectations:
    def _df(self, spark):
        return spark.createDataFrame(
            [
                (1, 10.0, "a"),
                (2, 60.0, "b"),  # fails qty
                (3, None, "a"),  # NULL -> fails qty (3VL trap)
                (4, 20.0, None),  # fails seg
                (5, 70.0, None),  # fails both
            ],
            "id int, qty double, seg string",
        )

    RULES = {
        "qty_le_50": "qty <= 50",
        "seg_present": "seg IS NOT NULL",
    }

    def test_split_tags_failed_rules(self, spark):
        valid, quarantine = split_expectations(self._df(spark), self.RULES)
        assert {r["id"] for r in valid.collect()} == {1}
        got = {
            r["id"]: tuple(r["failed_rules"]) for r in quarantine.collect()
        }
        assert got == {
            2: ("qty_le_50",),
            3: ("qty_le_50",),  # NULL comparison counts as failure
            4: ("seg_present",),
            5: ("qty_le_50", "seg_present"),
        }

    def test_report_matches_split_counts(self, spark):
        df = self._df(spark)
        rep = {
            r["rule"]: (r["n_fail"], r["n_rows"])
            for r in expectation_report(df, self.RULES).collect()
        }
        valid, quarantine = split_expectations(df, self.RULES)
        assert rep["qty_le_50"] == (3, 5)
        assert rep["seg_present"] == (2, 5)
        assert rep["__any_failed__"] == (quarantine.count(), 5)
        assert rep["__all_valid__"] == (valid.count(), 5)

    def test_report_is_one_scan_no_python(self, spark):
        df = self._df(spark)
        plan = (
            expectation_report(df, self.RULES)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan

    def test_empty_rules_rejected(self, spark):
        import pytest

        with pytest.raises(ValueError):
            split_expectations(self._df(spark), {})

    def test_empty_input_report_is_all_zeros(self, spark):
        # ADVICE r7: SUM over zero rows is NULL — the report must
        # coalesce so the n_fail('__any_failed__') == quarantine.count()
        # invariant holds (both 0) on an empty input.
        df = self._df(spark).filter("id < 0")
        rep = {
            r["rule"]: (r["n_fail"], r["n_rows"])
            for r in expectation_report(df, self.RULES).collect()
        }
        assert rep == {
            "qty_le_50": (0, 0),
            "seg_present": (0, 0),
            "__any_failed__": (0, 0),
            "__all_valid__": (0, 0),
        }


class TestBucketedJoinDeclared:
    def test_no_exchange_on_join_inputs(self, spark):
        """The declared query's executed plan: SortMergeJoin fed by
        bucketed scans — zero exchanges below the join (the final
        aggregate's single exchange is the only one in the plan)."""
        out = bucketed_join_colocated(spark, SF_DIR)
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        # AQE's toString appends the pre-adaptive "Initial Plan" —
        # assert on the final plan section only
        plan = plan.split("== Initial Plan ==")[0]
        assert "SortMergeJoin" in plan
        # one exchange for the groupBy, none for the join inputs
        assert plan.count("Exchange") <= 1
        assert "Bucketed: true" in plan  # bucketed scan actually used


class TestIncrementalMartDeclared:
    def test_remerge_is_idempotent(self, spark):
        """Running the declared query twice (same scratch name, wiped
        per call) yields identical results — and re-merging the same
        batch B again changes nothing (the re-delivery contract)."""
        a = {
            tuple(r)
            for r in incremental_mart_merge(spark, SF_DIR).collect()
        }
        b = {
            tuple(r)
            for r in incremental_mart_merge(spark, SF_DIR).collect()
        }
        assert a == b
        # days 01/02 (untouched partitions) must survive the B merge
        days = {r[0] for r in a}
        assert {"01", "02"} <= days

    def test_corrections_win_on_overlap(self, spark):
        from openaq_data_pipeline_engineering_spark.plans.incremental import (
            merge_into_mart,
        )
        from openaq_data_pipeline_engineering_spark.plans.queries_round7 import (
            _WIN_A,
            _WIN_B,
            _mart_batch,
        )
        from openaq_data_pipeline_engineering_spark.scratch import (
            fresh_scratch_dir,
        )
        from openaq_data_pipeline_engineering_spark.sources.star import (
            load_table,
        )

        li = load_table(spark, SF_DIR, "lineitem")
        batch_a = _mart_batch(li, *_WIN_A, src_pri=1, qty_shift=0.0)
        batch_b = _mart_batch(li, *_WIN_B, src_pri=0, qty_shift=100.0)
        mart = fresh_scratch_dir("incr_mart_test")
        keys = ["l_orderkey", "l_linenumber"]
        merge_into_mart(spark, mart, batch_a, keys, ["src_pri"])
        merge_into_mart(spark, mart, batch_b, keys, ["src_pri"])
        back = spark.read.schema(batch_a.schema).parquet(mart)
        # every key present in batch B carries B's corrected value
        joined = back.join(
            batch_b.select(
                "l_orderkey", "l_linenumber", F.col("qty").alias("b_qty")
            ),
            keys,
        )
        assert joined.filter(F.col("qty") != F.col("b_qty")).count() == 0
        # total rows = A's exclusive days + all of B
        n_a_excl = batch_a.filter(F.col("day").isin("01", "02")).count()
        assert back.count() == n_a_excl + batch_b.count()


class TestZorderSkipping:
    def test_box_read_values_and_pruning(self, spark):
        """Z-order layout: a predicate on the SECOND clustered dimension
        prunes files; under single-key clustering it cannot (every file
        spans the full range of the non-sort column) — the OPTIMIZE
        ZORDER claim, measured on real manifests."""
        from openaq_data_pipeline_engineering_spark.functions.zorder import (
            morton_code,
        )
        from openaq_data_pipeline_engineering_spark.operators.skipstats import (
            candidate_files_box,
            file_stats,
        )
        from openaq_data_pipeline_engineering_spark.scratch import (
            fresh_scratch_dir,
        )
        from openaq_data_pipeline_engineering_spark.sources.star import (
            load_table,
        )

        ev = load_table(spark, SF_DIR, "events").select(
            "event_id",
            "user_id",
            "value",
            F.floor("value").cast("bigint").alias("val_floor"),
        )
        zdir = fresh_scratch_dir("ztest_z")
        ldir = fresh_scratch_dir("ztest_linear")
        z = morton_code(F.col("user_id"), F.col("val_floor"), bits=16)
        ev.repartitionByRange(16, z).write.mode("overwrite").parquet(zdir)
        ev.repartitionByRange(16, "user_id").write.mode("overwrite").parquet(
            ldir
        )
        zt, lt = spark.read.parquet(zdir), spark.read.parquet(ldir)
        cols = ["user_id", "val_floor"]
        zstats, lstats = file_stats(zt, cols), file_stats(lt, cols)
        n_files_z, n_files_l = zstats.count(), lstats.count()
        # value-only box: the dimension the linear layout does NOT sort
        box = {"val_floor": (64, 127)}
        n_cand_z = candidate_files_box(zstats, box).count()
        n_cand_l = candidate_files_box(lstats, box).count()
        assert n_cand_l >= n_files_l - 1  # linear layout: ~no pruning
        assert n_cand_z < n_files_z / 2  # z-order: real pruning
        # and the pruned box read returns exactly the plain-filter rows
        from openaq_data_pipeline_engineering_spark.operators.skipstats import (
            pruned_read_box,
        )

        box2 = {"user_id": (4, 11), "val_floor": (64, 255)}
        got = {
            r["event_id"]
            for r in pruned_read_box(zt, zstats, box2)
            .select("event_id")
            .collect()
        }
        want = {
            r["event_id"]
            for r in ev.filter(
                F.col("user_id").between(4, 11)
                & F.col("val_floor").between(64, 255)
            )
            .select("event_id")
            .collect()
        }
        assert got == want and got


class TestStreamingQualitySplit:
    def test_routing_and_replay_idempotency(self, spark, tmp_path):
        """Two micro-batches route valid/quarantine into versioned
        tables; replaying a batch (same batch_id) changes NEITHER table
        (txn dedupe on both commits)."""
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            read_snapshot,
            snapshot_versions,
        )
        from openaq_data_pipeline_engineering_spark.streaming.quality import (
            quality_split_batch,
        )

        rules = {"qty_le_50": "qty <= 50"}
        valid_dir = str(tmp_path / "valid")
        dead_dir = str(tmp_path / "dead")
        b0 = spark.createDataFrame(
            [(1, 10.0, 100), (2, 60.0, 100)], "id int, qty double, ts int"
        )
        b1 = spark.createDataFrame(
            [(1, 20.0, 200), (3, 70.0, 200)], "id int, qty double, ts int"
        )
        quality_split_batch(
            b0, 0, rules, valid_dir, dead_dir, keys=["id"], ts_col="ts"
        )
        quality_split_batch(
            b1, 1, rules, valid_dir, dead_dir, keys=["id"], ts_col="ts"
        )
        valid = {
            (r["id"], r["qty"])
            for r in read_snapshot(spark, valid_dir).collect()
        }
        # id=1 upserted to the batch-1 value; 60/70 quarantined
        assert valid == {(1, 20.0)}
        dead = {
            (r["id"], r["qty"], r["batch_id"], tuple(r["failed_rules"]))
            for r in read_snapshot(spark, dead_dir).collect()
        }
        assert dead == {
            (2, 60.0, 0, ("qty_le_50",)),
            (3, 70.0, 1, ("qty_le_50",)),
        }
        # replay batch 1: no new versions, identical contents
        v_valid = snapshot_versions(valid_dir)
        v_dead = snapshot_versions(dead_dir)
        quality_split_batch(
            b1, 1, rules, valid_dir, dead_dir, keys=["id"], ts_col="ts"
        )
        assert snapshot_versions(valid_dir) == v_valid
        assert snapshot_versions(dead_dir) == v_dead
        assert {
            (r["id"], r["qty"])
            for r in read_snapshot(spark, valid_dir).collect()
        } == {(1, 20.0)}


class TestFuzzyLinkage:
    def test_blocked_join_and_best_match(self, spark):
        from openaq_data_pipeline_engineering_spark.operators.linkage import (
            best_match,
            blocked_fuzzy_join,
            prefix_block,
        )

        clean = spark.createDataFrame(
            [(1, "acme corp"), (2, "acme corpse"), (3, "zenith ltd")],
            "id int, name string",
        )
        dirty = spark.createDataFrame(
            [(10, "acme corp"), (11, "acme cor"), (12, "zzz different")],
            "d_id int, d_name string",
        )
        pairs = blocked_fuzzy_join(
            dirty, clean, "d_name", "name", prefix_block(4), max_distance=2
        )
        got = {
            (r["d_id"], r["id"], r["edit_distance"])
            for r in pairs.collect()
        }
        # d=10 matches 1 (exact) and 2 (distance 2); d=11 matches 1
        # (distance 1); d=12 blocks with nothing ("zzz " != "zeni")
        assert got == {(10, 1, 0), (10, 2, 2), (11, 1, 1)}
        best = {
            (r["d_id"], r["id"])
            for r in best_match(pairs, "d_id", tiebreak="id").collect()
        }
        assert best == {(10, 1), (11, 1)}

    def test_blocking_bounds_comparisons(self, spark):
        """The join must be an equi-join on the block key (shuffle/
        broadcast hash), never a cartesian: blocking IS the scale
        property."""
        from openaq_data_pipeline_engineering_spark.operators.linkage import (
            blocked_fuzzy_join,
            prefix_block,
        )

        clean = spark.createDataFrame(
            [(i, f"name{i:04d}") for i in range(100)], "id int, name string"
        )
        dirty = clean.selectExpr(
            "id AS d_id", "substring(name, 1, 7) AS d_name"
        )
        pairs = blocked_fuzzy_join(
            dirty, clean, "d_name", "name", prefix_block(7), max_distance=1
        )
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # name0010 truncated -> distance 1 from each of name0010..0019
        assert pairs.count() == 1000


class TestSqlUtilStatements:
    def test_optimize_zorder_statement_clusters(self, spark):
        """OPTIMIZE ... ZORDER BY (a, b) through Engine.sql rewrites the
        table Morton-clustered: the second dimension becomes prunable
        (same manifests as TestZorderSkipping, via the statement)."""
        from openaq_data_pipeline_engineering_spark.engine import Engine
        from openaq_data_pipeline_engineering_spark.operators.skipstats import (
            candidate_files_box,
            file_stats,
        )
        from openaq_data_pipeline_engineering_spark.scratch import (
            fresh_scratch_dir,
        )
        from openaq_data_pipeline_engineering_spark.sources.star import (
            load_table,
        )

        ev = load_table(spark, SF_DIR, "events").select(
            "event_id",
            "user_id",
            F.floor("value").cast("bigint").alias("val_floor"),
            "value",
        )
        out = fresh_scratch_dir("sqlutil_zorder")
        # start from a user_id-clustered layout (val_floor unprunable)
        ev.repartitionByRange(16, "user_id").write.mode("overwrite").parquet(
            out
        )
        n_rows = ev.count()
        sum_before = spark.read.parquet(out).agg(F.sum("value")).first()[0]
        m = Engine(spark).sql(
            f"OPTIMIZE '{out}' ZORDER BY (user_id, val_floor)"
        ).first()
        assert m["n_rows"] == n_rows
        t = spark.read.parquet(out)
        assert t.agg(F.sum("value")).first()[0] == sum_before
        stats = file_stats(t, ["val_floor"])
        n_files = stats.count()
        n_cand = candidate_files_box(
            stats, {"val_floor": (64, 127)}
        ).count()
        assert n_cand < n_files / 2  # second dim now prunes

    def test_optimize_statement_rejections(self, spark):
        import pytest

        from openaq_data_pipeline_engineering_spark.engine import Engine
        from openaq_data_pipeline_engineering_spark.operators.sqlutil import (
            UtilStatementError,
        )

        eng = Engine(spark)
        with pytest.raises(UtilStatementError, match="1-6 columns"):
            eng.sql(
                "OPTIMIZE '/tmp/x' ZORDER BY (a, b, c, d, e, f, g)"
            )
        # WHERE + ZORDER selects partitions — needs a partitioned table
        with pytest.raises(UtilStatementError, match="partitioned"):
            eng.sql("OPTIMIZE '/tmp/x' WHERE a = 1 ZORDER BY (a)")
        with pytest.raises(UtilStatementError, match="unparseable VACUUM"):
            eng.sql("VACUUM '/tmp/x' RETAIN 2 HOURS")

    def test_vacuum_statement_noop_when_nothing_eligible(
        self, spark, tmp_path
    ):
        from openaq_data_pipeline_engineering_spark.engine import Engine
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            write_snapshot,
        )

        root = str(tmp_path / "v")
        df = spark.createDataFrame([(1,)], "k int")
        write_snapshot(df, root)
        out = Engine(spark).sql(f"VACUUM '{root}' RETAIN 2 VERSIONS")
        assert out.count() == 0


class TestReviewFixesRound7:
    """Regression tests for the round-7 self-review findings."""

    def test_optimize_where_is_row_preserving(self, spark):
        """A WHERE on a NON-partition column selects partitions to
        compact but must never drop rows inside them (the silent
        data-loss path)."""
        from openaq_data_pipeline_engineering_spark.engine import Engine
        from openaq_data_pipeline_engineering_spark.scratch import (
            fresh_scratch_dir,
        )
        from openaq_data_pipeline_engineering_spark.sources.star import (
            load_table,
        )

        ev = load_table(spark, SF_DIR, "events").select(
            "event_id", "user_id", "event_type", "value"
        )
        out = fresh_scratch_dir("opt_where_safe")
        (
            ev.repartition(8)
            .write.mode("overwrite")
            .partitionBy("event_type")
            .parquet(out)
        )
        n_before = spark.read.parquet(out).count()
        Engine(spark).sql(f"OPTIMIZE '{out}' WHERE value > 400")
        assert spark.read.parquet(out).count() == n_before

    def test_optimize_where_on_unpartitioned_rejected(self, spark):
        import pytest

        from openaq_data_pipeline_engineering_spark.engine import Engine
        from openaq_data_pipeline_engineering_spark.scratch import (
            fresh_scratch_dir,
        )

        out = fresh_scratch_dir("opt_where_flat")
        spark.range(10).write.mode("overwrite").parquet(out)
        with pytest.raises(ValueError, match="partitioned table"):
            Engine(spark).sql(f"OPTIMIZE '{out}' WHERE id > 5")

    def test_zorder_crash_recovery(self, spark):
        """Simulated crash between the two renames: the table is healed
        on the next OPTIMIZE."""
        import os

        from openaq_data_pipeline_engineering_spark.engine import Engine
        from openaq_data_pipeline_engineering_spark.scratch import (
            fresh_scratch_dir,
        )

        out = fresh_scratch_dir("zorder_crash")
        tbl = os.path.join(out, "t")
        spark.range(100).selectExpr(
            "id", "id % 7 AS a", "id % 11 AS b"
        ).write.parquet(tbl)
        os.rename(tbl, tbl + ".__optimize_old__")  # crashed mid-swap
        m = Engine(spark).sql(f"OPTIMIZE '{tbl}' ZORDER BY (a, b)").first()
        assert m["n_rows"] == 100
        assert spark.read.parquet(tbl).count() == 100

    def test_merge_qualified_end_case_identifiers(self, spark):
        from openaq_data_pipeline_engineering_spark.operators.sqlmerge import (
            execute_merge,
        )

        base = spark.createDataFrame([(1, 5, "x")], "k int, end int, v string")
        src = spark.createDataFrame([(1, 9, "y")], "k int, end int, v string")
        out = execute_merge(
            spark,
            "MERGE INTO t USING s ON t.k = s.k "
            "WHEN MATCHED AND CASE WHEN s.end > 0 THEN true ELSE false END "
            "THEN UPDATE SET v = s.v, end = s.end",
            target_df=base,
            source_df=src,
        )
        assert {tuple(r) for r in out.collect()} == {(1, 9, "y")}

    def test_engine_sql_routes_with_leading_comment(self, spark):
        from openaq_data_pipeline_engineering_spark.engine import Engine

        eng = Engine(spark)
        eng.register(
            "cmt_tgt", spark.createDataFrame([(1, "a")], "k int, v string")
        )
        eng.register(
            "cmt_src", spark.createDataFrame([(1, "b")], "k int, v string")
        )
        out = eng.sql(
            "-- nightly refresh\n/* maintenance */ MERGE INTO cmt_tgt t "
            "USING cmt_src s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = s.v"
        )
        assert {tuple(r) for r in out.collect()} == {(1, "b")}

    def test_cdf_dropped_key_column_rejected(self, spark, tmp_path):
        import pytest

        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            snapshot_changes,
            write_snapshot,
        )

        root = str(tmp_path / "cdf_dropkey")
        write_snapshot(
            spark.createDataFrame([(1, 10)], "k int, n int"), root
        )
        write_snapshot(spark.createDataFrame([(20,)], "n int"), root)
        with pytest.raises(ValueError, match="key columns must exist"):
            snapshot_changes(spark, root, keys=["k"], v_from=1, v_to=2)

    def test_expectation_rule_name_with_quote(self, spark):
        from openaq_data_pipeline_engineering_spark.operators.expectations import (
            expectation_report,
        )

        df = spark.createDataFrame([(1.0,), (60.0,)], "qty double")
        rep = {
            r["rule"]: r["n_fail"]
            for r in expectation_report(
                df, {"qty o'clock <= 50": "qty <= 50"}
            ).collect()
        }
        assert rep["qty o'clock <= 50"] == 1

    def test_stream_reprocess_needs_new_txn_app_id(self, spark, tmp_path):
        """The documented Delta-style contract: same app id no-ops a
        replayed batch id forever; a new app id reprocesses."""
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            read_snapshot,
            snapshot_versions,
        )
        from openaq_data_pipeline_engineering_spark.streaming.upsert import (
            upsert_batch,
        )

        target = str(tmp_path / "t")
        b = spark.createDataFrame([(1, 10.0, 100)], "id int, qty double, ts int")
        upsert_batch(b, 0, target, ["id"], "ts")
        b2 = spark.createDataFrame([(1, 99.0, 200)], "id int, qty double, ts int")
        upsert_batch(b2, 0, target, ["id"], "ts")  # same app+batch: no-op
        assert read_snapshot(spark, target).first()["qty"] == 10.0
        upsert_batch(b2, 0, target, ["id"], "ts", txn_app_id="reprocess1")
        assert read_snapshot(spark, target).first()["qty"] == 99.0
        assert len(snapshot_versions(target)) == 2
