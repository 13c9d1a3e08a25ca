"""MERGE INTO statement lowering (operators/sqlmerge.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.engine import Engine
from openaq_data_pipeline_engineering_spark.operators.sqlmerge import (
    MergeError,
    execute_merge,
    parse_merge,
)


def _frames(spark):
    base = spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 20.0), (3, "C", 30.0)],
        "k int, seg string, bal double",
    )
    upd = spark.createDataFrame(
        [(2, "B2", 5.0), (3, "C2", -1.0), (4, "D", 40.0)],
        "k int, seg string, bal double",
    )
    return base, upd


def _rows(df):
    return {tuple(r) for r in df.collect()}


class TestParse:
    def test_full_grammar(self):
        st = parse_merge(
            "MERGE INTO tgt AS t USING (SELECT 1 AS k) s ON t.k = s.k "
            "WHEN MATCHED AND s.bal < 0 THEN DELETE "
            "WHEN MATCHED THEN UPDATE SET seg = s.seg, bal = t.bal + s.bal "
            "WHEN NOT MATCHED THEN INSERT (k, seg, bal) "
            "VALUES (s.k, s.seg, s.bal)"
        )
        assert (st.target, st.t_alias, st.s_alias) == ("tgt", "t", "s")
        assert st.source.startswith("(")
        assert len(st.matched) == 2 and len(st.not_matched) == 1
        assert st.matched[0][1].assignments is None  # DELETE first
        assert st.matched[1][1].assignments == {
            "seg": "s.seg",
            "bal": "t.bal + s.bal",
        }
        assert st.not_matched[0][1].cols == ["k", "seg", "bal"]

    def test_by_source_grammar(self):
        st = parse_merge(
            "MERGE INTO tgt t USING src s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED BY TARGET THEN INSERT * "
            "WHEN NOT MATCHED BY SOURCE AND t.bal < 0 THEN DELETE "
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET seg = 'STALE'"
        )
        assert len(st.matched) == 1 and len(st.not_matched) == 1
        assert len(st.by_source) == 2
        assert st.by_source[0][1].assignments is None  # DELETE
        assert st.by_source[0][1].cond == "t.bal < 0"
        assert st.by_source[1][1].assignments == {"seg": "'STALE'"}

    def test_by_source_rejections(self):
        with pytest.raises(MergeError, match="BY TARGET"):
            parse_merge(
                "MERGE INTO t USING s ON t.k = s.k "
                "WHEN MATCHED BY TARGET THEN DELETE"
            )
        with pytest.raises(MergeError, match="SET \\*"):
            parse_merge(
                "MERGE INTO t USING s ON t.k = s.k "
                "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *"
            )
        with pytest.raises(MergeError, match="UPDATE SET / DELETE"):
            parse_merge(
                "MERGE INTO t USING s ON t.k = s.k "
                "WHEN NOT MATCHED BY SOURCE THEN INSERT *"
            )

    def test_commas_inside_string_literals(self):
        st = parse_merge(
            "MERGE INTO t USING s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET a = 'x,y', b = concat(s.b, ',') "
            "WHEN NOT MATCHED THEN INSERT (k, a) VALUES (s.k, 'p,''q')"
        )
        assert st.matched[0][1].assignments == {
            "a": "'x,y'",
            "b": "concat(s.b, ',')",
        }
        nm = st.not_matched[0][1]
        assert nm.cols == ["k", "a"] and nm.vals == ["s.k", "'p,''q'"]

    def test_rejects_garbage(self):
        with pytest.raises(MergeError):
            parse_merge("MERGE INTO t USING s ON t.k = s.k")  # no WHEN
        with pytest.raises(MergeError):
            parse_merge(
                "MERGE INTO t USING s ON t.k = s.k "
                "WHEN NOT MATCHED THEN UPDATE SET a = 1"
            )
        with pytest.raises(MergeError):
            parse_merge("SELECT 1")


class TestExecute:
    def test_upsert_update_and_insert(self, spark):
        base, upd = _frames(spark)
        out = execute_merge(
            spark,
            "MERGE INTO tgt t USING src s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET seg = s.seg, "
            "bal = t.bal + s.bal "
            "WHEN NOT MATCHED THEN INSERT (k, seg, bal) "
            "VALUES (s.k, s.seg, s.bal)",
            target_df=base,
            source_df=upd,
        )
        assert _rows(out) == {
            (1, "A", 10.0),  # untouched
            (2, "B2", 25.0),  # updated: 20 + 5
            (3, "C2", 29.0),  # updated: 30 - 1
            (4, "D", 40.0),  # inserted
        }

    def test_clause_order_delete_shadows_update(self, spark):
        base, upd = _frames(spark)
        out = execute_merge(
            spark,
            "MERGE INTO tgt t USING src s ON t.k = s.k "
            "WHEN MATCHED AND s.bal < 0 THEN DELETE "
            "WHEN MATCHED THEN UPDATE SET seg = s.seg "
            "WHEN NOT MATCHED THEN INSERT *",
            target_df=base,
            source_df=upd,
        )
        assert _rows(out) == {
            (1, "A", 10.0),
            (2, "B2", 20.0),  # update keeps unassigned bal
            # k=3 deleted (s.bal = -1 < 0)
            (4, "D", 40.0),  # INSERT * copies source row
        }

    def test_update_star_and_conditional_insert(self, spark):
        base, upd = _frames(spark)
        out = execute_merge(
            spark,
            "MERGE INTO tgt t USING src s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED AND s.bal > 100 THEN INSERT *",
            target_df=base,
            source_df=upd,
        )
        assert _rows(out) == {
            (1, "A", 10.0),
            (2, "B2", 5.0),  # SET * takes the whole source row
            (3, "C2", -1.0),
            # k=4 NOT inserted (bal 40 <= 100)
        }

    def test_matched_condition_falls_through_to_keep(self, spark):
        base, upd = _frames(spark)
        out = execute_merge(
            spark,
            "MERGE INTO tgt t USING src s ON t.k = s.k "
            "WHEN MATCHED AND s.bal < 0 THEN UPDATE SET seg = 'NEG'",
            target_df=base,
            source_df=upd,
        )
        assert _rows(out) == {
            (1, "A", 10.0),
            (2, "B", 20.0),  # matched, condition false -> keep as-is
            (3, "NEG", 30.0),
        }

    def test_subquery_source_and_views(self, spark):
        base, upd = _frames(spark)
        base.createOrReplaceTempView("merge_tgt")
        upd.createOrReplaceTempView("merge_src")
        out = execute_merge(
            spark,
            "MERGE INTO merge_tgt t USING "
            "(SELECT k, seg, bal * 2 AS bal FROM merge_src WHERE k = 2) s "
            "ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET bal = s.bal",
        )
        assert _rows(out) == {
            (1, "A", 10.0),
            (2, "B", 10.0),  # 5 * 2
            (3, "C", 30.0),
        }

    def test_ambiguous_multi_match_raises(self, spark):
        base, _ = _frames(spark)
        dup_src = spark.createDataFrame(
            [(2, "X", 1.0), (2, "Y", 2.0)], "k int, seg string, bal double"
        )
        stmt = (
            "MERGE INTO tgt t USING src s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET seg = s.seg"
        )
        with pytest.raises(MergeError, match="ambiguous"):
            execute_merge(spark, stmt, target_df=base, source_df=dup_src)
        # strict=False: both joined rows flow through the CASE; the
        # merge degrades to per-joined-row semantics (documented)
        out = execute_merge(
            spark, stmt, target_df=base, source_df=dup_src, strict=False
        )
        assert out.filter(F.col("k") == 2).count() == 2

    def test_by_source_full_sync(self, spark):
        """The Delta 'full sync' shape: source is the complete desired
        state — update matches, insert new, delete target rows the
        source no longer contains."""
        base, upd = _frames(spark)
        out = execute_merge(
            spark,
            "MERGE INTO tgt t USING src s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT * "
            "WHEN NOT MATCHED BY SOURCE THEN DELETE",
            target_df=base,
            source_df=upd,
        )
        # k=1 exists only in target -> deleted; 2,3 updated; 4 inserted
        assert _rows(out) == {
            (2, "B2", 5.0),
            (3, "C2", -1.0),
            (4, "D", 40.0),
        }

    def test_by_source_conditional_flag_then_keep(self, spark):
        base, upd = _frames(spark)
        out = execute_merge(
            spark,
            "MERGE INTO tgt t USING src s ON t.k = s.k "
            "WHEN NOT MATCHED BY SOURCE AND t.bal >= 5 "
            "THEN UPDATE SET seg = 'STALE'",
            target_df=base.union(
                spark.createDataFrame([(9, "Z", 1.0)], base.schema)
            ),
            source_df=upd,
        )
        assert _rows(out) == {
            (1, "STALE", 10.0),  # source-absent, bal >= 5 -> flagged
            (2, "B", 20.0),  # matched, no MATCHED clause -> kept
            (3, "C", 30.0),
            (9, "Z", 1.0),  # source-absent, bal < 5 -> kept as-is
        }

    def test_by_source_clause_order_first_wins(self, spark):
        base, upd = _frames(spark)
        out = execute_merge(
            spark,
            "MERGE INTO tgt t USING src s ON t.k = s.k "
            "WHEN NOT MATCHED BY SOURCE AND t.bal > 5 THEN DELETE "
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET seg = 'KEPT'",
            target_df=base,
            source_df=upd,
        )
        # k=1 (bal 10 > 5) hits the DELETE first, never the UPDATE
        assert _rows(out) == {(2, "B", 20.0), (3, "C", 30.0)}

    def test_engine_sql_routes_merge(self, spark):
        base, upd = _frames(spark)
        eng = Engine(spark)
        eng.register("etgt", base)
        eng.register("esrc", upd)
        out = eng.sql(
            "MERGE INTO etgt t USING esrc s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
        assert out.count() == 4
        assert eng.sql("SELECT 41 + 1 AS x").first()[0] == 42  # passthrough

    def test_engine_sql_preserves_literals_in_select(self, spark):
        # ADVICE r7: Engine.sql must not blank comment markers inside
        # double-quoted literals (a string in Spark's default parser)
        # or backtick-quoted identifiers — the ORIGINAL text reaches
        # spark.sql, and the route-strip is quote-aware anyway.
        eng = Engine(spark)
        assert eng.sql('SELECT "a -- not a comment" AS s').first()[0] == (
            "a -- not a comment"
        )
        assert eng.sql('SELECT "/* still data" AS s').first()[0] == (
            "/* still data"
        )
        row = eng.sql("SELECT 7 AS `x--y`")
        assert row.columns == ["x--y"] and row.first()[0] == 7
        # single-quoted literals keep working through the same path
        assert eng.sql("SELECT '/*' AS s").first()[0] == "/*"
        # a malformed statement surfaces Spark's parse error, never
        # MergeError-from-routing
        import pyspark.errors

        with pytest.raises(pyspark.errors.PySparkException):
            eng.sql("SELECT 1 FROM /* unterminated")

    def test_plan_is_one_join_no_python(self, spark):
        """Scale shape: the lowering is a single join + projection —
        no cartesian product, no Python eval in the plan."""
        base, upd = _frames(spark)
        out = execute_merge(
            spark,
            "MERGE INTO tgt t USING src s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *",
            target_df=base,
            source_df=upd,
            strict=False,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan
        assert plan.count("Join") <= 2  # one logical join (AQE may wrap)


class TestReviewHardening:
    """Round-6 review findings: each was a live-verified bug."""

    def test_multi_match_raises_even_without_matched_clause(self, spark):
        # insert-only merge: extra joined copies would silently
        # DUPLICATE target rows if the strict check were skipped
        base = spark.createDataFrame([(1, "A")], "k int, v string")
        dup = spark.createDataFrame(
            [(1, "x"), (1, "y"), (5, "z")], "k int, v string"
        )
        with pytest.raises(MergeError, match="ambiguous"):
            execute_merge(
                spark,
                "MERGE INTO tgt t USING src s ON t.k = s.k "
                "WHEN NOT MATCHED THEN INSERT *",
                target_df=base,
                source_df=dup,
            )

    def test_unknown_update_column_rejected(self, spark):
        base = spark.createDataFrame([(1, "A")], "k int, seg string")
        src = spark.createDataFrame([(1, "B")], "k int, seg string")
        with pytest.raises(MergeError, match="not in the target schema"):
            execute_merge(
                spark,
                "MERGE INTO t USING s ON t.k = s.k "
                "WHEN MATCHED THEN UPDATE SET segg = s.seg",  # typo
                target_df=base,
                source_df=src,
            )

    def test_unknown_insert_column_rejected(self, spark):
        base = spark.createDataFrame([(1, "A")], "k int, seg string")
        src = spark.createDataFrame([(2, "B")], "k int, seg string")
        with pytest.raises(MergeError, match="not in the target schema"):
            execute_merge(
                spark,
                "MERGE INTO t USING s ON t.k = s.k "
                "WHEN NOT MATCHED THEN INSERT (custkey, seg) "
                "VALUES (s.k, s.seg)",  # custkey is not a target column
                target_df=base,
                source_df=src,
            )

    def test_case_insensitive_columns_canonicalized(self, spark):
        base = spark.createDataFrame([(1, "A")], "k int, seg string")
        src = spark.createDataFrame([(1, "B")], "k int, seg string")
        out = execute_merge(
            spark,
            "MERGE INTO t USING s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET SEG = s.seg",
            target_df=base,
            source_df=src,
        )
        assert _rows(out) == {(1, "B")}

    def test_malformed_clause_fails_whole_statement(self):
        # missing THEN: silently dropping the INSERT clause would
        # execute the merge without it
        with pytest.raises(MergeError, match="unparseable text inside"):
            parse_merge(
                "MERGE INTO t USING s ON t.k = s.k "
                "WHEN MATCHED THEN DELETE "
                "WHEN NOT MATCHED INSERT (k) VALUES (s.k)"
            )
        with pytest.raises(MergeError, match="unparseable text inside"):
            parse_merge(
                "MERGE INTO t USING s ON t.k = s.k "
                "WHEN NOT MATCHED BY TARGETX THEN INSERT *"
            )

    def test_keywords_inside_literals(self, spark):
        base = spark.createDataFrame([(1, "A")], "k int, seg string")
        src = spark.createDataFrame([(1, "B")], "k int, seg string")
        out = execute_merge(
            spark,
            "MERGE INTO t USING s ON t.k = s.k "
            "WHEN MATCHED AND s.seg <> 'WHEN MATCHED THEN' "
            "THEN UPDATE SET seg = 'a THEN b WHERE c'",
            target_df=base,
            source_df=src,
        )
        assert _rows(out) == {(1, "a THEN b WHERE c")}

    def test_dotted_target_gets_last_segment_alias(self):
        st = parse_merge(
            "MERGE INTO db.tbl USING src s ON tbl.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = s.v"
        )
        assert st.t_alias == "tbl"


class TestRound7Grammar:
    """Round-7 advice fixes: comments, backslash escapes, nested CASE
    in clause/ON conditions, and the single-execution strict check."""

    def test_line_and_bracketed_comments_stripped(self, spark):
        base = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
        src = spark.createDataFrame([(1, "A"), (3, "C")], "k int, v string")
        out = execute_merge(
            spark,
            "MERGE INTO t USING s ON t.k = s.k -- join on 'the' key\n"
            "WHEN MATCHED /* a 'quoted WHEN' inside\n"
            "   /* nested, as Spark allows */ a comment */\n"
            "  THEN UPDATE SET v = s.v -- tail comment\n"
            "WHEN NOT MATCHED THEN INSERT *",
            target_df=base,
            source_df=src,
        )
        assert _rows(out) == {(1, "A"), (2, "b"), (3, "C")}

    def test_comment_markers_inside_literals_are_content(self, spark):
        base = spark.createDataFrame([(1, "x")], "k int, v string")
        src = spark.createDataFrame([(1, "y")], "k int, v string")
        out = execute_merge(
            spark,
            "MERGE INTO t USING s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = 'a--b /* c */'",
            target_df=base,
            source_df=src,
        )
        assert _rows(out) == {(1, "a--b /* c */")}

    def test_unterminated_bracketed_comment_rejected(self):
        with pytest.raises(MergeError, match="unterminated"):
            parse_merge(
                "MERGE INTO t USING s ON t.k = s.k /* oops "
                "WHEN MATCHED THEN DELETE"
            )

    def test_backslash_escaped_quote_in_literal(self, spark):
        # Spark's default parser: \' is an escaped quote inside a
        # literal. The masker must not flip its in-string state there.
        base = spark.createDataFrame([(1, "x")], "k int, v string")
        src = spark.createDataFrame([(1, "y")], "k int, v string")
        out = execute_merge(
            spark,
            "MERGE INTO t USING s ON t.k = s.k "
            "WHEN MATCHED AND s.v <> 'it\\'s THEN a trap' "
            "THEN UPDATE SET v = 'it\\'s fine'",
            target_df=base,
            source_df=src,
        )
        assert _rows(out) == {(1, "it's fine")}

    def test_nested_case_in_clause_condition_and_rhs(self, spark):
        base = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "k int, v string, n int"
        )
        src = spark.createDataFrame(
            [(1, "A", 5), (2, "B", 99)], "k int, v string, n int"
        )
        out = execute_merge(
            spark,
            "MERGE INTO t USING s ON t.k = s.k "
            "WHEN MATCHED AND CASE WHEN s.n > 50 THEN false ELSE true END "
            "THEN UPDATE SET v = CASE WHEN s.n < t.n THEN s.v "
            "ELSE t.v END, n = s.n + CASE WHEN s.n = 5 THEN 100 ELSE 0 END",
            target_df=base,
            source_df=src,
        )
        # k=1: cond true (5<=50), v := s.v ('A' since 5<10), n := 105
        # k=2: cond false (99>50) -> KEEP
        assert _rows(out) == {(1, "A", 105), (2, "b", 20)}

    def test_case_in_on_condition(self, spark):
        base = spark.createDataFrame([(1, "a")], "k int, v string")
        src = spark.createDataFrame([(1, "z")], "k int, v string")
        out = execute_merge(
            spark,
            "MERGE INTO t USING s "
            "ON t.k = CASE WHEN s.k < 0 THEN -s.k ELSE s.k END "
            "WHEN MATCHED THEN UPDATE SET v = s.v",
            target_df=base,
            source_df=src,
        )
        assert _rows(out) == {(1, "z")}

    def test_unbalanced_case_rejected(self):
        with pytest.raises(MergeError, match="unbalanced CASE"):
            parse_merge(
                "MERGE INTO t USING s ON t.k = s.k "
                "WHEN MATCHED AND CASE WHEN 1=1 THEN true "
                "THEN UPDATE SET v = s.v"
            )

    def test_strict_check_single_join_execution(self, spark):
        # The strict path persists the join once (MEMORY_AND_DISK):
        # the final plan must scan the cached relation — everything
        # ABOVE the InMemoryRelation (whose printout embeds the cached
        # child plan) is join-free, so the projection reuses blocks the
        # dup check already populated instead of re-running the join.
        base = spark.createDataFrame([(1, "a")], "k int, v string")
        src = spark.createDataFrame([(1, "b")], "k int, v string")
        out = execute_merge(
            spark,
            "MERGE INTO t USING s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = s.v",
            target_df=base,
            source_df=src,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
        consumer = plan.split("InMemoryRelation")[0]
        assert "Join" not in consumer
        assert _rows(out) == {(1, "b")}
        # The pinned cache is releasable (ADVICE r7: long-lived
        # sessions must not accumulate merge caches) and idempotent.
        from openaq_data_pipeline_engineering_spark.operators.sqlmerge import (
            release_merge_cache,
        )

        assert release_merge_cache(out) is True
        assert release_merge_cache(out) is False

    def test_unstrict_merge_has_no_pinned_cache(self, spark):
        from openaq_data_pipeline_engineering_spark.operators.sqlmerge import (
            release_merge_cache,
        )

        base = spark.createDataFrame([(1, "a")], "k int, v string")
        src = spark.createDataFrame([(1, "b")], "k int, v string")
        for kwargs in ({"strict": False}, {"strict_materialize": False}):
            out = execute_merge(
                spark,
                "MERGE INTO t USING s ON t.k = s.k "
                "WHEN MATCHED THEN UPDATE SET v = s.v",
                target_df=base,
                source_df=src,
                **kwargs,
            )
            assert _rows(out) == {(1, "b")}
            assert release_merge_cache(out) is False


class TestBacktickColumns:
    """Round-7 polish: a bare column literally named `end` or `case`
    is spellable with backticks — the masker treats backtick content
    like literal content, so the quoted keyword never closes a CASE
    block or splits a clause, and the LHS unquotes to the plain name."""

    def _frames(self, spark):
        base = spark.createDataFrame(
            [(1, "x", 5), (2, "y", 6)],
            ["k", "end", "case"],
        )
        src = spark.createDataFrame(
            [(2, "Y", 60), (3, "Z", 70)],
            ["k", "end", "case"],
        )
        return base, src

    def test_update_backticked_keyword_columns(self, spark):
        base, src = self._frames(spark)
        out = execute_merge(
            spark,
            "MERGE INTO t USING s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET `end` = s.end, "
            "`case` = s.case + 1 "
            "WHEN NOT MATCHED THEN INSERT (k, `end`, `case`) "
            "VALUES (s.k, s.end, s.case)",
            target_df=base,
            source_df=src,
        )
        got = {r["k"]: (r["end"], r["case"]) for r in out.collect()}
        assert got == {1: ("x", 5), 2: ("Y", 61), 3: ("Z", 70)}

    def test_backticked_column_with_case_expression(self, spark):
        # a real CASE expression and a backticked `case` column coexist
        base, src = self._frames(spark)
        out = execute_merge(
            spark,
            "MERGE INTO t USING s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET "
            "`case` = CASE WHEN s.case > 65 THEN 0 ELSE s.case END",
            target_df=base,
            source_df=src,
        )
        got = {r["k"]: r["case"] for r in out.collect()}
        assert got == {1: 5, 2: 60}

    def test_qualified_backtick_lhs(self, spark):
        base, src = self._frames(spark)
        out = execute_merge(
            spark,
            "MERGE INTO t USING s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET t.`end` = s.end",
            target_df=base,
            source_df=src,
        )
        got = {r["k"]: r["end"] for r in out.collect()}
        assert got == {1: "x", 2: "Y"}


class TestPathTargetMerge:
    """MERGE INTO '<versioned root>' — atomic publish with the
    optimistic guard, the MERGE twin of path-target UPDATE/DELETE."""

    def _seed(self, spark, tmp_path):
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            write_snapshot,
        )

        root = str(tmp_path / "vt")
        write_snapshot(
            spark.createDataFrame(
                [(1, "a"), (2, "b")], "k int, v string"
            ),
            root,
        )
        spark.createDataFrame(
            [(2, "B"), (3, "c")], "k int, v string"
        ).createOrReplaceTempView("merge_src")
        return root

    def test_upsert_publishes_new_version(self, spark, tmp_path):
        from openaq_data_pipeline_engineering_spark.operators.sqlmerge import (
            execute_merge_statement,
        )
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            read_snapshot,
        )

        root = self._seed(spark, tmp_path)
        m = execute_merge_statement(
            spark,
            f"MERGE INTO '{root}' AS t USING merge_src AS s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = s.v "
            "WHEN NOT MATCHED THEN INSERT *",
        ).first()
        assert (m["version"], m["n_rows"], m["base_version"]) == (2, 3, 1)
        got = {
            (r["k"], r["v"])
            for r in read_snapshot(spark, root).collect()
        }
        assert got == {(1, "a"), (2, "B"), (3, "c")}
        # history intact: v1 unchanged
        assert {
            (r["k"], r["v"])
            for r in read_snapshot(spark, root, version=1).collect()
        } == {(1, "a"), (2, "b")}

    def test_engine_sql_routes_the_path_form(self, spark, tmp_path):
        root = self._seed(spark, tmp_path)
        m = Engine(spark).sql(
            f"MERGE INTO '{root}' AS t USING merge_src AS s ON t.k = s.k "
            "WHEN MATCHED THEN DELETE"
        ).first()
        assert m["version"] == 2
        assert m["n_rows"] == 1  # k=2 deleted, k=1 remains

    def test_name_targets_keep_the_legacy_contract(self, spark):
        # a NAME target still returns the post-merge frame, no publish
        spark.createDataFrame(
            [(1, "a")], "k int, v string"
        ).createOrReplaceTempView("merge_tgt_name")
        spark.createDataFrame(
            [(1, "A")], "k int, v string"
        ).createOrReplaceTempView("merge_src")
        out = Engine(spark).sql(
            "MERGE INTO merge_tgt_name AS t USING merge_src AS s "
            "ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v"
        )
        assert {tuple(r) for r in out.collect()} == {(1, "A")}

    def test_constraint_violation_leaves_the_table_unchanged(
        self, spark, tmp_path
    ):
        from openaq_data_pipeline_engineering_spark.operators.sqlmerge import (
            execute_merge_statement,
        )
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            ConstraintViolationError,
            add_constraint,
            read_snapshot,
            snapshot_versions,
        )

        root = self._seed(spark, tmp_path)
        add_constraint(spark, root, "k_small", "k <= 2")
        with pytest.raises(ConstraintViolationError):
            execute_merge_statement(
                spark,
                f"MERGE INTO '{root}' AS t USING merge_src AS s "
                "ON t.k = s.k WHEN NOT MATCHED THEN INSERT *",
            )
        assert snapshot_versions(root) == [1]
        assert {
            (r["k"], r["v"])
            for r in read_snapshot(spark, root).collect()
        } == {(1, "a"), (2, "b")}

    def test_concurrent_commit_raises_instead_of_lost_update(
        self, spark, tmp_path, monkeypatch
    ):
        from openaq_data_pipeline_engineering_spark.operators import (
            sqlmerge as sm,
        )
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            ConcurrentWriteError,
            write_snapshot,
        )

        root = self._seed(spark, tmp_path)
        real = sm.execute_merge

        def racing(spark_, sql_, **kw):
            out = real(spark_, sql_, **kw)
            # a racer commits between the merge's read and its publish;
            # the racer's content keeps a merge_src-matching key (k=2)
            # so every retried attempt still touches a file and must
            # conflict — a non-matching racer would legitimately turn
            # the retry into the r12 no-op MERGE (version == base, no
            # commit), which is the correct serializable outcome, not a
            # lost update
            write_snapshot(
                spark.createDataFrame(
                    [(2, "z"), (9, "z")], "k int, v string"
                ),
                root,
            )
            return out

        monkeypatch.setattr(sm, "execute_merge", racing)
        with pytest.raises(ConcurrentWriteError):
            sm.execute_merge_statement(
                spark,
                f"MERGE INTO '{root}' AS t USING merge_src AS s "
                "ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v",
            )

    def test_merge_into_cdf_root_materializes_changes(
        self, spark, tmp_path
    ):
        from openaq_data_pipeline_engineering_spark.operators.sqlmerge import (
            execute_merge_statement,
        )
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            enable_change_feed,
            table_changes,
            write_snapshot,
        )

        root = str(tmp_path / "cdfm")
        enable_change_feed(spark, root, keys=["k"])
        write_snapshot(
            spark.createDataFrame(
                [(1, "a"), (2, "b")], "k int, v string"
            ),
            root,
        )
        spark.createDataFrame(
            [(2, "B"), (3, "c")], "k int, v string"
        ).createOrReplaceTempView("merge_src")
        execute_merge_statement(
            spark,
            f"MERGE INTO '{root}' AS t USING merge_src AS s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = s.v "
            "WHEN NOT MATCHED THEN INSERT *",
        )
        ch = {
            (r["k"], r["v"], r["_change_type"])
            for r in table_changes(spark, root, v_from=1).collect()
        }
        assert ch == {
            (2, "b", "update_preimage"),
            (2, "B", "update_postimage"),
            (3, "c", "insert"),
        }


class TestPathTargetMergeConcurrency:
    def test_racing_path_merges_never_lose_an_update(self, spark, tmp_path):
        """Two concurrent path-target MERGEs on one root: the commit
        protocol serializes them — losers raise ConcurrentWriteError
        (and may retry), and the final table reflects a SERIAL order of
        the statements, never a lost update."""
        import threading

        from openaq_data_pipeline_engineering_spark.operators.sqlmerge import (
            execute_merge_statement,
        )
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            ConcurrentWriteError,
            read_snapshot,
            write_snapshot,
        )

        root = str(tmp_path / "race")
        write_snapshot(
            spark.createDataFrame(
                [(1, 0), (2, 0)], "k int, hits int"
            ),
            root,
        )
        spark.createDataFrame([(1,)], "k int").createOrReplaceTempView(
            "race_src_a"
        )
        spark.createDataFrame([(2,)], "k int").createOrReplaceTempView(
            "race_src_b"
        )
        outcomes: dict[str, str] = {}
        barrier = threading.Barrier(2)

        def run(tag: str, view: str) -> None:
            barrier.wait()
            for _ in range(6):  # caller-side retry loop, per contract
                try:
                    execute_merge_statement(
                        spark,
                        f"MERGE INTO '{root}' AS t USING {view} AS s "
                        "ON t.k = s.k "
                        "WHEN MATCHED THEN UPDATE SET hits = t.hits + 1",
                    )
                    outcomes[tag] = "committed"
                    return
                except ConcurrentWriteError:
                    continue
            outcomes[tag] = "exhausted"

        ts = [
            threading.Thread(target=run, args=("a", "race_src_a")),
            threading.Thread(target=run, args=("b", "race_src_b")),
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert set(outcomes.values()) == {"committed"}
        got = {
            r["k"]: r["hits"]
            for r in read_snapshot(spark, root).collect()
        }
        # both increments survived — the anomaly would be {1:1, 2:0}
        # or {1:0, 2:1} (one merge silently erased by the other)
        assert got == {1: 1, 2: 1}
