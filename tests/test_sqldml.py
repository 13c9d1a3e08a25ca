"""UPDATE / DELETE statement lowering (operators/sqldml.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.engine import Engine
from openaq_data_pipeline_engineering_spark.operators.sqldml import (
    execute_delete,
    execute_update,
)
from openaq_data_pipeline_engineering_spark.operators.sqlmerge import MergeError


def _t(spark):
    return spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 20.0), (3, "C", None)],
        "k int, seg string, bal double",
    )


def _rows(df):
    return {tuple(r) for r in df.collect()}


class TestUpdate:
    def test_conditional_update(self, spark):
        out = execute_update(
            spark,
            "UPDATE t SET seg = lower(seg), bal = bal * 2 WHERE k >= 2",
            target_df=_t(spark),
        )
        assert _rows(out) == {
            (1, "A", 10.0),
            (2, "b", 40.0),
            (3, "c", None),
        }
        assert out.columns == ["k", "seg", "bal"]

    def test_unconditional_update_and_alias(self, spark):
        out = execute_update(
            spark,
            "UPDATE tbl AS x SET bal = 0.0",
            target_df=_t(spark),
        )
        assert {r[2] for r in out.collect()} == {0.0}

    def test_unknown_column_rejected(self, spark):
        with pytest.raises(MergeError, match="unknown columns"):
            execute_update(
                spark, "UPDATE t SET nope = 1", target_df=_t(spark)
            )
        with pytest.raises(MergeError, match="unparseable"):
            execute_update(spark, "UPDATE t WHERE k = 1", target_df=_t(spark))


class TestDelete:
    def test_conditional_delete_null_predicate_kept(self, spark):
        # k=3 has bal NULL: 'bal > 15' is NULL there -> row is KEPT
        out = execute_delete(
            spark, "DELETE FROM t WHERE bal > 15", target_df=_t(spark)
        )
        assert _rows(out) == {(1, "A", 10.0), (3, "C", None)}

    def test_delete_all(self, spark):
        out = execute_delete(spark, "DELETE FROM t", target_df=_t(spark))
        assert out.count() == 0
        assert out.columns == ["k", "seg", "bal"]

    def test_garbage_rejected(self, spark):
        with pytest.raises(MergeError, match="unparseable"):
            execute_delete(spark, "DELETE t WHERE 1=1", target_df=_t(spark))


class TestEngineRouting:
    def test_engine_routes_update_delete(self, spark):
        eng = Engine(spark)
        eng.register("dml_t", _t(spark))
        upd = eng.sql("UPDATE dml_t SET seg = 'X' WHERE k = 1")
        assert ("X" in {r[1] for r in upd.collect()})
        dele = eng.sql("DELETE FROM dml_t WHERE k <= 2")
        assert {r[0] for r in dele.collect()} == {3}
        # passthrough for everything else
        assert eng.sql("SELECT 1 AS x").first()[0] == 1

    def test_plan_is_single_pass(self, spark):
        out = execute_update(
            spark, "UPDATE t SET bal = bal + 1 WHERE k = 2",
            target_df=_t(spark),
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan and "Exchange" not in plan


class TestReviewHardening:
    def test_keywords_inside_literals(self, spark):
        out = execute_update(
            spark,
            "UPDATE t SET seg = 'a WHERE b' WHERE k = 1",
            target_df=_t(spark),
        )
        assert (1, "a WHERE b", 10.0) in _rows(out)
        out = execute_delete(
            spark,
            "DELETE FROM t WHERE seg <> 'X WHERE Y'",
            target_df=_t(spark),
        )
        assert out.count() == 0  # all segs differ from the literal

    def test_dotted_table_name_aliases_last_segment(self, spark):
        out = execute_update(
            spark,
            "UPDATE db.t SET bal = t.bal + 1 WHERE t.k = 1",
            target_df=_t(spark),
        )
        assert (1, "A", 11.0) in _rows(out)

    def test_case_insensitive_set_column(self, spark):
        out = execute_update(
            spark, "UPDATE t SET BAL = 0.0", target_df=_t(spark)
        )
        assert {r[2] for r in out.collect()} == {0.0}
        assert out.columns == ["k", "seg", "bal"]
