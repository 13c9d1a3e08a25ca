"""Join-strategy hints select their physical operators and agree on
results (the declared join_strategy_control query proves value
equality; this asserts the physical plans differ as intended)."""

from __future__ import annotations

from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.sources.star import load_table

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_hints_select_strategies(spark):
    orders = load_table(spark, SF_DIR, "orders")
    cust = load_table(spark, SF_DIR, "customer")
    on = orders["o_custkey"] == cust["c_custkey"]

    bhj = _plan(orders.join(F.broadcast(cust), on))
    smj = _plan(orders.join(cust.hint("merge"), on))
    shj = _plan(orders.join(cust.hint("shuffle_hash"), on))
    assert "BroadcastHashJoin" in bhj
    assert "SortMergeJoin" in smj
    assert "ShuffledHashJoin" in shj
