"""Execution metrics extraction from executed plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.observability import (
    execute_with_metrics,
    metric_total,
    shuffle_bytes,
)
from openaq_data_pipeline_engineering_spark.sources.star import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_metrics_capture_shuffle_and_rows(spark):
    ev = load_table(spark, SF_DIR, "events")
    agg = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    n, nodes = execute_with_metrics(agg)
    assert n == 5
    # the groupBy exchanged SOMETHING and operators reported rows
    assert shuffle_bytes(nodes) > 0
    assert metric_total(nodes, "number of output rows") > 0
    names = {nm.node for nm in nodes}
    assert any("Exchange" in s for s in names)
