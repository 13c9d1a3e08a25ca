"""Dynamic partition pruning (DPP) evidence: a selective dimension
filter joined to a Hive-partitioned fact must inject a runtime
DynamicPruning subquery into the fact scan's partition filters — at
100 TB this is the difference between scanning 3 partitions and 3,000.
The engine leaves `spark.sql.optimizer.dynamicPartitionPruning.enabled`
at its default (true); this pins that the feature actually fires on
our partitioned-sink layout (plans/mart.py writes the same shape).

The pruning assertion is on EXECUTED scan metrics (partitions/files
actually read), not the pre-AQE plan string: at toy sizes Spark may
broadcast the parquet FACT side (its stats are known-small while an
RDD-backed dim defaults to unknown/huge), in which case
`reuseBroadcastOnly` replaces the pruning expression with `true` at
runtime and the plan-string assert passes while nothing is pruned.
The broadcast hint on the dim pins the realistic build side (at real
scale the dim is the small side), making the runtime prune real.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.observability import execute_with_metrics


def _fact_scan_metrics(nodes):
    scans = [
        nm
        for nm in nodes
        if "Scan parquet" in nm.node or "FileScan" in nm.node
    ]
    assert scans, [nm.node for nm in nodes]
    return scans[0].metrics


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
    joined = fact_r.join(
        F.broadcast(dim.filter(F.col("tag") == "keep")), on="day"
    )

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    # Execute ONCE and assert on the scan's runtime metrics: only the
    # 2 selected partitions' files were actually read.
    n, nodes = execute_with_metrics(joined)
    assert n == fact.filter(F.col("day").isin(3, 7)).count()
    m = _fact_scan_metrics(nodes)
    n_part = m.get("number of partitions read")
    n_files = m.get("number of files read")
    static_files = m.get("static number of files read")
    assert n_part == 2, m
    assert static_files is not None and n_files < static_files, m


def test_dpp_replaced_with_true_when_fact_is_build_side(spark):
    # The failure mode the metrics assert exists to catch: without the
    # dim-side broadcast pin, toy-size stats make Spark broadcast the
    # FACT (parquet stats known-small; RDD dim unknown), DPP's
    # broadcast-reuse precondition fails, the filter degrades to
    # `dynamicpruningexpression(true)` — plan string still says
    # "dynamicpruning", but every partition is read.
    out = tempfile.mkdtemp(prefix="dpp_degraded_")
    fact = spark.range(0, 10_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 20).alias("day"),
    )
    fact.write.mode("overwrite").partitionBy("day").parquet(out)
    dim = spark.createDataFrame(
        [(d, "keep" if d in (3, 7) else "drop") for d in range(20)],
        "day long, tag string",
    )
    joined = spark.read.parquet(out).join(
        dim.filter(F.col("tag") == "keep"), on="day"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    _, nodes = execute_with_metrics(joined)
    m = _fact_scan_metrics(nodes)
    # All 20 partitions read: the plan-string assert alone proves
    # nothing about runtime pruning.
    assert m.get("number of partitions read") == 20, m


def test_dpp_absent_without_partition_column_join(spark):
    # Control: joining on a NON-partition column must not claim DPP.
    out = tempfile.mkdtemp(prefix="dpp_ctrl_")
    fact = spark.range(0, 1_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 20).alias("day"),
    )
    fact.write.mode("overwrite").partitionBy("day").parquet(out)
    dim = spark.createDataFrame([(5, "x")], "k long, tag string")
    joined = spark.read.parquet(out).join(F.broadcast(dim), on="k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" not in plan.lower()
    assert joined.count() == 1
