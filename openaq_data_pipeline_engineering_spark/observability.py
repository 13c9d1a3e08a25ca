"""Execution observability: per-operator SQL metrics from an executed
plan — rows produced, shuffle bytes, spill, scan sizes.

"Measure, don't guess": the reference pipeline's only runtime signal
is eager `.count()` logging between stages (reference
glue_jobs/process_openaq_raw.py progress prints), which COSTS extra
jobs. Spark already meters every physical operator (SQLMetrics); this
module surfaces those counters after a single execution, so shuffle
volume and row counts come from the run you already paid for.

Use it to answer the 100 TB questions locally: how many bytes did the
exchange move, did the partial aggregate collapse rows before the
shuffle, did anything spill — then fix the plan, not the symptom.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class NodeMetrics:
    node: str
    metrics: dict[str, int]


def execute_with_metrics(df: DataFrame) -> tuple[int, list[NodeMetrics]]:
    """Run ``df`` (collect action — `count()` would compile a SEPARATE
    aggregate QueryExecution whose run leaves this plan's counters at
    zero) and return (row_count, per-node metrics) from the SAME
    QueryExecution the action executed.

    JVM access is driver-side plan introspection only — nothing here
    touches the data path. Intended for bounded results (the engine's
    declared queries all end in aggregates/top-k).
    """
    n = len(df.collect())
    qe = df._jdf.queryExecution()
    root = qe.executedPlan()
    out: list[NodeMetrics] = []

    def walk(node) -> None:
        name = node.nodeName()
        metrics = {}
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            metric = kv._2()
            opt = metric.name()
            label = str(opt.get()) if opt.isDefined() else str(kv._1())
            metrics[label] = int(metric.value())
        if metrics:
            out.append(NodeMetrics(node=str(name), metrics=metrics))
        children = node.children()
        for i in range(children.size()):
            walk(children.apply(i))
        # AQE wrappers: AdaptiveSparkPlan holds the final plan in
        # executedPlan(); QueryStageExec nodes hold theirs in plan().
        # Neither surfaces them through children().
        for accessor in ("executedPlan", "plan"):
            try:
                walk(getattr(node, accessor)())
                break
            except Exception:  # noqa: BLE001 - absent accessor on py4j
                continue

    walk(root)
    return n, out


def shuffle_bytes(nodes: list[NodeMetrics]) -> int:
    """Total shuffle bytes written across the plan's exchanges."""
    total = 0
    for nm in nodes:
        for k, v in nm.metrics.items():
            if "shuffle bytes written" in k:
                total += v
    return total


def metric_total(nodes: list[NodeMetrics], metric_name: str) -> int:
    """Sum a named metric (e.g. 'number of output rows') over nodes."""
    return sum(
        v
        for nm in nodes
        for k, v in nm.metrics.items()
        if k == metric_name
    )
