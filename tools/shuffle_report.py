"""Per-query shuffle-volume report: run every declared query and
record exchange bytes + operator row counts from the executed plans
(observability.execute_with_metrics — SQLMetrics, not estimates).

The efficiency profile the wall-clock bench cannot give: wall time
swings with co-tenancy, but bytes-through-the-exchange is
deterministic for a given SF and directly predicts cluster network
cost at scale.

Streaming queries execute inside their builders, so their batch
read-back plan carries no exchange metrics; their cost lives in
StreamingQueryProgress instead. A session-level StreamingQueryListener
captures every micro-batch's progress while each streaming_* witness
runs, and the report records a per-query streaming section: micro-batch
count, input rows, and each stateful operator's rows/memory — the
state-store footprint that predicts cluster memory at scale the same
way shuffle bytes predict network.

Usage: python tools/shuffle_report.py [sf_dir] [out.json] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

from openaq_data_pipeline_engineering_spark.engine import get_spark  # noqa: E402
from openaq_data_pipeline_engineering_spark.observability import (  # noqa: E402
    execute_with_metrics,
    metric_total,
    shuffle_bytes,
)
from openaq_data_pipeline_engineering_spark.plans.registry import get_queries  # noqa: E402

SKIP_PREFIX = "streaming_"


class _ProgressCollector(StreamingQueryListener):
    """Accumulates StreamingQueryProgress JSON for every micro-batch of
    every stream started while attached (builders may run >1 stream)."""

    def __init__(self) -> None:
        self.progress: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        self.progress.append(json.loads(event.progress.json))

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def drain(self, settle_sec: float = 2.0) -> list[dict]:
        """Listener delivery is async; wait until no new events land."""
        n = -1
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            if len(self.progress) == n:
                break
            n = len(self.progress)
            time.sleep(settle_sec)
        return self.progress


def _summarize_streaming(progress: list[dict], result_rows: int) -> dict:
    """One row per streaming witness: batch/input totals plus per-
    stateful-operator peaks (state rows + store memory) and totals
    (rows updated/removed) across all micro-batches of all streams."""
    ops: dict[str, dict] = {}
    n_input = 0
    for p in progress:
        n_input += int(p.get("numInputRows", 0) or 0)
        for so in p.get("stateOperators", []):
            name = so.get("operatorName") or "state"
            agg = ops.setdefault(
                name,
                {
                    "max_state_rows": 0,
                    "rows_updated": 0,
                    "rows_removed": 0,
                    "max_memory_used_bytes": 0,
                },
            )
            agg["max_state_rows"] = max(
                agg["max_state_rows"], int(so.get("numRowsTotal", 0) or 0)
            )
            agg["rows_updated"] += int(so.get("numRowsUpdated", 0) or 0)
            agg["rows_removed"] += int(so.get("numRowsRemoved", 0) or 0)
            agg["max_memory_used_bytes"] = max(
                agg["max_memory_used_bytes"],
                int(so.get("memoryUsedBytes", 0) or 0),
            )
    return {
        "micro_batches": len(progress),
        "input_rows": n_input,
        "state_operators": ops,
        "result_rows": result_rows,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "PLANS_METRICS.json"
    only = set(sys.argv[3:])
    spark = get_spark(
        app_name="shuffle-report", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    report: dict[str, dict] = {}
    streaming: dict[str, dict] = {}
    for name, fn in sorted(get_queries().items()):
        if only and name not in only:
            continue
        if name.startswith(SKIP_PREFIX):
            collector = _ProgressCollector()
            spark.streams.addListener(collector)
            try:
                n = fn(spark, sf_dir).count()
                streaming[name] = _summarize_streaming(
                    collector.drain(), n
                )
                print(
                    f"{name}: {streaming[name]['micro_batches']} "
                    f"micro-batches, "
                    f"{streaming[name]['input_rows']:,} input rows",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001 - report, don't abort
                streaming[name] = {"error": str(e)[:200]}
                print(f"{name}: ERROR {str(e)[:120]}", flush=True)
            finally:
                spark.streams.removeListener(collector)
            continue
        try:
            df = fn(spark, sf_dir).limit(100_000)
            n, nodes = execute_with_metrics(df)
            report[name] = {
                "shuffle_bytes": shuffle_bytes(nodes),
                "plan_output_rows": metric_total(
                    nodes, "number of output rows"
                ),
                "result_rows": n,
            }
            print(
                f"{name}: {report[name]['shuffle_bytes']:,} B", flush=True
            )
        except Exception as e:  # noqa: BLE001 - report, don't abort
            report[name] = {"error": str(e)[:200]}
            print(f"{name}: ERROR {str(e)[:120]}", flush=True)
    out = {"sf_dir": sf_dir, "queries": report, "streaming": streaming}
    if only:  # partial run: merge over the existing full report
        try:
            with open(out_path) as f:
                prev = json.load(f)
            if prev.get("sf_dir") == sf_dir:
                prev.setdefault("queries", {}).update(report)
                prev.setdefault("streaming", {}).update(streaming)
                out = prev
            else:
                print(
                    f"NOT merging into {out_path}: it was measured at "
                    f"{prev.get('sf_dir')}, this run at {sf_dir}; "
                    "writing the partial results fresh",
                    file=sys.stderr,
                )
        except (OSError, ValueError):
            pass  # missing or corrupt previous file: write fresh
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    total = sum(q.get("shuffle_bytes", 0) for q in report.values())
    print(
        f"\n{len(report)} batch queries ({total:,} shuffle bytes) + "
        f"{len(streaming)} streaming -> {out_path}"
    )


if __name__ == "__main__":
    main()
