"""Per-query shuffle-volume report: run every declared query and
record exchange bytes + operator row counts from the executed plans
(observability.execute_with_metrics — SQLMetrics, not estimates).

The efficiency profile the wall-clock bench cannot give: wall time
swings with co-tenancy, but bytes-through-the-exchange is
deterministic for a given SF and directly predicts cluster network
cost at scale.

Usage: python tools/shuffle_report.py [sf_dir] [out.json] [query ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openaq_data_pipeline_engineering_spark.engine import get_spark  # noqa: E402
from openaq_data_pipeline_engineering_spark.observability import (  # noqa: E402
    execute_with_metrics,
    metric_total,
    shuffle_bytes,
)
from openaq_data_pipeline_engineering_spark.plans.registry import get_queries  # noqa: E402

# Streaming queries execute inside their builder; their batch read-back
# plan carries no meaningful exchange metrics.
SKIP_PREFIX = "streaming_"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "PLANS_METRICS.json"
    only = set(sys.argv[3:])
    spark = get_spark(
        app_name="shuffle-report", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    report: dict[str, dict] = {}
    for name, fn in sorted(get_queries().items()):
        if name.startswith(SKIP_PREFIX) or (only and name not in only):
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
    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf_dir, "queries": report}, f, indent=1,
                  sort_keys=True)
    total = sum(
        q.get("shuffle_bytes", 0) for q in report.values()
    )
    print(f"\n{len(report)} queries, total shuffle {total:,} bytes -> {out_path}")


if __name__ == "__main__":
    main()
