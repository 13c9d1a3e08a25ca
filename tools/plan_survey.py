"""Plan-shape survey of every declared query (optimization checklist).

Usage: python tools/plan_survey.py [sf_dir] [out.json]

For each declared query, builds the DataFrame (no execution) and records
physical-plan-shape metrics: Exchange count, join strategies, Python
evaluation nodes, scan count and widest ReadSchema. The output JSON is
the round's optimization checklist — queries sort by Exchange count so
the shuffle-heaviest plans surface first.
"""

from __future__ import annotations

import json
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openaq_data_pipeline_engineering_spark.engine import get_spark  # noqa: E402
from openaq_data_pipeline_engineering_spark.plans.registry import get_queries  # noqa: E402

JOIN_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)
PY_NODES = ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas", "MapInArrow")


def survey_plan(plan: str) -> dict:
    out: dict = {}
    out["exchanges"] = len(re.findall(r"\bExchange\b", plan))
    out["joins"] = {
        j: plan.count(j) for j in JOIN_NODES if j in plan
    }
    out["python"] = {p: plan.count(p) for p in PY_NODES if p in plan}
    paths = re.findall(r"InMemoryFileIndex\(\d+ paths?\)\[([^\]]+)\]", plan)
    scans = Counter(p.split(",")[0] for p in paths)
    out["n_scans"] = sum(scans.values())
    out["max_rescans"] = max(scans.values()) if scans else 0
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    out["max_read_cols"] = max(
        (len([c for c in s.split(",") if c]) for s in schemas), default=0
    )
    out["sorts"] = plan.count("Sort ")
    out["windows"] = plan.count("Window ")
    return out


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    out_path = args[1] if len(args) > 1 else "/tmp/plan_survey.json"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="openaq-plan-survey",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    for name, fn in sorted(get_queries().items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            results[name] = survey_plan(plan)
        except Exception as e:  # streaming-only/side-effecting entries
            results[name] = {"error": str(e)[:200]}
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    ranked = sorted(
        (r.get("exchanges", 0), n) for n, r in results.items()
    )
    for ex, n in ranked[::-1][:40]:
        r = results[n]
        print(
            f"{n:45s} ex={ex:2d} scans={r.get('n_scans', 0):2d} "
            f"joins={r.get('joins', {})} py={r.get('python', {})}"
        )
    print(f"wrote {out_path} ({len(results)} queries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
