"""Per-stage profile of one query: stage name, tasks, task time, I/O.

Usage: python tools/profile_stages.py [sf_dir] query [n_top]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openaq_data_pipeline_engineering_spark.engine import get_spark  # noqa: E402
from openaq_data_pipeline_engineering_spark.plans.registry import get_queries  # noqa: E402


def rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args[0]
        args = args[1:]
    name = args[0]
    n_top = int(args[1]) if len(args) > 1 else 25
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="openaq-profile-stages",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    queries = get_queries()
    queries["flagship_daily_topk"](spark, sf_dir).count()
    fn = queries[name]
    fn(spark, sf_dir).count()  # warm
    before = {s["stageId"] for s in rest(base, "/stages")}
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    wall = time.perf_counter() - t0
    time.sleep(0.5)
    stages = [
        s
        for s in rest(base, "/stages")
        if s["stageId"] not in before and s["status"] != "SKIPPED"
    ]
    stages.sort(key=lambda s: -s.get("executorRunTime", 0))
    print(f"{name}: wall={wall:.3f}s, {len(stages)} stages")
    print(
        f"{'stage':>6s} {'tasks':>5s} {'run_s':>7s} {'cpu_s':>7s} "
        f"{'in_MB':>7s} {'sh_r_MB':>8s} {'sh_w_MB':>8s}  name"
    )
    for s in stages[:n_top]:
        print(
            f"{s['stageId']:6d} {s['numCompleteTasks']:5d} "
            f"{s.get('executorRunTime', 0) / 1e3:7.2f} "
            f"{s.get('executorCpuTime', 0) / 1e9:7.2f} "
            f"{s.get('inputBytes', 0) / 1e6:7.1f} "
            f"{s.get('shuffleReadBytes', 0) / 1e6:8.2f} "
            f"{s.get('shuffleWriteBytes', 0) / 1e6:8.2f}  "
            f"{s.get('name', '')[:60]}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
