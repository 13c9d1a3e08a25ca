"""Per-query profile: wall time, Spark job/stage/task counts, task time.

Usage: python tools/profile_query.py [sf_dir] query [query ...]

For each named query, runs it twice (first run warms caches; the second
is the measured one) with the same session shape as bench.py, then pulls
the job/stage deltas from the local UI REST API. High job counts with
low task time = driver/orchestration bound (py4j roundtrips, many tiny
actions); few jobs with high task time = compute bound.
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
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="openaq-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    queries = get_queries()
    # warmup
    queries["flagship_daily_topk"](spark, sf_dir).count()

    print(f"{'query':42s} {'wall_s':>7s} {'jobs':>5s} {'stages':>6s} {'tasks':>6s} {'task_s':>8s}")
    for name in args:
        fn = queries[name]
        fn(spark, sf_dir).count()  # warm run
        jobs_before = {j["jobId"] for j in rest(base, "/jobs")}
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        time.sleep(0.3)
        jobs = [j for j in rest(base, "/jobs") if j["jobId"] not in jobs_before]
        stage_ids = set()
        for j in jobs:
            stage_ids.update(j.get("stageIds", []))
        n_tasks = sum(j.get("numTasks", 0) for j in jobs)
        task_sec = 0.0
        for sid in stage_ids:
            try:
                for att in rest(base, f"/stages/{sid}"):
                    task_sec += att.get("executorRunTime", 0) / 1000.0
            except Exception:
                pass
        print(
            f"{name:42s} {wall:7.3f} {len(jobs):5d} {len(stage_ids):6d} "
            f"{n_tasks:6d} {task_sec:8.2f}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
