"""Bench a named subset of declared queries with bench.py's exact
methodology (best-of-N ``count()`` after warmup, per-query session-state
reset) and optionally dump each query's ``explain('formatted')``.

Usage:
    python tools/bench_subset.py [--runs=3] [--plans=DIR --suffix=after]
        [--sf=/root/testdata/sf0.1] name [name ...]

Prints one JSON line {"queries": {name: best_sec}, "spread": {...}}.
Used for same-session A/B evidence during optimization rounds; the
committed suite numbers still come from bench.py itself.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openaq_data_pipeline_engineering_spark.engine import get_spark  # noqa: E402
from openaq_data_pipeline_engineering_spark.plans.registry import get_queries  # noqa: E402


def main() -> None:
    args = list(sys.argv[1:])
    runs, plans_dir, suffix = 3, None, "plan"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    for a in args:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        elif a.startswith("--plans="):
            plans_dir = a.split("=", 1)[1]
        elif a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]
        elif a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        else:
            names.append(a)

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bench-subset",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = get_queries()

    # Same warmup as bench.py (JIT + parquet footers + Python workers).
    queries["flagship_daily_topk"](spark, sf_dir).count()
    spark.range(0, int(cpus) * 4, 1, int(cpus)).mapInPandas(
        lambda it: it, "id long"
    ).count()

    def reset_session_state() -> None:
        jsc = spark.sparkContext._jsc.sc()
        it = jsc.getPersistentRDDs().iterator()
        while it.hasNext():
            it.next()._2().unpersist(False)
        spark.catalog.clearCache()
        gc.collect()

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w"
            ) as f:
                f.write(plan)
        samples = []
        for _ in range(runs):
            reset_session_state()
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"bench:{name}")
            fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        best = min(samples)
        timings[name] = round(best, 3)
        spreads[name] = round(max(samples) / best, 2) if best > 0 else 1.0
        print(f"# {name}: {best:.3f}s (spread x{spreads[name]:.2f})", file=sys.stderr)
    print(json.dumps({"queries": timings, "spread": spreads}))
    spark.stop()


if __name__ == "__main__":
    main()
