"""Benchmark runner: executes the declared headline queries on
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) with
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": "..."}

Timings are end-to-end per query (plan + execute + collect-to-count),
after a JVM/session warmup query, so they measure steady-state engine
throughput rather than session startup.

The final stdout JSON line carries the HEADLINE subset of per-query
timings plus suite-level aggregates; it is deliberately kept under
~1,900 characters because the round driver captures only the tail of
stdout (2,000 chars) when recording BENCH_r{N}.json — a full 230-query
dict overflows that window and the line is never parsed (observed in
rounds 1-3). The complete per-query map is written to
``BENCH_DETAIL.json`` next to this script and printed to stderr.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from openaq_data_pipeline_engineering_spark.engine import get_spark  # noqa: E402
from openaq_data_pipeline_engineering_spark.plans.registry import get_queries  # noqa: E402

# Headline set: every declared query (correctness surface == bench surface).
SKIP: set[str] = set()

# Per-query timings carried on the final stdout JSON line (the full map
# goes to BENCH_DETAIL.json). One representative per major capability
# family so the parsed artifact still profiles the engine end-to-end.
HEADLINE: tuple[str, ...] = (
    "flagship_daily_topk",  # reference flagship: multi-agg + filter + top-k
    "mart_wide_pipeline",  # full reference ETL chain (parse→dedup→pivot→enrich)
    "pivot_mean",  # A1 pivot
    "dedup_window",  # W1 ranked-window dedup
    "pricing_summary",  # TPC-H Q1 analogue (wide agg scan)
    "market_share_q8",  # TPC-H Q8 (8-table join tree)
    "dedup_exact",  # corpus exact dedup
    "minhash_lsh_candidates",  # near-dup LSH
    "ann_cosine_topk",  # vector similarity
    "pretraining_funnel",  # composed LLM-data pipeline
    "bpe_merge_training",  # iterative trainer
    "triangle_count",  # graph
    "sessionization",  # event-time gap sessionize
    "streaming_windowed_counts",  # structured streaming
    "asof_join_lastclick",  # as-of join
    "geo_density_clusters",  # geospatial grid
    "rrf_fusion_topk",  # round-4: retrieval fusion
    "priority_sample_topk",  # round-4: weighted sampling
    "streaming_sessionization",  # round-5: stateful sessionizer witness (suite max)
    "dsir_importance_weights",  # round-5: DSIR data selection
    "sql_merge_into",  # round-6: MERGE statement over versioned snapshots
    "snapshot_change_feed",  # round-6: CDF between snapshot versions
)


def run_provenance() -> dict:
    """Run-context stamp (VERDICT r7 #7): a noisy co-tenant run and a
    quiet committed run are indistinguishable in the timing numbers
    alone (dedup_exact read 0.54 s quiet vs 2.12 s under driver load in
    round 7 — environment, not code). Every bench JSON carries the
    1/5/15-min load averages sampled at start and the run context:
    ``solo`` only when the invoker explicitly claims a quiet machine
    via ``SPARK_GRAFT_BENCH_CONTEXT=solo``; anything else (the round
    driver sets nothing) stamps ``driver`` and writes the detail map
    to BENCH_DETAIL_DRIVER.json so it can never overwrite the
    committed quiet-run BENCH_DETAIL.json."""
    try:
        la = [round(x, 2) for x in os.getloadavg()]
    except OSError:  # pragma: no cover - platform without getloadavg
        la = []
    ctx = os.environ.get("SPARK_GRAFT_BENCH_CONTEXT", "driver")
    if ctx != "solo":
        ctx = "driver"
    return {"loadavg": la, "context": ctx}


def detail_file_name(context: str) -> str:
    return (
        "BENCH_DETAIL.json" if context == "solo" else "BENCH_DETAIL_DRIVER.json"
    )


def build_summary_line(
    timings: dict[str, float],
    total: float,
    runs: int,
    cpus: int,
    sf: str,
    provenance: dict | None = None,
) -> str:
    """The ONE stdout JSON line the driver parses from its 2,000-char
    stdout-tail capture. Headline queries are dropped (never suite
    aggregates) until the line fits the 1,900-char budget; the result
    is asserted < 1,900 so a drift in query-name length or aggregate
    fields fails HERE, not silently in the driver's parse
    (tests/test_bench_contract.py pins this for a full-size suite)."""
    prov = provenance if provenance is not None else run_provenance()
    ordered = sorted(timings.values())
    n_q = len(ordered)
    median = ordered[n_q // 2] if n_q else 0.0
    summary = {
        "metric": "declared_query_suite_wall_clock",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: timings[k] for k in HEADLINE if k in timings},
        "n_queries": n_q,
        "median_sec": round(median, 3),
        "p95_sec": round(ordered[int(n_q * 0.95)], 3) if n_q else 0.0,
        "runs_per_query": runs,
        "cpus": cpus,
        "sf": sf,
        "loadavg": prov["loadavg"],
        "context": prov["context"],
        "detail": detail_file_name(prov["context"]),
    }
    line = json.dumps(summary)
    # Hard guard for the driver's 2,000-char stdout-tail capture.
    while len(line) > 1900 and summary["queries"]:
        summary["queries"].popitem()
        line = json.dumps(summary)
    assert len(line) <= 1900, (
        f"bench summary line is {len(line)} chars even with all "
        "per-query timings dropped — the driver's stdout-tail capture "
        "would truncate it; shrink the aggregate fields"
    )
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    prov = run_provenance()  # loadavg sampled BEFORE the run warms cores
    spark = get_spark(
        app_name="openaq-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = get_queries()

    # Warmup: one-time session setup costs are excluded from steady-state
    # throughput — JVM JIT + parquet footer caches (flagship run), Python
    # worker spawn (one Arrow batch through every core), nested-loop-join
    # codegen (tiny NLJ), and Structured Streaming machinery (one
    # micro-batch on a 2-row memory checkpoint).
    queries["flagship_daily_topk"](spark, sf_dir).count()
    spark.range(0, int(cpus) * 4, 1, int(cpus)).mapInPandas(
        lambda it: it, "id long"
    ).count()
    a = spark.range(0, 100).toDF("x")
    b = spark.range(0, 4).toDF("lo")
    a.join(b, a["x"] >= b["lo"]).count()  # BroadcastNestedLoopJoin path
    import tempfile

    ckpt = tempfile.mkdtemp(prefix="bench_warm_ckpt_")
    src = tempfile.mkdtemp(prefix="bench_warm_src_")
    with open(os.path.join(src, "w.json"), "w") as f:
        f.write('{"k": 1}\n{"k": 1}\n')
    (
        spark.readStream.format("json")
        .schema("k long")
        .load(src)
        .groupBy("k")
        .count()
        .writeStream.format("memory")
        .queryName("bench_warm")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

    def reset_session_state() -> None:
        """Per-query hygiene so a query's number reflects ITS cost, not
        residue from the 200+ queries before it in suite order. Leaked
        storage blocks (localCheckpoint lineage-truncation RDDs from the
        connected-components family, persisted frames) and memory-sink
        tables otherwise accumulate across the suite, squeezing
        execution memory until unrelated late-alphabet queries read 2-3×
        slower than their warm cost (r4: waiting_suppliers_q21 bench
        4.47 s vs 1.79 s warm). Unpersist is lazy/non-blocking; each
        invocation rebuilds its own checkpoints, so this never slows a
        correct query — it only stops cross-query interference."""
        jsc = spark.sparkContext._jsc.sc()
        it = jsc.getPersistentRDDs().iterator()
        while it.hasNext():
            it.next()._2().unpersist(False)
        spark.catalog.clearCache()
        gc.collect()  # drop py4j refs so ContextCleaner can act

    # Best-of-RUNS per query: the machine is shared, and a single sample
    # folds co-tenant noise into the number; the minimum is the
    # steady-state engine cost (what the docstring promises to measure).
    # 3 samples (VERDICT r9 #6): round-9's best-of-2 solo freeze carried
    # four >2x one-off spikes that other samples disproved — a third
    # sample plus a recorded per-query SPREAD (worst/best ratio) makes
    # a noisy sample visible in the artifact instead of silently
    # inflating the committed number.
    RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    total = 0.0
    for name, fn in sorted(queries.items()):
        if name in SKIP:
            continue
        samples: list[float] = []
        n = 0
        for _ in range(RUNS):
            reset_session_state()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            samples.append(time.perf_counter() - t0)
        best = min(samples)
        timings[name] = round(best, 3)
        spreads[name] = round(max(samples) / best, 2) if best > 0 else 1.0
        total += best
        print(
            f"# {name}: {n} rows in {best:.3f}s "
            f"(spread x{spreads[name]:.2f})",
            file=sys.stderr,
        )

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    detail = {
        "metric": "declared_query_suite_wall_clock",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        # worst/best ratio across this run's samples: >1.5 flags a
        # query whose number is noise-sensitive in THIS context
        "spread": spreads,
        "runs_per_query": RUNS,
        "cpus": int(cpus),
        "sf": sf,
        **prov,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        detail_file_name(prov["context"]),
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    print(json.dumps(detail), file=sys.stderr)

    print(build_summary_line(timings, total, RUNS, int(cpus), sf, prov))
    spark.stop()


if __name__ == "__main__":
    main()
