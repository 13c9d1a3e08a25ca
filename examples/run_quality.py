"""Data-quality walkthrough: declarative expectations end to end.

The reference validates its mart by ASSERTING in tests — a bad row
fails the whole Glue run and routes nowhere
(tests/test_glue_transformation.py:198-253). Here the same predicates
become declared rules that (1) report violations in one scan,
(2) quarantine bad rows without dropping them, and (3) run inside a
stream where valid rows upsert into a keyed versioned table and
violations land in a versioned dead-letter table a triage job can
time-travel or diff.

Flow:

1. expectation_report over events: per-rule violation counts plus the
   __any_failed__ / __all_valid__ summary, one aggregation pass,
2. split_expectations: the quarantine frame carries failed_rules
   per row — group it by failure mode,
3. streaming routing: three forced micro-batches through
   run_stream_quality_split; both output tables are versioned,
4. dead-letter triage: the quarantine table's change data feed between
   its first and latest versions shows exactly which bad rows each
   batch added.

Run:  python examples/run_quality.py [sf_dir] [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.engine import get_spark
from openaq_data_pipeline_engineering_spark.operators.expectations import (
    expectation_report,
    split_expectations,
)
from openaq_data_pipeline_engineering_spark.operators.versioned import (
    read_snapshot,
    snapshot_changes,
    snapshot_versions,
)
from openaq_data_pipeline_engineering_spark.sources.star import load_table
from openaq_data_pipeline_engineering_spark.streaming.quality import (
    run_stream_quality_split,
)

RULES = {
    "value_le_100": "value <= 100",
    "uid_not_mod7": "user_id % 7 <> 0",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="quality_demo_")
    )
    spark = get_spark(app_name="quality-demo", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )

    # -- 1. one-pass report ----------------------------------------------
    report = {
        r["rule"]: r["n_fail"]
        for r in expectation_report(ev, RULES).collect()
    }
    total = ev.count()
    print(
        "report: "
        + ", ".join(f"{k}={report[k]}" for k in sorted(report))
        + f" (of {total} rows)"
    )

    # -- 2. quarantine split, grouped by failure mode ---------------------
    valid, quarantine = split_expectations(ev, RULES)
    by_mode = (
        quarantine.groupBy(
            F.array_join("failed_rules", "+").alias("failure_mode")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("failure_mode")
        .collect()
    )
    print(
        "quarantine by mode: "
        + ", ".join(f"{r['failure_mode']}={r['n']}" for r in by_mode)
    )
    assert valid.count() + quarantine.count() == total

    # -- 3. streaming routing (3 forced micro-batches) --------------------
    drop = os.path.join(work, "drop")
    n_max = ev.agg(F.max("event_id")).first()[0]
    for i in range(3):
        lo, hi = i * (n_max + 1) // 3, (i + 1) * (n_max + 1) // 3
        (
            ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(drop, f"slice_{i}"))
        )
    stream = (
        spark.readStream.format("parquet")
        .schema(
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )
        .option("recursiveFileLookup", True)
        .option("maxFilesPerTrigger", 1)
        .load(drop)
    )
    valid_dir = os.path.join(work, "valid_table")
    dead_dir = os.path.join(work, "dead_letter")
    run_stream_quality_split(
        stream,
        os.path.join(work, "ckpt"),
        RULES,
        valid_dir,
        dead_dir,
        keys=["event_id"],
        ts_col="ts",
    )
    n_valid = read_snapshot(spark, valid_dir).count()
    dead = read_snapshot(spark, dead_dir)
    print(
        f"streamed: valid table {n_valid} rows, "
        f"dead letter {dead.count()} rows over "
        f"{len(snapshot_versions(dead_dir))} retained versions"
    )
    assert n_valid == valid.count()

    # -- 4. dead-letter triage via CDF ------------------------------------
    versions = snapshot_versions(dead_dir)
    if len(versions) >= 2:
        feed = snapshot_changes(
            spark,
            dead_dir,
            keys=["event_id"],
            v_from=versions[0],
            v_to=versions[-1],
        )
        inserts = feed.filter(F.col("_change_type") == "insert").count()
        print(f"dead-letter CDF v{versions[0]}->v{versions[-1]}: {inserts} new bad rows")
    print("quality pipeline complete")


if __name__ == "__main__":
    main()
