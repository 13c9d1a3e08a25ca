"""Streaming walkthrough: incremental file ingest with watermarked
dedup, the custom stateful sessionizer, and the keyed upsert sink —
the engine's replacement for the reference's daily batch DAG
(re-delivered raw drops converge to one deduped, sessionized state).

Flow (all Trigger.AvailableNow — batch-catchup semantics, same code a
24/7 stream would run):

1. three NDJSON drop files land (with overlapping re-delivery),
2. readStream + dropDuplicatesWithinWatermark dedups them in-stream,
3. the applyInPandasWithState sessionizer emits closed sessions,
4. foreachBatch upserts a keyed last-writer-wins snapshot.

Run:  python examples/run_streaming.py [workdir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.engine import get_spark
from openaq_data_pipeline_engineering_spark.streaming.ingest import (
    StreamingQueryStarter,
    incremental_ingest,
    scoped_shuffle_partitions,
)
from openaq_data_pipeline_engineering_spark.streaming.stateful import sessionizer_stateful
from openaq_data_pipeline_engineering_spark.streaming.upsert import (
    read_snapshot,
    run_stream_upsert,
)

# Three drops; drop2 RE-DELIVERS u1's 10:00 event (same key+ts) and
# adds late-but-in-watermark data. Times are naive UTC.
DROPS = {
    "drop1.json": [
        {"user": "u1", "ts": "2026-01-05 10:00:00", "v": 1.0},
        {"user": "u1", "ts": "2026-01-05 10:10:00", "v": 2.0},
        {"user": "u2", "ts": "2026-01-05 10:05:00", "v": 5.0},
    ],
    "drop2.json": [
        {"user": "u1", "ts": "2026-01-05 10:00:00", "v": 1.0},  # re-delivery
        {"user": "u1", "ts": "2026-01-05 11:30:00", "v": 3.0},  # new session
        {"user": "u2", "ts": "2026-01-05 10:20:00", "v": 6.0},
    ],
    "drop3.json": [
        # far-future flush record: advances the watermark so the
        # sessionizer's event-time timeouts close the open sessions
        {"user": "__flush__", "ts": "2026-01-06 00:00:00", "v": 0.0},
    ],
}


def main(workdir: str) -> None:
    raw_dir = os.path.join(workdir, "raw")
    os.makedirs(raw_dir, exist_ok=True)
    import time

    base = time.time() - 600
    for i, (name, rows) in enumerate(DROPS.items()):
        path = os.path.join(raw_dir, name)
        with open(path, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        # pin mtimes so maxFilesPerTrigger=1 processes drops in order
        # (the file source goes oldest-first)
        os.utime(path, (base + i * 30, base + i * 30))

    spark = get_spark(app_name="streaming-demo")
    spark.sparkContext.setLogLevel("ERROR")

    # --- 1+2. incremental ingest with dedup-in-watermark
    deduped, _ = incremental_ingest(
        spark,
        source_dir=raw_dir,
        checkpoint_dir=os.path.join(workdir, "ckpt_ingest"),
        schema="user string, ts string, v double",
        keys=["user", "ts"],
        ts_col="ts",
        transform=lambda s: s.withColumn("ts", F.col("ts").cast("timestamp")),
        source_format="json",
        watermark="2 hours",
    )
    with scoped_shuffle_partitions(spark, 4):
        StreamingQueryStarter(
            deduped, os.path.join(workdir, "ckpt_dedup_sink")
        ).run_available_now_to_memory("demo_deduped")
    n_raw = sum(len(v) for v in DROPS.values())
    n_dedup = spark.sql("SELECT count(*) AS n FROM demo_deduped").first()["n"]
    print(f"ingested {n_raw} raw rows -> {n_dedup} after in-stream dedup")

    # --- 3. stateful sessionizer over the same drops (30-min gap)
    stream = (
        spark.readStream.format("json")
        .schema("user string, ts string, v double")
        .option("maxFilesPerTrigger", 1)
        .load(raw_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    sessions = sessionizer_stateful(
        stream, key_col="user", ts_col="ts", gap_seconds=1800
    )
    with scoped_shuffle_partitions(spark, 4):
        q = (
            sessions.writeStream.format("memory")
            .queryName("demo_sessions")
            .outputMode("append")
            .option(
                "checkpointLocation", os.path.join(workdir, "ckpt_sessions")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    print("-- closed sessions (key, n_events, start, end) --")
    spark.sql(
        "SELECT key, n_events, timestamp_micros(start_us) AS start, "
        "timestamp_micros(end_us) AS end FROM demo_sessions "
        "WHERE key <> '__flush__' ORDER BY key, start_us"
    ).show(truncate=False)

    # --- 4. keyed upsert sink: per-user latest state converges
    stream2 = (
        spark.readStream.format("json")
        .schema("user string, ts string, v double")
        .load(raw_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    target = os.path.join(workdir, "user_state")
    with scoped_shuffle_partitions(spark, 4):
        run_stream_upsert(
            stream2,
            checkpoint_dir=os.path.join(workdir, "ckpt_upsert"),
            target_dir=target,
            keys=["user"],
            ts_col="ts",
        )
    print("-- upserted per-user latest state --")
    read_snapshot(spark, target).orderBy("user").show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="aq_stream_"))
