"""Round-5 declared queries.

Leads with the oracle witness for the LAST pytest-only behavioral
surface (round-4 verdict item 3): the ``applyInPandasWithState``
gap-sessionizer (streaming/stateful.py:69), previously exercised only
by tests/test_streaming_stateful.py.

Registered LAST in registry._load_all so these names sort after the
existing never-driver-sampled backlog in the driver's ~50-query
prefix (the rotation drains oldest-unverified first).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.plans.registry import query
from openaq_data_pipeline_engineering_spark.scratch import fresh_scratch_dir
from openaq_data_pipeline_engineering_spark.sources.star import load_table


# --------------------------------------------------------------------------
# DECLARED witness for the custom-stateful streaming sessionizer
# (applyInPandasWithState, event-time timeouts). Construction makes the
# stream's closed-session output EQUAL the batch gaps-and-islands
# sessionization, so the oracle is exact:
#
# - the events subset is split into 3 files by TIME TERCILE (not by id):
#   each key's events arrive across micro-batches in nondecreasing
#   event-time order, so no batch ever carries data older than the
#   watermark and the in-batch/in-state session walk sees the same
#   sequence the batch window sort does;
# - maxFilesPerTrigger=1 + per-file mtimes force 5 ordered micro-batches
#   (3 slices + 2 sentinel files), so sessions genuinely carry state
#   across batches — a state reset would split every cross-slice session
#   and break the value hash;
# - a far-future '__flush__' sentinel key advances the GLOBAL watermark
#   past every real key's last_event + gap, so the event-time timeouts
#   fire in the final batch and every still-open session is emitted
#   (availableNow alone would end the query with open sessions stuck in
#   state). The sentinel's own session is filtered out.
#
# Scale: state is O(keys-in-watermark); each emitted row is one closed
# session. The memory sink bounds driver memory by the user_id%3 subset.
# --------------------------------------------------------------------------
@query(
    "streaming_sessionization",
    "streaming: applyInPandasWithState 30min-gap sessionizer across 5 "
    "forced micro-batches + watermark-timeout flush == batch "
    "gaps-and-islands sessions",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_id, ts FROM events WHERE user_id % 3 = 0
    ), flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                            > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts,
               CAST(sum(new_s) OVER (
                   PARTITION BY user_id ORDER BY ts, new_s DESC
                   ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS session_idx
        FROM flagged
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(epoch_us(min(ts)) AS BIGINT) AS start_us,
           CAST(epoch_us(max(ts)) AS BIGINT) AS end_us
    FROM sess GROUP BY user_id, session_idx
    """,
)
def streaming_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.engine import apply_runtime_confs
    from openaq_data_pipeline_engineering_spark.streaming.ingest import (
        scoped_shuffle_partitions,
    )
    from openaq_data_pipeline_engineering_spark.streaming.stateful import (
        sessionizer_stateful,
    )

    apply_runtime_confs(spark)
    gap_s = 1800
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 3 == 0)
        .select(
            F.col("user_id").cast("string").alias("skey"),
            "ts",
            F.unix_micros("ts").alias("us"),
        )
    )
    t1, t2, max_us = ev.agg(
        F.expr("CAST(percentile(us, 1.0/3) AS BIGINT)"),
        F.expr("CAST(percentile(us, 2.0/3) AS BIGINT)"),
        F.max("us"),
    ).first()

    drop = fresh_scratch_dir("sessionize_drop")
    slices = [
        ev.filter(F.col("us") <= t1),
        ev.filter((F.col("us") > t1) & (F.col("us") <= t2)),
        ev.filter(F.col("us") > t2),
    ]
    # Two sentinel batches: the first advances the watermark past every
    # real last_event + gap (so timers become eligible); the second
    # gives the engine a batch in which to FIRE them.
    margin_us = (gap_s + 7200) * 1_000_000
    for s_us in (max_us + margin_us, max_us + margin_us + 600_000_000):
        slices.append(
            spark.range(1).select(
                F.lit("__flush__").alias("skey"),
                F.timestamp_micros(F.lit(s_us)).alias("ts"),
                F.lit(s_us).alias("us"),
            )
        )
    base = time.time() - 3600
    for i, sdf in enumerate(slices):
        path = os.path.join(drop, f"slice_{i}")
        sdf.select("skey", "ts").coalesce(1).write.mode("overwrite").parquet(
            path
        )
        for f in os.listdir(path):  # pin micro-batch order via mtime
            if not f.startswith("_"):
                os.utime(os.path.join(path, f), (base + i * 30, base + i * 30))

    stream = (
        spark.readStream.format("parquet")
        .schema("skey string, ts timestamp")
        .option("recursiveFileLookup", True)
        .option("maxFilesPerTrigger", 1)
        .load(drop)
    )
    sessions = sessionizer_stateful(
        stream, key_col="skey", ts_col="ts", gap_seconds=gap_s,
        watermark="10 minutes",
    )
    checkpoint = fresh_scratch_dir("sessionize_ckpt")
    with scoped_shuffle_partitions(spark, 8):
        q = (
            sessions.writeStream.format("memory")
            .queryName("streaming_sessions_result")
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.sql(
        "SELECT CAST(key AS BIGINT) AS user_id, n_events, start_us, end_us "
        "FROM streaming_sessions_result WHERE key <> '__flush__'"
    )
