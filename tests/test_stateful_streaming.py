"""applyInPandasWithState: state must accumulate across micro-batches
and survive a query restart on the same checkpoint."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from openaq_data_pipeline_engineering_spark.streaming.stateful import running_stats

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def _write_batch(src_dir: str, name: str, rows: list[dict]) -> None:
    with open(os.path.join(src_dir, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run_available_now(spark, src_dir: str, ckpt: str, out_dir: str) -> list:
    """Run one availableNow pass; collect emitted rows via foreachBatch
    (the memory sink does not support checkpoint recovery)."""
    stream = spark.readStream.format("json").schema(SCHEMA).load(src_dir)
    out = running_stats(stream, "k", "v")

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).collect()


def test_state_accumulates_across_restarts(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    _write_batch(src, "b1.json", [{"k": "a", "v": 1.0}, {"k": "a", "v": 3.0},
                                  {"k": "b", "v": 10.0}])
    rows1 = _run_available_now(spark, src, ckpt, str(tmp_path / "out1"))
    got = {r["key"]: r for r in rows1}
    assert got["a"]["n"] == 2 and got["a"]["sum"] == 4.0
    assert got["a"]["min"] == 1.0 and got["a"]["max"] == 3.0
    assert got["b"]["n"] == 1

    # second file + RESTARTED query on the same checkpoint: state carries
    # over (exactly-once file source) and only new data is processed
    _write_batch(src, "b2.json", [{"k": "a", "v": 5.0}])
    rows2 = _run_available_now(spark, src, ckpt, str(tmp_path / "out2"))
    got2 = {r["key"]: r for r in rows2}
    assert got2["a"]["n"] == 3 and got2["a"]["sum"] == 9.0
    assert got2["a"]["max"] == 5.0
    # key b untouched in batch 2 -> not re-emitted in update mode
    assert "b" not in got2


def test_stateful_sessionizer_emits_closed_sessions(spark, tmp_path):
    from openaq_data_pipeline_engineering_spark.streaming.stateful import (
        sessionizer_stateful,
    )

    src = str(tmp_path / "src2")
    ckpt = str(tmp_path / "ckpt2")
    out_dir = str(tmp_path / "out_sess")
    os.makedirs(src)
    # two bursts 2h apart -> first session closes in-batch, second stays open
    _write_batch(src, "b1.json", [
        {"k": "u1", "v": 0.0, "ts": "2026-01-01T09:00:00"},
        {"k": "u1", "v": 0.0, "ts": "2026-01-01T09:10:00"},
        {"k": "u1", "v": 0.0, "ts": "2026-01-01T11:30:00"},
    ])
    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    stream = spark.readStream.format("json").schema(schema).load(src)
    out = sessionizer_stateful(stream, "k", "ts", gap_seconds=1800)

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == 1  # only the CLOSED session is emitted
    assert rows[0]["n_events"] == 2
    assert rows[0]["end_us"] - rows[0]["start_us"] == 600 * 1_000_000


def test_transform_with_state_v2_accumulates_and_restarts(spark, tmp_path):
    """Spark 4 arbitrary-state v2 (transformWithStateInPandas, typed
    ValueState, RocksDB provider): totals accumulate across
    micro-batches and survive a restarted query on the same
    checkpoint."""
    from openaq_data_pipeline_engineering_spark.streaming.stateful import (
        running_totals_tws,
    )

    src = str(tmp_path / "src_tws")
    ckpt = str(tmp_path / "ckpt_tws")
    os.makedirs(src)
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(prov_key, None)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        def run(out_dir):
            stream = spark.readStream.format("json").schema(SCHEMA).load(src)
            out = running_totals_tws(stream, "k", "v")

            def sink(batch_df, batch_id):
                batch_df.write.mode("append").parquet(out_dir)

            q = (
                out.writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return spark.read.parquet(out_dir).collect()

        _write_batch(src, "b1.json", [
            {"k": "a", "v": 1.0}, {"k": "a", "v": 3.0}, {"k": "b", "v": 10.0},
        ])
        got = {r["key"]: r for r in run(str(tmp_path / "tws_out1"))}
        assert got["a"]["n"] == 2 and got["a"]["sum"] == 4.0
        assert got["b"]["n"] == 1 and got["b"]["sum"] == 10.0

        _write_batch(src, "b2.json", [{"k": "a", "v": 5.0}])
        got2 = {r["key"]: r for r in run(str(tmp_path / "tws_out2"))}
        assert got2["a"]["n"] == 3 and got2["a"]["sum"] == 9.0
        assert "b" not in got2  # untouched key not re-emitted in update mode
    finally:
        if prev is not None:
            spark.conf.set(prov_key, prev)
        else:
            spark.conf.unset(prov_key)


def _run_sessionizer(spark, src: str, ckpt: str, out_dir: str, **kw) -> list:
    from openaq_data_pipeline_engineering_spark.streaming.stateful import (
        sessionizer_stateful,
    )

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    stream = (
        spark.readStream.format("json")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    out = sessionizer_stateful(stream, "k", "ts", gap_seconds=1800, **kw)

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).collect()


def _pin_order(src: str) -> None:
    import time

    base = time.time() - 600
    for i, name in enumerate(sorted(os.listdir(src))):
        os.utime(os.path.join(src, name), (base + i * 30, base + i * 30))


def test_sessionizer_late_duplicate_does_not_corrupt_session_end(
    spark, tmp_path
):
    """A re-delivered (late, in-watermark) event must fold into the open
    session WITHOUT pulling last_us backward — the pre-fix walk set
    last=t for late t, reporting end_us == the late duplicate's time
    and mis-splitting the next event."""
    src = str(tmp_path / "src_late")
    ckpt = str(tmp_path / "ckpt_late")
    os.makedirs(src)
    _write_batch(src, "b1.json", [
        {"k": "u1", "v": 0.0, "ts": "2026-01-01T09:00:00"},
        {"k": "u1", "v": 0.0, "ts": "2026-01-01T09:10:00"},
    ])
    _write_batch(src, "b2.json", [
        {"k": "u1", "v": 0.0, "ts": "2026-01-01T09:00:00"},  # re-delivery
        {"k": "u1", "v": 0.0, "ts": "2026-01-01T11:00:00"},  # closes s1
    ])
    _pin_order(src)
    rows = _run_sessionizer(spark, src, ckpt, str(tmp_path / "out_late"))
    assert len(rows) == 1
    s = rows[0]
    assert s["n_events"] == 3  # 09:00, 09:00(dup), 09:10
    assert s["end_us"] - s["start_us"] == 600 * 1_000_000  # end stays 09:10


def test_sessionizer_straggler_behind_watermark_closes_without_crash(
    spark, tmp_path
):
    """A key first seen AFTER the watermark already passed its
    last+gap (another key's far-future event advanced the watermark)
    must emit its closed session immediately — the pre-fix code
    registered a timer at last+gap <= watermark and crashed the query
    with INVALID_TIMEOUT_TIMESTAMP."""
    src = str(tmp_path / "src_strag")
    ckpt = str(tmp_path / "ckpt_strag")
    os.makedirs(src)
    # batch 1: far-future event on another key -> watermark jumps ahead
    _write_batch(src, "b1.json", [
        {"k": "wm", "v": 0.0, "ts": "2026-02-01T00:00:00"},
    ])
    # batch 2: straggler key, hours behind the watermark
    _write_batch(src, "b2.json", [
        {"k": "u9", "v": 0.0, "ts": "2026-01-01T09:00:00"},
        {"k": "u9", "v": 0.0, "ts": "2026-01-01T09:05:00"},
    ])
    _pin_order(src)
    rows = _run_sessionizer(spark, src, ckpt, str(tmp_path / "out_strag"))
    got = {r["key"]: r for r in rows if r["key"] == "u9"}
    assert got["u9"]["n_events"] == 2
    assert got["u9"]["end_us"] - got["u9"]["start_us"] == 300 * 1_000_000
