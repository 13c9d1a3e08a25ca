"""Custom stateful streaming operators via ``applyInPandasWithState``.

Where ``dropDuplicatesWithinWatermark`` / built-in windowed aggs cover
the reference's re-delivery semantics (streaming/ingest.py), some
training-pipeline accumulators need arbitrary per-key state. This module
shows the engine's pattern for those: Arrow-batched grouped state with
explicit GroupState management.

Scale posture: state is partitioned by key across executors (one shuffle
on the key per micro-batch); each key's state is a fixed-size tuple, so
state-store size is O(distinct keys), not O(rows). Use watermark +
timeouts to expire idle keys in unbounded-key domains.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_stats(
    stream: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key running (count, sum, min, max) maintained across
    micro-batches — a custom stateful accumulator the built-in streaming
    aggs could also express; kept minimal to demonstrate the pattern
    (real uses: top-k sketches, distinct-count sketches, session models).

    Output mode is ``update``: one row per key per micro-batch that
    touched it, carrying the accumulated totals.
    """

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, s, mn, mx = state.get
        else:
            n, s, mn, mx = 0, 0.0, None, None
        for pdf in pdfs:
            v = pdf[value_col]
            n += int(v.count())
            s += float(v.sum())
            bmn, bmx = float(v.min()), float(v.max())
            mn = bmn if mn is None else min(mn, bmn)
            mx = bmx if mx is None else max(mx, bmx)
        state.update((n, s, mn, mx))
        yield pd.DataFrame(
            {"key": [key[0]], "n": [n], "sum": [s], "min": [mn], "max": [mx]}
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType="key string, n bigint, sum double, min double, max double",
        stateStructType="n bigint, sum double, min double, max double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionizer_stateful(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming gap-sessionizer, event-time semantics: a session row is
    emitted when the gap is observed in-batch OR when the WATERMARK
    passes last_event + gap (event-time timeout). Batch twin:
    operators/sessionize.py. State per key = (start_us, last_us, count).

    Event-time (not processing-time) timeouts matter operationally:
    with ``Trigger.AvailableNow`` catch-up runs the query terminates
    once data is drained instead of idling on wall-clock timers, and
    replays produce identical sessions regardless of processing speed.
    """

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "n_events": [n],
                    "start_us": [start_us],
                    "end_us": [last_us],
                }
            )
            return
        ts_us: list[int] = []
        for pdf in pdfs:
            # Vectorized ns→µs conversion (guide §4.2): the per-row
            # `Timestamp.value` loop paid ~2µs/row of boxed-scalar
            # overhead per event per micro-batch.
            ts_us.extend(
                (pd.to_datetime(pdf[ts_col]).astype("int64") // 1000).tolist()
            )
        if not ts_us:
            return
        ts_us.sort()
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = ts_us[0], ts_us[0], 0
        out: list[dict[str, Any]] = []
        for t in ts_us:
            if t - last_us > gap_seconds * 1_000_000:
                out.append(
                    {"key": key[0], "n_events": n, "start_us": start_us, "end_us": last_us}
                )
                start_us, last_us, n = t, t, 1
                continue
            # Within the gap of the session's last event. A LATE event
            # (t <= last: re-delivery or cross-batch disorder inside the
            # watermark) must not move `last` backward — that would
            # corrupt the session end and mis-split on the next event.
            # It folds into the current session, extending `start`
            # earlier if needed (a merge of pre-start late data into an
            # already-open session is the one approximation here; exact
            # retro-sessionization would need retraction semantics).
            n += 1
            if t < start_us:
                start_us = t
            if t > last_us:
                last_us = t
        timeout_ms = last_us // 1000 + gap_seconds * 1000
        if timeout_ms <= state.getCurrentWatermarkMs():
            # The watermark already passed last + gap (a straggler key
            # whose events arrived after other sources advanced the
            # watermark): the session is closed by definition — emit it
            # NOW. Registering the timer instead would throw
            # INVALID_TIMEOUT_TIMESTAMP (timers must be > watermark).
            out.append(
                {
                    "key": key[0],
                    "n_events": n,
                    "start_us": start_us,
                    "end_us": last_us,
                }
            )
            state.remove()
        else:
            state.update((start_us, last_us, n))
            # close the open session when the watermark passes last+gap
            state.setTimeoutTimestamp(timeout_ms)
        if out:
            yield pd.DataFrame(out)

    return stream.withWatermark(ts_col, watermark).groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType="key string, n_events bigint, start_us bigint, end_us bigint",
        stateStructType="start_us bigint, last_us bigint, n bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def running_totals_tws(
    stream: DataFrame,
    key_col: str,
    value_col: str,
):
    """Per-key running (count, sum) on the Spark 4 arbitrary-state v2
    API (``transformWithStateInPandas``): typed ValueState managed by a
    StatefulProcessor instead of ``applyInPandasWithState``'s packed
    tuple. Requires the RocksDB state store provider (columnFamilies) —
    callers set ``spark.sql.streaming.stateStore.providerClass`` to
    RocksDBStateStoreProvider before starting the query.

    Same scale posture as :func:`running_stats`: state is O(distinct
    keys), one key-shuffle per micro-batch; v2 adds typed state slots,
    per-key timers, and TTL for idle-key expiry in unbounded domains.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    state_schema = StructType(
        [StructField("n", LongType()), StructField("s", DoubleType())]
    )
    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("n", LongType()),
            StructField("sum", DoubleType()),
        ]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            if self._totals.exists():
                n, s = self._totals.get()
            else:
                n, s = 0, 0.0
            for pdf in rows:
                v = pdf[value_col]
                n += int(v.count())
                s += float(v.sum())
            self._totals.update((n, s))
            yield pd.DataFrame({"key": [key[0]], "n": [n], "sum": [s]})

        def close(self) -> None:
            pass

    return stream.groupBy(key_col).transformWithStateInPandas(
        RunningTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
