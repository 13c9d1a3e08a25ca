"""Gap-based sessionization — classic training-data / clickstream op.

Assigns a per-entity session index: a new session starts when the gap
to the previous event exceeds ``gap``. Pure window functions (lag +
running sum of boundary flags) — one shuffle on the entity key, linear
work per partition, no state beyond the sort. The streaming twin is
``session_window`` in Structured Streaming; this is the batch form.

Event-time arithmetic is integer microseconds (``unix_micros``): exact,
ANSI-safe (no timestamp→double cast), and bit-identical to DuckDB's
``epoch_us`` for oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int = 1800,
    order_tiebreaker: str | None = None,
) -> DataFrame:
    """Add ``session_idx`` (1-based, per key, ordered by event time).

    Deterministic given an ``order_tiebreaker`` that makes
    (ts, tiebreaker) unique within a key.
    """
    order = [ts_col] + ([order_tiebreaker] if order_tiebreaker else [])
    w = Window.partitionBy(key).orderBy(*order)
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(us).over(w)
    new_session = F.when(
        prev.isNull() | ((us - prev) > F.lit(gap_seconds * 1_000_000)), 1
    ).otherwise(0)
    running = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn("session_idx", F.sum(new_session).over(running))


def session_stats(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int = 1800,
    order_tiebreaker: str | None = None,
) -> DataFrame:
    """Per-session rollup: event count, start/end, duration seconds."""
    s = sessionize(df, key, ts_col, gap_seconds, order_tiebreaker)
    dur_us = F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))
    return s.groupBy(key, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (dur_us / F.lit(1_000_000.0)).alias("duration_s"),
    )
