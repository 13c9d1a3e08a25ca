"""As-of (point-in-time) join — an operator Spark lacks natively.

The reference has no as-of join (SURVEY §2.3 notes its only join shape
is a small-dim equi-join); this is part of the training-pipeline
extension surface: "latest state as of event time" lookups (feature
stores, slowly-changing dims, price-at-trade).

Implementation is the union + last_value(ignorenulls) window trick, NOT
a range join: both sides are tagged and unioned, sorted within each key
partition by (ts, side, tiebreaker), and the right side's value is
carried forward with ``last(..., ignorenulls=True)`` over an unbounded
preceding frame. One shuffle on the key, no pair-explosion — at 100 TB
this is a single sort-based window per key partition, whereas a naive
``a.ts <= b.ts`` theta-join is quadratic per key and a broadcast
nested-loop at worst.

Tie semantics (deterministic): a right row at exactly probe ts DOES
match (<=), and among equal-ts right rows the one with the greatest
tiebreaker wins (right rows sort before probe rows at equal ts; last()
picks the final one in frame order).

Directions (one shared sort; both carried columns come from the SAME
single window shuffle):
- ``backward`` (default): latest quote with quote.ts <= probe.ts;
  equal-ts ties -> greatest tiebreaker.
- ``forward``: earliest quote with quote.ts STRICTLY > probe.ts
  (equal-ts quotes belong to backward under the shared sort);
  equal-ts ties -> smallest tiebreaker.
- ``nearest``: whichever of the two is closer in time; equal deltas
  prefer backward.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probes: DataFrame,
    quotes: DataFrame,
    on: list[str],
    ts_col: str,
    value_cols: list[str],
    tiebreaker: str,
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each probe row, attach the nearest ``quotes`` row with the
    same ``on`` keys in the given time ``direction``.

    probes:     left side; all its columns are preserved.
    quotes:     right side; only ``value_cols`` are attached.
    ts_col:     event-time column name present on both sides.
    value_cols: quote columns to carry onto the probe (renamed +suffix).
    tiebreaker: quote column ordering equal-timestamp quotes (max wins).
    direction:  'backward' (<=), 'forward' (>), or 'nearest'.
    tolerance_us: max |probe_ts - quote_ts| in microseconds (pandas
                merge_asof ``tolerance``); matches farther than this
                come back NULL. None = unbounded.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction: {direction!r}")
    probe_cols = probes.columns
    # All value_cols travel in ONE struct so the carry-forward is atomic:
    # the struct itself is non-null for every quote row even when fields
    # are NULL, so last(ignorenulls) always picks whole rows — per-column
    # carries could stitch fields from DIFFERENT quote rows whenever the
    # latest quote holds a NULL field.
    tagged_q = quotes.select(
        *on,
        ts_col,
        F.lit(0).alias("__side"),
        F.col(tiebreaker).alias("__tie"),
        # __qts rides inside the struct so `nearest` can compare deltas
        # without a second shuffle
        F.struct(
            F.col(ts_col).alias("__qts"),
            *[F.col(c).alias(c) for c in value_cols],
        ).alias("__q"),
        *[F.lit(None).alias(f"__p_{c}") for c in probe_cols if c not in on and c != ts_col],
    )
    tagged_p = probes.select(
        *on,
        ts_col,
        F.lit(1).alias("__side"),
        F.lit(None).cast(tagged_q.schema["__tie"].dataType).alias("__tie"),
        F.lit(None).cast(tagged_q.schema["__q"].dataType).alias("__q"),
        *[F.col(c).alias(f"__p_{c}") for c in probe_cols if c not in on and c != ts_col],
    )
    order = (F.col(ts_col).asc(), F.col("__side").asc(), F.col("__tie").asc())
    w_b = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_f = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    unioned = tagged_q.unionByName(tagged_p)
    carries = []
    if direction in ("backward", "nearest"):
        carries.append(
            F.last("__q", ignorenulls=True).over(w_b).alias("__q_b")
        )
    if direction in ("forward", "nearest"):
        # under the shared sort, equal-ts quotes precede the probe row,
        # so the following frame holds strictly-later quotes only
        carries.append(
            F.first("__q", ignorenulls=True).over(w_f).alias("__q_f")
        )
    carried = unioned.select("*", *carries)
    if direction == "backward":
        chosen = F.col("__q_b")
    elif direction == "forward":
        chosen = F.col("__q_f")
    else:
        b, f = F.col("__q_b"), F.col("__q_f")
        ts_us = F.unix_micros(F.col(ts_col))
        delta_b = ts_us - F.unix_micros(b.getField("__qts"))
        delta_f = F.unix_micros(f.getField("__qts")) - ts_us
        chosen = (
            F.when(b.isNull(), f)
            .when(f.isNull(), b)
            .when(delta_b <= delta_f, b)  # ties prefer backward
            .otherwise(f)
        )
    if tolerance_us is not None:
        # Tolerance gate AFTER direction choice: the nearest-side pick is
        # unchanged, but a pick farther than the window comes back NULL
        # (pandas merge_asof semantics).
        delta = F.abs(
            F.unix_micros(F.col(ts_col))
            - F.unix_micros(chosen.getField("__qts"))
        )
        chosen = F.when(delta <= F.lit(int(tolerance_us)), chosen)
    out = carried.filter(F.col("__side") == 1).select(
        *on,
        ts_col,
        *[F.col(f"__p_{c}").alias(c) for c in probe_cols if c not in on and c != ts_col],
        *[chosen.getField(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    return out
