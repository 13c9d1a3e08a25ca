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
) -> DataFrame:
    """For each probe row, attach the most recent ``quotes`` row with the
    same ``on`` keys and ``quote.ts <= probe.ts``.

    probes:     left side; all its columns are preserved.
    quotes:     right side; only ``value_cols`` are attached.
    ts_col:     event-time column name present on both sides.
    value_cols: quote columns to carry onto the probe (renamed +suffix).
    tiebreaker: quote column ordering equal-timestamp quotes (max wins).
    """
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
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__q"),
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
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_col, "__side", "__tie")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged_q.unionByName(tagged_p).select(
        "*", F.last("__q", ignorenulls=True).over(w).alias("__q_carried")
    )
    out = carried.filter(F.col("__side") == 1).select(
        *on,
        ts_col,
        *[F.col(f"__p_{c}").alias(c) for c in probe_cols if c not in on and c != ts_col],
        *[
            F.col("__q_carried").getField(c).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return out
