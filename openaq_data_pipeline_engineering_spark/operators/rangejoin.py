"""Range join: value-in-interval joins without a nested-loop blowup.

Spark plans ``a JOIN b ON a.v BETWEEN b.lo AND b.hi`` as a broadcast
nested-loop join (fine when one side is tiny) or a cartesian product
(disastrous). Two shapes:

- ``broadcast_range_join``: small interval table → broadcast NLJ; each
  probe row scans the in-memory interval list. Right plan for band /
  bucket / calendar lookups (dozens-to-thousands of intervals).
- ``binned_range_join``: both sides large → discretize the value domain
  into fixed-width bins; an interval registers in every bin it overlaps
  (explode), probes hash-join on bin id, then the exact predicate
  filters false positives. Turns the O(N×M) product into a hash join
  with duplication factor = avg interval width / bin width — the
  standard interval-bucketing technique used by large-scale engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_range_join(
    probes: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "inner",
) -> DataFrame:
    """probe.value ∈ [lo, hi) against a broadcast interval table."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return probes.join(F.broadcast(intervals), cond, how)


def binned_range_join(
    probes: DataFrame,
    intervals: DataFrame,
    value_col: str,
    bin_width: float,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Large×large range join via interval bucketing (inner, [lo, hi)).

    Each interval is exploded to the bins it overlaps; probes compute
    their single bin; the join is a plain hash equi-join on bin plus the
    exact range predicate.
    """
    binned_iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bin_width)).cast("long"),
                # hi is exclusive: a hi exactly on a bin edge doesn't reach it
                F.floor(
                    (F.col(hi_col) - F.lit(1e-12)) / F.lit(bin_width)
                ).cast("long"),
            )
        ),
    )
    binned_p = probes.withColumn(
        "__bin", F.floor(F.col(value_col) / F.lit(bin_width)).cast("long")
    )
    cond = (
        (binned_p["__bin"] == binned_iv["__bin"])
        & (F.col(value_col) >= F.col(lo_col))
        & (F.col(value_col) < F.col(hi_col))
    )
    return binned_p.join(binned_iv, cond, "inner").drop("__bin")
