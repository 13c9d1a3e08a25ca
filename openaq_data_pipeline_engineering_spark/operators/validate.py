"""Single-pass pipeline metrics via ``observe`` (reference A3 fixed).

The reference materializes ``df.count()`` four times as progress metrics
(process_openaq_raw.py:101,137,161,200), re-reading the source each time
because nothing is cached (SURVEY §3.2). Here metrics ride along the one
real action using ``DataFrame.observe`` — zero extra jobs, zero extra
scans, and they keep working at 100 TB where a spare full scan is hours.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_counts(
    df: DataFrame,
    name: str,
    null_check_cols: list[str] | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach row-count (+ optional per-column null-count) observation.

    Returns (df, observation); read ``observation.get`` AFTER an action has
    run on the returned frame.
    """
    metrics = [F.count(F.lit(1)).alias("row_count")]
    for c in null_check_cols or []:
        metrics.append(
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}_nulls")
        )
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
