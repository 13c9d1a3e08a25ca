"""Approximate aggregates for 100 TB-scale profiling.

Exact COUNT(DISTINCT) and exact quantiles need full shuffles of the
distinct domain; the approximate forms are constant-memory sketches that
merge associatively (one map-side pass + tiny reduce). Used for data
profiling / QA where ±2 % beats a 100× more expensive exact answer.

These are deliberately NOT in the oracle-checked query registry:
HyperLogLog++ / Greenwald-Khanna results are engine-specific. Accuracy
is asserted by tests against exact answers on the test tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_profile(
    df: DataFrame, cols: list[str], rsd: float = 0.02
) -> DataFrame:
    """One-row frame: HLL++ distinct-count estimate per column."""
    return df.agg(
        *[F.approx_count_distinct(c, rsd=rsd).alias(f"{c}_distinct") for c in cols]
    )


def approx_quantiles(
    df: DataFrame,
    col: str,
    probabilities: list[float] = (0.25, 0.5, 0.75, 0.95, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """One-row frame of approximate percentiles (Greenwald-Khanna)."""
    qs = F.percentile_approx(
        col, F.array(*[F.lit(p) for p in probabilities]), F.lit(accuracy)
    )
    return df.agg(qs.alias("quantiles")).select(
        *[
            F.col("quantiles")[i].alias(f"p{int(p * 100)}")
            for i, p in enumerate(probabilities)
        ]
    )


def heavy_hitters(
    df: DataFrame, cols: list[str], support: float = 0.01
) -> DataFrame:
    """Frequent-items sketch (one-row frame of arrays): every value with
    frequency > support is guaranteed present (false positives possible
    — the classic lossy-counting tradeoff). One pass, constant memory
    per column; the 100 TB path for spam/boilerplate hot-key detection.
    """
    return df.stat.freqItems(cols, support)


def exact_top_k(df: DataFrame, col: str, k: int = 10) -> DataFrame:
    """Exact heavy hitters for comparison: groupBy + count + top-k
    (shuffle ∝ distinct values; use heavy_hitters when that explodes)."""
    from pyspark.sql import functions as F

    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), col)
        .limit(k)
    )
