"""AQI computation as native Column expressions (no UDFs).

The reference *plans* this as three Python UDFs
(doc/archive/"AQI Calculation Implementation Plan.md":57-66) with the EPA
piecewise-linear formula ``((Ih-Il)/(Ch-Cl))*(C-Cl)+Il`` (:36-49) and edge
rules (:69-73): compute from available pollutants only, all-null → NULL
AQI + "Unknown" level, negatives invalid, >500 uncapped.

Engine decision (SURVEY §2.10): pure ``F.when`` breakpoint chains +
``F.greatest`` — deterministic, whole-stage-codegen'd, oracle-checkable,
and ~100× faster than row-at-a-time UDFs at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# EPA-style breakpoints: pollutant -> [(c_lo, c_hi, i_lo, i_hi), ...].
# (pm25 uses the 2024 EPA table shape the reference plan cites.)
BREAKPOINTS: dict[str, list[tuple[float, float, float, float]]] = {
    "pm25": [
        (0.0, 12.0, 0, 50),
        (12.1, 35.4, 51, 100),
        (35.5, 55.4, 101, 150),
        (55.5, 150.4, 151, 200),
        (150.5, 250.4, 201, 300),
        (250.5, 500.4, 301, 500),
    ],
    "pm10": [
        (0.0, 54.0, 0, 50),
        (55.0, 154.0, 51, 100),
        (155.0, 254.0, 101, 150),
        (255.0, 354.0, 151, 200),
        (355.0, 424.0, 201, 300),
        (425.0, 604.0, 301, 500),
    ],
}

AQI_LEVELS = [
    (0, 50, "Good"),
    (51, 100, "Moderate"),
    (101, 150, "Unhealthy for Sensitive Groups"),
    (151, 200, "Unhealthy"),
    (201, 300, "Very Unhealthy"),
    (301, float("inf"), "Hazardous"),
]


def piecewise_linear(c: Column, breakpoints: list[tuple[float, float, float, float]]) -> Column:
    """EPA linear interpolation over breakpoint ranges as a when-chain.

    Negative input → NULL (invalid, reference edge rule); above the last
    breakpoint → extrapolate from the top segment (>500 uncapped).
    """
    expr: Column = F.lit(None).cast("double")
    # Build the chain top-down so the first matching range wins.
    chain = None
    for c_lo, c_hi, i_lo, i_hi in breakpoints:
        seg = (
            (F.lit(i_hi) - F.lit(i_lo)) / (F.lit(c_hi) - F.lit(c_lo))
        ) * (c - F.lit(c_lo)) + F.lit(i_lo)
        cond = (c >= c_lo) & (c <= c_hi)
        chain = F.when(cond, seg) if chain is None else chain.when(cond, seg)
    # Uncapped extrapolation above the table, using the top segment slope.
    c_lo, c_hi, i_lo, i_hi = breakpoints[-1]
    top = ((F.lit(i_hi) - F.lit(i_lo)) / (F.lit(c_hi) - F.lit(c_lo))) * (
        c - F.lit(c_lo)
    ) + F.lit(i_lo)
    chain = chain.when(c > c_hi, top)
    return F.when(c.isNull() | (c < 0), expr).otherwise(chain)


def aqi_level(aqi: Column) -> Column:
    """Categorical bucket for an AQI value; NULL → 'Unknown'."""
    chain = None
    for lo, hi, label in AQI_LEVELS:
        cond = (aqi >= lo) if hi == float("inf") else ((aqi >= lo) & (aqi <= hi))
        chain = F.when(cond, label) if chain is None else chain.when(cond, label)
    return F.coalesce(chain, F.lit("Unknown"))


def compute_aqi(df: DataFrame, pollutant_cols: dict[str, str] | None = None) -> DataFrame:
    """Add ``aqi``, ``aqi_level``, ``dominant_pollutant`` columns.

    ``pollutant_cols`` maps pollutant name (a BREAKPOINTS key) to the
    DataFrame column holding its concentration; defaults to identity for
    every breakpoint pollutant present in ``df``.

    AQI = max over per-pollutant sub-indices, computed from available
    (non-null) pollutants only; all-null → NULL/Unknown (reference edge
    rules). Dominant pollutant = argmax, ties broken by pollutant-name
    order for determinism.
    """
    if pollutant_cols is None:
        pollutant_cols = {p: p for p in BREAKPOINTS if p in df.columns}
    if not pollutant_cols:
        raise ValueError("no pollutant columns to compute AQI from")

    sub = {
        name: piecewise_linear(F.col(col).cast("double"), BREAKPOINTS[name])
        for name, col in pollutant_cols.items()
    }
    names = sorted(sub)
    aqi = F.greatest(*[sub[n] for n in names]) if len(names) > 1 else sub[names[0]]

    dom = None
    for n in names:  # first name winning a tie = deterministic
        cond = sub[n].isNotNull() & (sub[n] == aqi)
        dom = F.when(cond, n) if dom is None else dom.when(cond, n)
    dom = F.coalesce(dom, F.lit("Unknown"))

    return (
        df.withColumn("aqi", F.round(aqi, 4))
        .withColumn("aqi_level", aqi_level(F.col("aqi")))
        .withColumn("dominant_pollutant", dom)
    )
