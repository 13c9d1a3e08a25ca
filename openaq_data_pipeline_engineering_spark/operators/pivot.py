"""Long→wide pivot with mean aggregation (reference A1).

The reference pivots without a value list
(glue_jobs/process_openaq_raw.py:151-165), which costs an extra
distinct-scan job AND makes the output schema depend on the data. We
require explicit ``values`` — one-pass hash aggregate, frozen schema
(missing parameters come out as all-NULL columns, the fix the AQI plan
flags as a schema risk).

Scale: groupBy(keys).pivot(values).agg(mean) is a single partial+final
hash aggregate; with N pivot values it is N conditional aggregates, no
extra shuffle versus a plain groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_parameters(
    df: DataFrame,
    group_keys: list[str],
    pivot_col: str,
    value_col: str,
    values: list[str],
    value_decimals: int | None = None,
) -> DataFrame:
    """``groupBy(group_keys).pivot(pivot_col, values).agg(mean(value_col))``.

    Mean (not first) resolves residual duplicate readings, matching the
    reference (process_openaq_raw.py:158; tests/test_glue_complete.py:202-220).

    ``value_decimals``: when the input values sit on a fixed decimal grid
    (e.g. 2-decimal sensor readings), pass its precision to compute the
    mean as ``round(sum, d) / count`` — an fp-stable form whose result is
    reproducible across engines and summation orders (plain round(avg)
    is not: engines disagree on half-way representations).
    """
    if value_decimals is None:
        agg = F.mean(value_col)
    else:
        cnt = F.count(value_col)
        agg = F.when(cnt > 0, F.round(F.sum(value_col), value_decimals) / cnt)
    return df.groupBy(*group_keys).pivot(pivot_col, values).agg(agg)
