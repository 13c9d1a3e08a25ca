"""User-defined function surface demos: UDTF + grouped-agg pandas UDAF.

SURVEY §2.10: the reference registers no UDFs (its AQI plan designed
three row-at-a-time Python UDFs; this engine computes AQI as native
expressions instead — operators/aqi.py). These demos document the
engine's SANCTIONED extension points when native expressions genuinely
cannot express the logic:

- ``sentence_splitter_udtf``: a Python UDTF (Spark 4) — one row in, N
  rows out, usable from SQL via LATERAL. Row-based Python: keep OUT of
  hot paths (the plan-audit test bans BatchEvalPython in declared
  queries); for bulk row-expansion prefer mapInPandas
  (operators/multimodal.sample_frames shows that shape).
- ``weighted_mean_udaf``: an Arrow-batched grouped-aggregate pandas UDF
  — the UDAF path. Executes per group on vectorized pandas Series; at
  scale this is one shuffle on the group key, same as a built-in agg.

Both are factories (the decorators parse DDL, which needs an active
SparkSession — decorating at import time breaks session-less imports).
"""

from __future__ import annotations

import pandas as pd


def sentence_splitter_udtf():
    """Build the UDTF class: text -> one row per '.'-sentence."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="idx int, sentence string")
    class SentenceSplitter:
        def eval(self, text: str):
            if text is None:
                return
            for i, raw in enumerate(text.split(".")):
                s = raw.strip()
                if s:
                    yield i, s

    return SentenceSplitter


def weighted_mean_udaf():
    """Build the grouped-agg pandas UDF: sum(v*w)/sum(w), NaN-safe."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def weighted_mean(v: pd.Series, w: pd.Series) -> float:
        m = v.notna() & w.notna()
        tw = float(w[m].sum())
        if tw == 0.0:
            return float("nan")
        return float((v[m] * w[m]).sum() / tw)

    return weighted_mean
