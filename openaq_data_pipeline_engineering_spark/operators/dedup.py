"""Deduplication operators.

- ``dedup_first``: the reference's ranked-window dedup (W1,
  glue_jobs/process_openaq_raw.py:131-135) with a FIX: the reference
  orders by the partition key itself, making the surviving row
  nondeterministic; we require a real tiebreaker column so results are
  stable and oracle-checkable.
- ``exact_dedup``: content-hash exact dedup for document corpora (the
  LLM-pipeline extension): md5-group, keep the lowest id.

Scale: both are single hash-shuffle operators. ``dedup_first`` is a
window over (keys) — one exchange; at 100 TB prefer pre-bucketed input on
the dedup key so the exchange disappears. ``exact_dedup`` aggregates by a
64-hex hash — high cardinality, uniformly distributed, no skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_first(
    df: DataFrame,
    keys: list[str],
    tiebreaker: list[str],
    keep_rank_col: bool = False,
) -> DataFrame:
    """Keep exactly one row per ``keys``, choosing the first by ``tiebreaker``.

    Equivalent to the reference's
    ``row_number() OVER (PARTITION BY location_id, datetime ORDER BY ...)``
    + ``filter(row_num == 1)`` (process_openaq_raw.py:131-135), but with a
    deterministic ORDER BY.
    """
    if not tiebreaker:
        raise ValueError("dedup_first requires a deterministic tiebreaker")
    order = [F.col(c).asc() if isinstance(c, str) else c for c in tiebreaker]
    w = Window.partitionBy(*keys).orderBy(*order)
    out = df.withColumn("row_num", F.row_number().over(w)).filter(F.col("row_num") == 1)
    return out if keep_rank_col else out.drop("row_num")


def exact_dedup(
    df: DataFrame,
    content_col: str,
    id_col: str,
    normalize: bool = False,
) -> DataFrame:
    """Exact-duplicate removal by content hash; survivor = min(id).

    Returns (id, content_hash, dup_count) for each distinct content value.
    One hash-aggregate; map-side partial aggregation keeps the shuffle
    proportional to distinct-content cardinality, not row count.
    """
    c = F.col(content_col)
    if normalize:
        c = F.regexp_replace(F.lower(c), r"\s+", " ")
    return (
        df.select(F.md5(c).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select(id_col, "content_hash", "dup_count")
    )
