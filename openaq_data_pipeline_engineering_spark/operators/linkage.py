"""Blocked fuzzy record linkage (entity resolution).

Training corpora and warehouse dims both accumulate NEAR-duplicate
entities — names with typos, truncations, re-keyed imports — that
exact dedup (operators/dedup.py) and shingle LSH (functions/text.py,
tuned for documents) don't address at the record level. The standard
shape is two-stage:

1. **Blocking**: a cheap deterministic key (prefix, phonetic code,
   sorted-token digest) partitions candidates so comparisons happen
   only WITHIN a block — the equi-join Catalyst shuffles on the block
   key. Never all-pairs: at 100 TB the block-bounded candidate mass is
   the entire game, exactly like LSH banding bounds shingle pairs.
2. **Verification**: an exact similarity (Levenshtein edit distance —
   `F.levenshtein`, JVM-side) filters the in-block pairs, and a window
   keeps the single best match per left record (min distance, then a
   deterministic id tiebreak).

Both stages are plain DataFrame ops (one shuffle on the block key, one
window over matches), so a DuckDB oracle replays the linkage
bit-exactly — edit distance has no floating point.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def blocked_fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_name: str,
    right_name: str,
    block_of,
    max_distance: int = 2,
) -> DataFrame:
    """All in-block pairs within ``max_distance`` edits.

    ``block_of`` is a function Column -> Column producing the blocking
    key from a name column; it is applied to BOTH sides, so a
    corruption outside the blocked region never splits a true pair.
    Returns left.* + right.* + ``edit_distance``.
    """
    lb = left.withColumn("__block", block_of(F.col(left_name)))
    rb = right.withColumn("__block", block_of(F.col(right_name)))
    pairs = lb.join(rb, "__block").withColumn(
        "edit_distance", F.levenshtein(F.col(left_name), F.col(right_name))
    )
    return pairs.filter(F.col("edit_distance") <= max_distance).drop(
        "__block"
    )


def best_match(
    pairs: DataFrame, left_id: str, tiebreak: str
) -> DataFrame:
    """One row per left record: the minimum-distance match, ties broken
    by ascending ``tiebreak`` (deterministic across layouts)."""
    w = Window.partitionBy(left_id).orderBy(
        F.col("edit_distance").asc(), F.col(tiebreak).asc()
    )
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def prefix_block(n_chars: int):
    """Blocking key: the first ``n_chars`` characters of the name."""

    def block(c: Column) -> Column:
        return F.substring(c, 1, n_chars)

    return block
