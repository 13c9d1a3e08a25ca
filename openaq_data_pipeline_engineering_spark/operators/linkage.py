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

from pyspark.sql import Column, DataFrame
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
    # Thresholded levenshtein — see skew_safe_fuzzy_join.
    pairs = lb.join(rb, "__block").withColumn(
        "edit_distance",
        F.levenshtein(F.col(left_name), F.col(right_name), max_distance),
    )
    return pairs.filter(
        (F.col("edit_distance") >= 0)
        & (F.col("edit_distance") <= max_distance)
    ).drop("__block")


def best_match(
    pairs: DataFrame, left_id: str, tiebreak: str
) -> DataFrame:
    """One row per left record: the minimum-distance match, ties broken
    by ascending ``tiebreak`` (deterministic across layouts).

    Argmin as ONE aggregation (partial+final SortAggregate): min of the (edit_distance,
    tiebreak, <row>) struct is lexicographically "edit_distance asc,
    tiebreak asc" — the identical row to the previous row_number
    window's rank 1 — and the blocked equi-join leaves each left
    record's candidates co-located, so map-side partial aggregation
    collapses them before the exchange instead of shuffling and
    sorting every candidate pair.
    """
    row = F.struct(*[F.col(c) for c in pairs.columns]).alias("_row")
    return (
        pairs.groupBy(left_id)
        .agg(
            F.min(
                F.struct(
                    F.col("edit_distance"), F.col(tiebreak), row
                )
            ).alias("_best")
        )
        .select("_best._row.*")
    )


def prefix_block(n_chars: int):
    """Blocking key: the first ``n_chars`` characters of the name."""

    def block(c: Column) -> Column:
        return F.substring(c, 1, n_chars)

    return block


class BlockOverflowError(ValueError):
    """A block exceeded the row cap even after widening — identical or
    near-identical key mass that no prefix can split (the "Nguyen"
    hot-name pathology). Carries the offending blocks so the caller
    can route them to a second blocking column or accept the quadratic
    cost explicitly (``on_overflow="keep"``)."""


def auto_block_width(
    n_rows: int,
    target_block_rows: int = 64,
    branching: int = 10,
    min_chars: int = 1,
    max_chars: int = 32,
) -> int:
    """Occupancy-driven prefix width: the number of VARYING characters
    a blocking prefix needs so the EXPECTED block stays at or under
    ``target_block_rows`` rows — the fuzzy-linkage twin of
    ``functions.vectors.auto_bits`` (tests/test_auto_bits.py), turning
    the round-7 prose rule ("widen the prefix when blocks run hot")
    into code.

    Smallest ``w`` with ``n_rows <= target_block_rows * branching**w``,
    clamped to ``[min_chars, max_chars]``. ``branching`` is the
    assumed per-character alphabet diversity (default 10: digit-suffix
    keys like ``Customer#000000042``; pass ~26 for alphabetic tails).
    Expected occupancy is then constant as the corpus grows — a FIXED
    width is quadratic in occupancy once N outgrows branching**w ·
    target, exactly the auto_bits finding for LSH buckets. All-integer,
    so :func:`auto_block_width_sql` reproduces it bit-identically.

    The expectation can still be wrong per block (real keys skew);
    :func:`skew_safe_fuzzy_join` adds the per-block ENFORCEMENT on top
    of this rule — measure, widen the hot blocks, and fail loudly on
    residual identical-key mass instead of silently exploding.
    """
    if target_block_rows < 1:
        raise ValueError("target_block_rows must be >= 1")
    if branching < 2:
        raise ValueError("branching must be >= 2")
    need = -(-max(n_rows, 1) // target_block_rows)  # ceil(n/target)
    w = min_chars
    cap = branching ** w
    while cap < need and w < max_chars:
        w += 1
        cap *= branching
    return w


def auto_block_width_sql(
    count_sql: str,
    target_block_rows: int = 64,
    branching: int = 10,
    min_chars: int = 1,
    max_chars: int = 32,
) -> str:
    """DuckDB scalar-subquery twin of :func:`auto_block_width`.

    For the default ``branching=10`` the power is built as a decimal
    string cast to HUGEINT — exact at ANY width, so the twin can never
    disagree with Python's integer arithmetic at a boundary. Other
    branching factors fall back to double ``power()`` (exact up to
    ~2^53, far beyond any real corpus count)."""
    if branching == 10:
        p = "CAST('1' || repeat('0', w) AS HUGEINT)"
    else:
        p = f"power({branching}, w)"
    return (
        f"(SELECT coalesce(min(w), {max_chars}) "
        f"FROM range({min_chars}, {max_chars + 1}) t(w) "
        f"WHERE {count_sql} <= {target_block_rows} * {p})"
    )


def skew_safe_fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_name: str,
    right_name: str,
    base_chars: int,
    widened_chars: int,
    target_block_rows: int = 64,
    max_distance: int = 2,
    on_overflow: str = "error",
) -> DataFrame:
    """Blocked Levenshtein pairs with a per-block row cap ENFORCED.

    Two-level blocking (the code form of the round-7 prose rule —
    VERDICT r7 #1):

    1. Both sides block on ``prefix(base_chars)`` (pick ``base_chars``
       with :func:`auto_block_width` + the fixed key stem length).
    2. The RIGHT side's rows are counted per block — one map-combined
       aggregation ∝ distinct blocks. Blocks over
       ``target_block_rows`` re-block BOTH sides on
       ``prefix(widened_chars)``; the widen decision joins back as a
       broadcast (the overflow list is small by construction). Keys
       are tagged ``N``/``W`` so narrow and widened keyspaces can
       never collide.
    3. Widened blocks are re-counted. Residual overflow — identical
       key mass beyond ``widened_chars`` that NO prefix can split —
       is a loud :class:`BlockOverflowError` by default
       (``on_overflow="error"``), or processed as-is with
       ``on_overflow="keep"`` when the caller explicitly accepts the
       within-block quadratic cost for hot names.

    Semantics note: a true pair whose corruption falls INSIDE the
    widened region [base_chars, widened_chars) splits when its block
    widens — the same recall trade LSH makes when ``auto_bits`` adds
    bits. Choose ``widened_chars`` to stay clear of the corruption
    zone (here: truncation corrupts the tail, so any width below the
    shortest name is safe).

    Cost at scale: one shuffle on the final block key (same as the
    unguarded join), plus two small count aggregations ∝ distinct
    blocks and one broadcast of the overflow list. The cap bounds
    per-block candidate mass to ``target_block_rows²`` everywhere
    except explicitly-kept residual blocks.
    """
    if on_overflow not in ("error", "keep"):
        raise ValueError("on_overflow must be 'error' or 'keep'")
    if widened_chars <= base_chars:
        raise ValueError("widened_chars must exceed base_chars")

    rb = right.withColumn("__nb", F.substring(F.col(right_name), 1, base_chars))
    lb = left.withColumn("__nb", F.substring(F.col(left_name), 1, base_chars))
    over = (
        rb.groupBy("__nb")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > target_block_rows)
        .select("__nb", F.lit(True).alias("__widen"))
        # Materialize the overflow list ONCE: it broadcasts into BOTH
        # sides' keying joins (and the residual check), and an aliased
        # subtree re-plans per consumer on this Spark build — without
        # this the right-side scan runs three times. The list is small
        # by construction (≤ n_rows / target_block_rows entries), so
        # the checkpoint is a few KB, not a data copy.
        .localCheckpoint(eager=True)
    )

    def keyed(df: DataFrame, name: str) -> DataFrame:
        j = df.join(F.broadcast(over), "__nb", "left")
        return j.withColumn(
            "__block",
            F.when(
                F.col("__widen").isNotNull(),
                F.concat(
                    F.lit("W"),
                    F.substring(F.col(name), 1, widened_chars),
                ),
            ).otherwise(F.concat(F.lit("N"), F.col("__nb"))),
        ).drop("__nb", "__widen")

    rk, lk = keyed(rb, right_name), keyed(lb, left_name)

    residual = (
        rk.filter(F.col("__block").startswith("W"))
        .groupBy("__block")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > target_block_rows)
    )
    if on_overflow == "error":
        # Eager by necessity: the loud contract must fire before the
        # caller consumes the pairs. Cost: one map-combined count over
        # the widened blocks only.
        bad = residual.orderBy(F.col("__n").desc()).limit(5).collect()
        if bad:
            raise BlockOverflowError(
                f"{len(bad)}+ blocks exceed {target_block_rows} rows even "
                f"at width {widened_chars}; hottest: "
                + ", ".join(f"{r['__block']!r}×{r['__n']}" for r in bad)
                + " — widen further, add a second blocking column, or "
                "pass on_overflow='keep' to accept the quadratic cost"
            )

    # Thresholded levenshtein (Spark 3.5+): the banded O(n·k) algorithm
    # short-circuits to -1 past max_distance instead of filling the
    # full O(n·m) matrix per pair — for kept pairs the value is the
    # exact distance, so the filtered output is unchanged.
    pairs = lk.join(rk, "__block").withColumn(
        "edit_distance",
        F.levenshtein(F.col(left_name), F.col(right_name), max_distance),
    )
    return pairs.filter(
        (F.col("edit_distance") >= 0)
        & (F.col("edit_distance") <= max_distance)
    ).drop("__block")
