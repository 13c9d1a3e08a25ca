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


def morton_code(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative ints: bit i of x
    lands at position 2i, bit i of y at 2i+1."""
    xc = (F.col(x) if isinstance(x, str) else x).cast("bigint")
    yc = (F.col(y) if isinstance(y, str) else y).cast("bigint")
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out


def morton_code_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """DuckDB mirror of :func:`morton_code` (same bit layout)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x_expr} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y_expr} >> {i}) & 1) << {2 * i + 1})")
    return "CAST(" + " | ".join(terms) + " AS BIGINT)"
