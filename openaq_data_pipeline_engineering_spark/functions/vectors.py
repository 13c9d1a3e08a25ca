"""Vector column expressions for embedding similarity.

All arithmetic is promoted to DOUBLE *before* accumulation and folds
left-to-right (``F.aggregate``), so the result is bit-comparable with a
DuckDB sequential fold over ``embedding::DOUBLE[]``. Staying in Column
expressions keeps the hot loop inside the JVM (no Python round trips);
for very high dimensions a Pandas-UDF/numpy path can be swapped in, but
built-in higher-order functions win below ~1k dims.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (|a| * |b|) — explicit form mirrored in oracle SQL as
    list_dot_product(a,b) / (sqrt(list_dot_product(a,a)) * sqrt(...))."""
    return dot(a, b) / (norm(a) * norm(b))


def lsh_bucket(a: Column | str, n_bits: int = 8, stride: int = 32) -> Column:
    """Deterministic sign-projection LSH bucket id.

    Bit i = sign(v[i] - v[i+stride]) — a fixed (data-independent,
    seed-free) projection so the bucketing is reproducible across engines
    and runs. At scale this turns the O(N²) similarity join into a
    per-bucket join; vectors in the same bucket are candidate neighbors.
    """
    v = _col(a)
    bits = [
        F.when(
            F.element_at(v, i + 1).cast("double")
            >= F.element_at(v, i + 1 + stride).cast("double"),
            "1",
        ).otherwise("0")
        for i in range(n_bits)
    ]
    return F.concat(*bits)
